"""Online re-bucketing: full rewrite under a new bucket transform,
atomic with the bucket_count flip; logical state, delta consumption,
time travel, and post-rebucket writes all preserved."""

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into, merge_into_delta

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)
_EV = (
    "op string, lsn long, commit_ts timestamp, conv_id string, "
    "turn_idx int, after string, src_file string, src_offset long"
)


def _batch(spark, rows):
    ts = datetime(2025, 1, 1)
    return spark.createDataFrame(
        [(op, lsn, ts, c, t, a, "f", i) for i, (op, lsn, c, t, a) in enumerate(rows)],
        _EV,
    )


def test_rebucket_preserves_state_and_scales_layout(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 4)
    merge_into(t, lww_dedupe(_batch(spark, [("I", i, f"c{i}", 0, '{"text":"v"}') for i in range(200)])))
    # layer a delta so rebucket must consume it
    merge_into_delta(t, lww_dedupe(_batch(spark, [("U", 1000, "c7", 0, '{"text":"v7"}')])))
    before = t.read_logical().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pre_snap = t.current_snapshot().snapshot_id

    snap = t.rebucket(16)
    assert t.bucket_count == 16
    assert snap.operation == "rebucket"
    buckets = {f["bucket"] for f in t.current_snapshot().files}
    assert buckets <= set(range(16)) and len(buckets) > 4
    assert t.delta_stats() == {}  # deltas folded into the rewrite
    after = t.read_logical().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)

    # time travel to the pre-rebucket snapshot still reads the old layout
    tt = t.read_logical(snapshot_id=pre_snap).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, tt)

    # fresh handle sees the new count; writes + lookups work post-rebucket
    t2 = LakeTable.load(spark, t.path)
    assert t2.bucket_count == 16
    merge_into(t2, lww_dedupe(_batch(spark, [("U", 2000, "c7", 0, '{"text":"v7b"}')])))
    assert t2.lookup(conv_id="c7", turn_idx=0).collect()[0]["text"] == "v7b"
    # noop rebucket returns current snapshot
    assert t2.rebucket(16).snapshot_id == t2.current_snapshot().snapshot_id


def test_stale_handle_delta_append_aborts_after_rebucket(spark, tmp_path):
    """Review-caught: a delta batch bucketed under the OLD layout must
    abort with ConcurrentModification after a rebucket — silently layering
    it would duplicate keys and un-suppress tombstones."""
    import pytest

    from nvimagecodec_spark.lakehouse.table import ConcurrentModification

    path = str(tmp_path / "t")
    t_stale = LakeTable.create(spark, path, SCHEMA, ["conv_id", "turn_idx"], 4)
    merge_into(t_stale, lww_dedupe(_batch(spark, [("I", i, f"c{i}", 0, '{"text":"v"}') for i in range(50)])))

    t_fresh = LakeTable.load(spark, path)
    t_fresh.rebucket(16)

    # t_stale still believes bucket_count=4; its delta batch is mis-bucketed
    assert t_stale.bucket_count == 4
    with pytest.raises(ConcurrentModification):
        merge_into_delta(
            t_stale, lww_dedupe(_batch(spark, [("U", 999, "c1", 0, '{"text":"x"}')]))
        )
    # fresh handle proceeds fine
    merge_into_delta(
        t_fresh, lww_dedupe(_batch(spark, [("U", 1000, "c1", 0, '{"text":"y"}')]))
    )
    assert t_fresh.lookup(conv_id="c1", turn_idx=0).collect()[0]["text"] == "y"


def test_append_and_overwrite_abort_on_concurrent_rebucket(spark, tmp_path):
    """Review-caught (round-2 advice): append()/overwrite() compute bucket
    ids under the entry-time layout; a rebucket() landing before their
    commit must abort them — otherwise metadata says the new count while
    the committed files follow the old transform, and bucket-pruned reads
    silently miss those keys."""
    import pytest
    from pyspark.sql import Row

    from nvimagecodec_spark.lakehouse.table import ConcurrentModification

    path = str(tmp_path / "t")
    t1 = LakeTable.create(spark, path, SCHEMA, ["conv_id", "turn_idx"], 4)
    t1.append(spark.createDataFrame([Row(conv_id="c0", turn_idx=0, text="v")], SCHEMA))
    t2 = LakeTable.load(spark, path)

    # interleave a rebucket between t1's file write and its commit
    orig = t1._write_data_files

    def hooked(df, snapshot_id, bucket_count=None):
        files = orig(df, snapshot_id, bucket_count)
        t2.rebucket(16)
        return files

    t1._write_data_files = hooked
    row = spark.createDataFrame([Row(conv_id="c1", turn_idx=0, text="x")], SCHEMA)
    with pytest.raises(ConcurrentModification):
        t1.append(row)
    t2.rebucket(4)  # reset for the overwrite arm (hook rebuckets to 16 again)
    with pytest.raises(ConcurrentModification):
        t1.overwrite(row)
    t1._write_data_files = orig

    # after refreshing (entry-time refresh picks up the new layout) it works
    t1.append(row)
    assert t1.lookup(conv_id="c1", turn_idx=0).collect()[0]["text"] == "x"
