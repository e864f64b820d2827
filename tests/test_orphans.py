"""remove_orphans: failed-attempt leftovers are reclaimed; everything any
snapshot references — and anything young enough to be an in-flight
commit — is never touched."""

import os
import time
from datetime import datetime

from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

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


def _batch(spark, n, lsn0=0):
    ts = datetime(2025, 1, 1)
    return spark.createDataFrame(
        [("I", lsn0 + i, ts, f"c{i}", 0, '{"text":"x"}', "f", i) for i in range(n)],
        _EV,
    )


def _age(path, seconds=7200):
    old = time.time() - seconds
    os.utime(path, (old, old))


def test_orphans_removed_live_and_young_kept(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 4)
    merge_into(t, lww_dedupe(_batch(spark, 50)))
    merge_into(t, lww_dedupe(_batch(spark, 10, lsn0=1000)))
    live_before = {f["path"] for f in t.current_snapshot().files}

    # a failed attempt: files written, commit never happened
    orphan_files = t._write_data_files(
        t.with_bucket(t.read(with_system=True)), snapshot_id=999
    )
    assert orphan_files
    old_orphans = [f["path"] for f in orphan_files[: len(orphan_files) // 2 or 1]]
    young_orphans = [p["path"] for p in orphan_files if p["path"] not in old_orphans]
    for p in old_orphans:
        _age(p)
    # age the live files too: age alone must NOT make them eligible
    for p in live_before:
        _age(p)

    removed = t.remove_orphans(older_than_seconds=3600)
    assert removed >= len(old_orphans)
    assert all(not os.path.exists(p) for p in old_orphans)
    assert all(os.path.exists(p) for p in young_orphans)  # grace period
    assert all(os.path.exists(p) for p in live_before)  # referenced = safe

    # table still fully readable, including time travel to snapshot 1
    assert t.read_logical().count() == 50
    first_merge = [s for s in t.history() if s.operation == "merge"][0]
    assert t.read_logical(snapshot_id=first_merge.snapshot_id).count() == 50

    # second pass after the grace window: young orphans reclaimed too
    for p in young_orphans:
        _age(p)
    t.remove_orphans(older_than_seconds=3600)
    assert all(not os.path.exists(p) for p in young_orphans)


def test_orphan_manifests_swept_reachable_kept(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 2)
    merge_into(t, lww_dedupe(_batch(spark, 20)))
    mdir = t._manifest_dir
    fake = os.path.join(mdir, "ml-99999999-deadbeef.json")
    with open(fake, "w") as f:
        f.write("[]")
    _age(fake)
    before = set(os.listdir(mdir))
    t.remove_orphans(older_than_seconds=3600)
    after = set(os.listdir(mdir))
    assert "ml-99999999-deadbeef.json" not in after
    # every reachable manifest/list survived
    assert before - after == {"ml-99999999-deadbeef.json"}
    assert t.read_logical().count() == 20


def test_optimize_umbrella(spark, tmp_path):
    from nvimagecodec_spark.operators.merge import merge_into_delta

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 2)
    merge_into(t, lww_dedupe(_batch(spark, 30)))
    merge_into_delta(t, lww_dedupe(_batch(spark, 5, lsn0=1000)))
    merge_into_delta(t, lww_dedupe(_batch(spark, 5, lsn0=2000)))
    orphans = t._write_data_files(t.with_bucket(t.read(with_system=True)), 999)
    for f in orphans:
        _age(f["path"])
    before = t.read_logical().toPandas().sort_values(["conv_id", "turn_idx"])

    # production default grace is 72h (must exceed the longest in-flight
    # write); the test's aged files are only ~2h old, so pass it explicitly
    out = t.optimize(keep_snapshots=2, orphan_grace_seconds=3600)
    assert out["delta_buckets_folded"] > 0
    assert out["orphans_removed"] >= len(orphans)
    assert t.delta_stats() == {}
    after = t.read_logical().toPandas().sort_values(["conv_id", "turn_idx"])
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))
    assert len(t.history()) <= 2
