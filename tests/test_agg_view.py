"""Incrementally-maintained aggregate view vs full recompute.

The invariant: after any sequence of base epochs and syncs, the view's
totals equal ``SELECT grp, count(*), sum(val) FROM base GROUP BY grp``
over the base's CURRENT logical state — while each sync does only
O(changed-rows) work (retraction deltas + touched-bucket state read).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.agg_view import IncrementalAggView
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _batch(spark, rows, lsn0):
    """[(conv, turn, op, grp, val)] → deduped change batch."""
    data = [
        (
            c,
            t,
            op,
            lsn0 + i,
            json.dumps({"grp": g, "val": v}) if op != "D" else None,
        )
        for i, (c, t, op, g, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, op string, lsn long, after string"
    ).withColumns(
        {
            "commit_ts": F.lit("2026-01-01 00:00:00").cast("timestamp"),
            "src_file": F.lit("test"),
            "src_offset": F.col("lsn"),
        }
    )
    return lww_dedupe(df)


def _recompute(base):
    return (
        base.read_logical()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("val").alias("sum_val"))
    )


def _rows(df):
    return sorted(
        (
            (r["grp"], r["n_rows"], r["sum_val"])
            for r in df.select("grp", "n_rows", "sum_val").collect()
        ),
        key=lambda t: (t[0] is not None, t[0] or "", t[1:]),
    )


@pytest.fixture()
def base_and_view(spark, tmp_dir):
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    view = IncrementalAggView.create(
        spark, os.path.join(tmp_dir, "v"), base, group_cols=["grp"], sum_cols=["val"]
    )
    return base, view


def test_initial_sync_builds_full_view(spark, base_and_view):
    base, view = base_and_view
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "I", "x", 10),
                ("a", 1, "I", "x", 5),
                ("b", 0, "I", "y", 7),
            ],
            lsn0=10,
        ),
    )
    view.sync(base)
    assert _rows(view.totals()) == [("x", 2, 15), ("y", 1, 7)]
    assert _rows(view.totals()) == _rows(_recompute(base))


def test_update_delete_and_group_migration(spark, base_and_view):
    base, view = base_and_view
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "I", "x", 10),
                ("a", 1, "I", "x", 5),
                ("b", 0, "I", "y", 7),
                ("c", 0, "I", "z", 100),
            ],
            lsn0=10,
        ),
    )
    view.sync(base)
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "U", "y", 11),  # migrates x → y AND changes val
                ("a", 1, "U", "x", 6),  # in-place value change
                ("c", 0, "D", None, None),  # empties group z
                ("d", 0, "I", "w", 1),  # new group
            ],
            lsn0=100,
        ),
    )
    view.sync(base)
    assert _rows(view.totals()) == [("w", 1, 1), ("x", 1, 6), ("y", 2, 18)]
    assert _rows(view.totals()) == _rows(_recompute(base))
    # the emptied group is DELETED, not a zero ghost row
    assert view.totals().where("grp = 'z'").count() == 0


def test_sync_is_exactly_once_and_refuses_backwards(spark, base_and_view):
    base, view = base_and_view
    merge_into(base, _batch(spark, [("a", 0, "I", "x", 1)], 10))
    head = base.current_snapshot().snapshot_id
    view.sync(base)
    assert view.last_synced_base_snapshot() == head
    snap = view.table.current_snapshot().snapshot_id
    r = view.sync(base, to_id=head)  # replay → tagged no-op
    assert r.strategy in ("noop", "skipped-duplicate")
    assert view.table.current_snapshot().snapshot_id == snap
    merge_into(base, _batch(spark, [("a", 1, "I", "x", 2)], 20))
    view.sync(base)
    with pytest.raises(ValueError):
        view.sync(base, to_id=head)


def test_noop_epoch_changes_nothing(spark, base_and_view):
    base, view = base_and_view
    merge_into(base, _batch(spark, [("a", 0, "I", "x", 1), ("b", 0, "I", "y", 2)], 10))
    view.sync(base)
    before = _rows(view.totals())
    # an update that keeps grp AND val: deltas cancel to (0, 0)
    merge_into(base, _batch(spark, [("a", 0, "U", "x", 1)], 100))
    view.sync(base)
    assert _rows(view.totals()) == before


def test_null_group_values(spark, base_and_view):
    base, view = base_and_view
    merge_into(
        base,
        _batch(
            spark,
            [("a", 0, "I", None, 3), ("b", 0, "I", None, 4), ("c", 0, "I", "x", 5)],
            lsn0=10,
        ),
    )
    view.sync(base)
    assert _rows(view.totals()) == [(None, 2, 7), ("x", 1, 5)]
    merge_into(base, _batch(spark, [("a", 0, "D", None, None)], 100))
    view.sync(base)
    assert _rows(view.totals()) == [(None, 1, 4), ("x", 1, 5)]
    assert _rows(view.totals()) == _rows(_recompute(base))


def test_bootstrap_after_expired_create_snapshot(spark, tmp_dir):
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    merge_into(base, _batch(spark, [("a", 0, "I", "x", 10), ("b", 0, "I", "y", 7)], 10))
    merge_into(base, _batch(spark, [("c", 0, "I", "x", 3)], 20))
    base.expire_snapshots(keep_last=1)
    view = IncrementalAggView.create(
        spark, os.path.join(tmp_dir, "v"), base, group_cols=["grp"], sum_cols=["val"]
    )
    view.sync(base)  # cannot diff from create — bootstraps from full state
    assert _rows(view.totals()) == [("x", 2, 13), ("y", 1, 7)]


def test_multi_epoch_stream_equals_recompute(spark, base_and_view):
    base, view = base_and_view
    import random

    rng = random.Random(7)
    keys = [(f"c{i}", j) for i in range(6) for j in range(3)]
    alive = set()
    lsn = 10
    for _ in range(4):
        rows = []
        for k in rng.sample(keys, 8):
            if k in alive and rng.random() < 0.3:
                rows.append((k[0], k[1], "D", None, None))
                alive.discard(k)
            else:
                op = "U" if k in alive else "I"
                rows.append(
                    (k[0], k[1], op, rng.choice(["x", "y", "z"]), rng.randrange(100))
                )
                alive.add(k)
            lsn += 1
        merge_into(base, _batch(spark, rows, lsn))
        view.sync(base)
        assert _rows(view.totals()) == _rows(_recompute(base))


# ------------------------------------------------------------- min/max tier

def _mm_recompute(base):
    return (
        base.read_logical()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
    )


def _mm_rows(df):
    cols = ["grp", "n_rows", "sum_val", "min_val", "max_val"]
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=str,
    )


@pytest.fixture()
def mm_base_and_view(spark, tmp_dir):
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "mt"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    view = IncrementalAggView.create(
        spark,
        os.path.join(tmp_dir, "mv"),
        base,
        group_cols=["grp"],
        sum_cols=["val"],
        min_cols=["val"],
        max_cols=["val"],
    )
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "I", "g1", 10),
                ("a", 1, "I", "g1", 5),
                ("a", 2, "I", "g1", 20),
                ("b", 0, "I", "g2", 7),
                ("c", 0, "I", "g2", None),  # null val: min/max ignore
            ],
            lsn0=0,
        ),
    )
    view.sync(base)
    return base, view


def test_minmax_initial_and_insert_extend(spark, mm_base_and_view):
    base, view = mm_base_and_view
    assert _mm_rows(view.totals()) == _mm_rows(_mm_recompute(base))
    # inserts extend monotonically (no recompute path needed)
    merge_into(base, _batch(spark, [("d", 0, "I", "g1", 1), ("d", 1, "I", "g1", 99)], lsn0=100))
    view.sync(base)
    assert _mm_rows(view.totals()) == _mm_rows(_mm_recompute(base))


def test_minmax_delete_of_extremum_recomputes(spark, mm_base_and_view):
    base, view = mm_base_and_view
    # delete the group min (a/1 val=5) AND the group max (a/2 val=20)
    merge_into(base, _batch(spark, [("a", 1, "D", None, None), ("a", 2, "D", None, None)], lsn0=100))
    view.sync(base)
    assert _mm_rows(view.totals()) == _mm_rows(_mm_recompute(base))
    row = {r.grp: r for r in view.totals().collect()}["g1"]
    assert row.min_val == 10 and row.max_val == 10


def test_minmax_update_moves_extremum_and_group(spark, mm_base_and_view):
    base, view = mm_base_and_view
    # update the stored min UP (forces recompute), migrate a row across
    # groups, and null out a value
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 1, "U", "g1", 50),   # was min=5 → recompute g1
                ("b", 0, "U", "g1", 7),    # migrates g2 → g1
                ("a", 0, "U", "g1", None), # value → null
            ],
            lsn0=100,
        ),
    )
    view.sync(base)
    assert _mm_rows(view.totals()) == _mm_rows(_mm_recompute(base))


def test_minmax_all_null_group_and_zero_group(spark, mm_base_and_view):
    base, view = mm_base_and_view
    # g2 shrinks to only the null-val row → min/max null; then to zero
    merge_into(base, _batch(spark, [("b", 0, "D", None, None)], lsn0=100))
    view.sync(base)
    assert _mm_rows(view.totals()) == _mm_rows(_mm_recompute(base))
    row = {r.grp: r for r in view.totals().collect()}["g2"]
    assert row.min_val is None and row.max_val is None and row.n_rows == 1
    merge_into(base, _batch(spark, [("c", 0, "D", None, None)], lsn0=200))
    view.sync(base)
    assert not any(r.grp == "g2" for r in view.totals().collect())


def test_minmax_replay_and_bootstrap(spark, tmp_dir, mm_base_and_view):
    base, view = mm_base_and_view
    head = base.current_snapshot().snapshot_id
    r = view.sync(base)
    assert r.strategy == "noop"
    # bootstrap a second view after snapshot expiry → full-state path
    merge_into(base, _batch(spark, [("z", 0, "I", "g3", -4)], lsn0=300))
    base.expire_snapshots(keep_last=1)
    v2 = IncrementalAggView.create(
        spark,
        os.path.join(tmp_dir, "mv2"),
        base,
        group_cols=["grp"],
        sum_cols=["val"],
        min_cols=["val"],
        max_cols=["val"],
    )
    v2.sync(base)
    assert _mm_rows(v2.totals()) == _mm_rows(_mm_recompute(base))


def test_minmax_rejects_unsupported_type(spark, tmp_dir):
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("grp", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "tt"), schema, ["conv_id", "turn_idx"]
    )
    with pytest.raises(ValueError, match="numeric or string"):
        IncrementalAggView.create(
            spark, os.path.join(tmp_dir, "tv"), base, ["grp"], min_cols=["ts"]
        )
