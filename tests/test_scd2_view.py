"""Incrementally-maintained SCD2 view vs from-scratch expectations.

The invariant: after any sequence of base merge epochs and syncs, the
view's history() is the epoch-grain SCD2 table — versions open at the
sync where a tracked value first appears/changes, close at the sync
where the next version (or a delete) lands, and changes that cancel out
between two syncs never produce a version. current() always equals the
base's live state projected to tracked columns.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into
from nvimagecodec_spark.operators.scd2 import Scd2View

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("note", T.StringType()),
    ]
)


def _batch(spark, rows, lsn0):
    """[(conv, turn, op, status, note)] → deduped change batch."""
    data = [
        (
            c,
            t,
            op,
            lsn0 + i,
            json.dumps({"status": s, "note": n}) if op != "D" else None,
        )
        for i, (c, t, op, s, n) in enumerate(rows)
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


def _hist(view, epoch_of):
    """history() keyed rows with sids mapped to epoch ordinals."""
    out = {}
    for r in view.history().collect():
        out.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (
                epoch_of[r["valid_from_sid"]],
                epoch_of.get(r["valid_to_sid"]),
                r["status"],
                r["is_current"],
            )
        )
    return {k: sorted(v, key=lambda t: t[0]) for k, v in out.items()}


@pytest.fixture()
def base_and_view(spark, tmp_dir):
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    view = Scd2View.create(spark, os.path.join(tmp_dir, "v"), base, track_cols=["status"])
    return base, view


def _step(spark, base, view, rows, lsn0, epoch_of, epoch_no):
    merge_into(base, _batch(spark, rows, lsn0))
    view.sync(base)
    epoch_of[base.current_snapshot().snapshot_id] = epoch_no


def test_versions_open_close_at_sync_grain(spark, base_and_view):
    base, view = base_and_view
    epoch_of = {}
    _step(spark, base, view, [("a", 0, "I", "new", "x"), ("b", 0, "I", "new", "y")], 10, epoch_of, 1)
    _step(spark, base, view, [("a", 0, "U", "open", "x2")], 20, epoch_of, 2)
    _step(spark, base, view, [("a", 0, "U", "done", None), ("b", 0, "D", None, None)], 30, epoch_of, 3)
    assert _hist(view, epoch_of) == {
        ("a", 0): [(1, 2, "new", False), (2, 3, "open", False), (3, None, "done", True)],
        ("b", 0): [(1, 3, "new", False)],
    }


def test_untracked_change_and_cancel_out_emit_no_version(spark, base_and_view):
    base, view = base_and_view
    epoch_of = {}
    _step(spark, base, view, [("a", 0, "I", "new", "x")], 10, epoch_of, 1)
    # note (untracked) changes; status flips and flips BACK within one
    # epoch — the net diff shows status unchanged
    _step(
        spark, base, view,
        [("a", 0, "U", "open", "x2"), ("a", 0, "U", "new", "x3")],
        20, epoch_of, 2,
    )
    assert _hist(view, epoch_of) == {("a", 0): [(1, None, "new", True)]}
    # a sync with nothing to version leaves the view untouched
    assert view.table.current_snapshot().operation != "noop"


def test_rebirth_after_delete_opens_fresh_version(spark, base_and_view):
    base, view = base_and_view
    epoch_of = {}
    _step(spark, base, view, [("a", 0, "I", "new", None)], 10, epoch_of, 1)
    _step(spark, base, view, [("a", 0, "D", None, None)], 20, epoch_of, 2)
    _step(spark, base, view, [("a", 0, "I", "new", None)], 30, epoch_of, 3)
    # same tracked value, but the delete closed version 1 — rebirth is new
    assert _hist(view, epoch_of) == {
        ("a", 0): [(1, 2, "new", False), (3, None, "new", True)]
    }


def test_current_equals_base_live_state(spark, base_and_view):
    base, view = base_and_view
    epoch_of = {}
    _step(spark, base, view, [("a", 0, "I", "new", "x"), ("b", 0, "I", "old", "y"), ("c", 1, "I", "mid", None)], 10, epoch_of, 1)
    _step(spark, base, view, [("a", 0, "U", "done", None), ("c", 1, "D", None, None)], 20, epoch_of, 2)
    cur = sorted(
        (r["conv_id"], r["turn_idx"], r["status"]) for r in view.current().collect()
    )
    live = sorted(
        (r["conv_id"], r["turn_idx"], r["status"])
        for r in base.read_logical().select("conv_id", "turn_idx", "status").collect()
    )
    assert cur == live == [("a", 0, "done"), ("b", 0, "old")]


def test_null_tracked_values_are_nullsafe(spark, base_and_view):
    base, view = base_and_view
    epoch_of = {}
    _step(spark, base, view, [("a", 0, "I", None, "x")], 10, epoch_of, 1)
    _step(spark, base, view, [("a", 0, "U", None, "y")], 20, epoch_of, 2)  # null == null
    _step(spark, base, view, [("a", 0, "U", "set", "z")], 30, epoch_of, 3)
    assert _hist(view, epoch_of) == {
        ("a", 0): [(1, 3, None, False), (3, None, "set", True)]
    }


def test_sync_is_exactly_once_and_refuses_backwards(spark, base_and_view):
    base, view = base_and_view
    merge_into(base, _batch(spark, [("a", 0, "I", "new", None)], 10))
    head = base.current_snapshot().snapshot_id
    view.sync(base)
    assert view.last_synced_base_snapshot() == head
    snap = view.table.current_snapshot().snapshot_id
    r = view.sync(base, to_id=head)
    assert r.strategy in ("noop", "skipped-duplicate")
    assert view.table.current_snapshot().snapshot_id == snap
    merge_into(base, _batch(spark, [("a", 0, "U", "open", None)], 20))
    view.sync(base)
    with pytest.raises(ValueError):
        view.sync(base, to_id=head)
    assert view.history().count() == 2


def test_bootstrap_after_expired_create_snapshot(spark, tmp_dir):
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    merge_into(base, _batch(spark, [("a", 0, "I", "new", None), ("b", 0, "I", "old", None)], 10))
    merge_into(base, _batch(spark, [("a", 0, "D", None, None)], 20))
    base.expire_snapshots(keep_last=1)
    view = Scd2View.create(spark, os.path.join(tmp_dir, "v"), base, track_cols=["status"])
    view.sync(base)  # cannot diff from create — bootstraps from full state
    rows = [(r["conv_id"], r["status"], r["is_current"]) for r in view.history().collect()]
    assert sorted(rows) == [("b", "old", True)]


def test_create_rejects_key_and_missing_track_cols(spark, tmp_dir):
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    with pytest.raises(ValueError, match="KEY column"):
        Scd2View.create(spark, os.path.join(tmp_dir, "v1"), base, track_cols=["conv_id"])
    with pytest.raises(ValueError, match="no column"):
        Scd2View.create(spark, os.path.join(tmp_dir, "v2"), base, track_cols=["nope"])
