"""Atomic multi-table transactions (lakehouse/txn.py): a TxnCatalog's
pointer flips all tables in one step; crash recovery rolls forward once
any table published and rolls back otherwise; serializable conflicts
mid-commit degrade to the per-table replay contract without ever moving
the pointer.

Reference analog: the explicit cross-stream synchronize-and-publish
barrier (/root/reference/src/image_generic_codec.h:605-638) — results
are invisible until the whole batch's barrier passes."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.lakehouse.txn import MultiTableTxn, TxnCatalog, TxnReplayNeeded
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows, lsn0=0):
    data = [
        (c, t, op, lsn0 + i, json.dumps({"text": txt}) if op != "D" else None)
        for i, (c, t, op, txt) in enumerate(rows)
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


def _state(df):
    return {(r.conv_id, r.turn_idx): r.text for r in df.collect()}


@pytest.fixture()
def cat(spark, tmp_dir):
    tables = {}
    for name in ("left", "right"):
        t = LakeTable.create(
            spark,
            os.path.join(tmp_dir, name),
            SCHEMA,
            ["conv_id", "turn_idx"],
            bucket_count=4,
        )
        merge_into(t, _batch(spark, [(name, 0, "I", f"seed-{name}")]))
        tables[name] = t
    return TxnCatalog.create(spark, os.path.join(tmp_dir, "cat"), tables), tables


def _stage_epoch(spark, catalog, batch_id=7, lsn0=100):
    txn = catalog.begin("tx", batch_id)
    txn.merge("left", _batch(spark, [("left", 1, "I", "L1")], lsn0=lsn0))
    txn.merge("right", _batch(spark, [("right", 1, "I", "R1")], lsn0=lsn0))
    return txn


def test_commit_is_atomic_for_catalog_readers(spark, cat):
    catalog, tables = cat
    txn = _stage_epoch(spark, catalog)
    # staged, not committed: neither catalog nor direct readers move
    assert _state(catalog.read("left")) == {("left", 0): "seed-left"}
    assert _state(tables["left"].read_logical()) == {("left", 0): "seed-left"}
    snaps = txn.commit()
    assert set(snaps) == {"left", "right"}
    assert _state(catalog.read("left")) == {
        ("left", 0): "seed-left",
        ("left", 1): "L1",
    }
    assert _state(catalog.read("right")) == {
        ("right", 0): "seed-right",
        ("right", 1): "R1",
    }
    # pointer == the published snapshots; intent cleaned up
    assert catalog.pinned_snapshot("left") == snaps["left"]
    assert os.listdir(os.path.join(catalog.path, "txns")) == []


def test_abort_discards_everything(spark, cat):
    catalog, tables = cat
    txn = _stage_epoch(spark, catalog)
    txn.abort()
    for name in ("left", "right"):
        t = catalog.table(name)
        assert t.staged() == []
        assert _state(t.read_logical()) == {(name, 0): f"seed-{name}"}


def _crash_on_publish(monkeypatch, after_n):
    """Make the (after_n+1)-th publish_staged die mid-commit."""
    real = LakeTable.publish_staged
    calls = {"n": 0}

    def boom(self, staged_id, tag=None):
        if calls["n"] >= after_n:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real(self, staged_id, tag=tag)

    monkeypatch.setattr(LakeTable, "publish_staged", boom)
    return calls


def test_crash_mid_publish_rolls_forward(spark, cat, monkeypatch):
    catalog, tables = cat
    txn = _stage_epoch(spark, catalog)
    _crash_on_publish(monkeypatch, after_n=1)
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit()
    monkeypatch.undo()
    # one table's head advanced, but the CATALOG view is still the old
    # consistent pair — the pointer never moved
    assert _state(catalog.read("left")) == {("left", 0): "seed-left"}
    assert _state(catalog.read("right")) == {("right", 0): "seed-right"}
    # recovery (as on next load) completes the batch
    recat = TxnCatalog.load(spark, catalog.path)
    assert recat.recover() == []  # load() already resolved everything
    assert _state(recat.read("left"))[("left", 1)] == "L1"
    assert _state(recat.read("right"))[("right", 1)] == "R1"
    # per-table exactly-once tags present on BOTH (publish + roll-forward)
    for name in ("left", "right"):
        assert recat.table(name).has_commit_tag(f"tx.{name}", 7)


def test_crash_before_any_publish_rolls_back(spark, cat, monkeypatch):
    catalog, tables = cat
    txn = _stage_epoch(spark, catalog)
    _crash_on_publish(monkeypatch, after_n=0)
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit()
    monkeypatch.undo()
    res = catalog.recover()
    assert [r["action"] for r in res] == ["rolled-back"]
    for name in ("left", "right"):
        t = catalog.table(name)
        assert t.staged() == []  # stages aborted, files reclaimed
        assert _state(t.read_logical()) == {(name, 0): f"seed-{name}"}
        assert not t.has_commit_tag(f"tx.{name}", 7)
    assert os.listdir(os.path.join(catalog.path, "txns")) == []


def test_replay_after_rollforward_is_idempotent(spark, cat, monkeypatch):
    catalog, tables = cat
    txn = _stage_epoch(spark, catalog)
    _crash_on_publish(monkeypatch, after_n=1)
    with pytest.raises(RuntimeError):
        txn.commit()
    monkeypatch.undo()
    catalog.recover()
    before = {n: catalog.pinned_snapshot(n) for n in ("left", "right")}
    # the stream replays the epoch: every merge skips on its tag, commit
    # re-pins the same snapshots
    txn2 = _stage_epoch(spark, catalog)
    snaps = txn2.commit()
    assert snaps == before
    assert {n: catalog.pinned_snapshot(n) for n in snaps} == before


def test_conflict_mid_commit_never_moves_pointer_and_replay_heals(spark, cat):
    catalog, tables = cat
    txn = catalog.begin("tx", 9)
    txn.merge("left", _batch(spark, [("left", 2, "I", "L2")], lsn0=200))
    txn.merge("right", _batch(spark, [("right", 2, "I", "R2")], lsn0=200))
    # out-of-band writer touches right's STAGED bucket after staging (the
    # same key, so the same bucket by construction) — the staged baseline
    # is now stale (single-writer contract violated). Racer's lsn is LOWER
    # than the batch's, so the replayed merge wins LWW over it.
    merge_into(
        tables["right"], _batch(spark, [("right", 2, "I", "racer")], lsn0=50)
    )
    with pytest.raises(TxnReplayNeeded):
        txn.commit()
    # pointer untouched; right's stale stage aborted; left published
    # (per-table tag present) but invisible through the catalog
    assert _state(catalog.read("left")) == {("left", 0): "seed-left"}
    assert catalog.table("right").staged() == []
    assert catalog.table("left").has_commit_tag("tx.left", 9)
    # replay the epoch: left skips, right re-merges against the new base
    txn2 = catalog.begin("tx", 9)
    assert txn2.merge("left", _batch(spark, [("left", 2, "I", "L2")], lsn0=200)) is None
    txn2.merge("right", _batch(spark, [("right", 2, "I", "R2")], lsn0=200))
    txn2.commit()
    assert _state(catalog.read("left"))[("left", 2)] == "L2"
    right = _state(catalog.read("right"))
    assert right[("right", 2)] == "R2"  # replayed merge won LWW over the racer
    assert right[("right", 0)] == "seed-right"  # racer's commit wasn't lost


def test_router_atomic_stream(spark, tmp_dir):
    from nvimagecodec_spark.sources.generator import (
        events_to_files,
        generate_change_events,
    )
    from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas
    from nvimagecodec_spark.streaming.router import CdcRouter
    from tests.test_apply_end_to_end import TARGET_SCHEMA

    events = generate_change_events(n_events=1200, seed=23, with_schema_events=False)
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events, stream_dir, files=4)
    te = LakeTable.create(
        spark, os.path.join(tmp_dir, "even"), TARGET_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=4,
    )
    to = LakeTable.create(
        spark, os.path.join(tmp_dir, "odd"), TARGET_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=4,
    )
    catalog = TxnCatalog.create(
        spark, os.path.join(tmp_dir, "cat"), {"even": te, "odd": to}
    )
    router = CdcRouter(
        spark,
        routes={
            "even": (te, F.col("turn_idx") % 2 == 0),
            "odd": (to, F.col("turn_idx") % 2 == 1),
        },
        source_id="rta",
    )
    n = router.run_stream(stream_dir, max_files_per_trigger=2, catalog=catalog)
    assert n >= 2

    want = apply_events_pandas(events)

    def keys(df):
        return {
            (r["conv_id"], r["turn_idx"])
            for r in df.select("conv_id", "turn_idx").collect()
        }

    for route, parity in (("even", 0), ("odd", 1)):
        w = want[want["turn_idx"] % 2 == parity]
        assert keys(catalog.read(route)) == set(zip(w["conv_id"], w["turn_idx"]))
    # catalog pins == table heads after a clean drain
    for route, t in (("even", te), ("odd", to)):
        t.refresh()
        assert catalog.pinned_snapshot(route) == t.current_snapshot().snapshot_id


def test_crash_before_flip_on_replay_carries_skipped_tables(
    spark, cat, monkeypatch
):
    """A replayed epoch where some tables skip on their tags must record
    the skips in the intent: a crash after the replay's publishes but
    before the pointer flip rolls forward to a view where EVERY table —
    skipped ones included — shows the batch. (Regression: skips were
    absent from the intent, so recovery flipped only the re-staged
    tables and left the skipped table's pin one epoch behind.)"""
    catalog, tables = cat
    txn = catalog.begin("tx", 9)
    txn.merge("left", _batch(spark, [("left", 2, "I", "L2")], lsn0=200))
    txn.merge("right", _batch(spark, [("right", 2, "I", "R2")], lsn0=200))
    # out-of-band writer invalidates right's staged baseline
    merge_into(
        tables["right"], _batch(spark, [("right", 2, "I", "racer")], lsn0=50)
    )
    with pytest.raises(TxnReplayNeeded):
        txn.commit()
    # replay: left skips on its tag, right re-stages; crash BEFORE flip
    txn2 = catalog.begin("tx", 9)
    assert txn2.merge("left", _batch(spark, [("left", 2, "I", "L2")], lsn0=200)) is None
    txn2.merge("right", _batch(spark, [("right", 2, "I", "R2")], lsn0=200))
    monkeypatch.setattr(
        TxnCatalog, "_flip", lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    )
    with pytest.raises(RuntimeError, match="crash"):
        txn2.commit()
    monkeypatch.undo()
    # pointer never moved: the old consistent pair is still served
    assert _state(catalog.read("left")) == {("left", 0): "seed-left"}
    # recovery rolls forward and the flip covers BOTH tables
    recat = TxnCatalog.load(spark, catalog.path)
    left = _state(recat.read("left"))
    right = _state(recat.read("right"))
    assert left[("left", 2)] == "L2"  # the skipped table's pin moved too
    assert right[("right", 2)] == "R2"
    assert os.listdir(os.path.join(recat.path, "txns")) == []


def test_atomic_commit_with_noop_route(spark, cat):
    """A route with zero usable events in an epoch must not poison the
    atomic commit (regression: its 'noop' merge result was staged as a
    replay-skip, and commit() failed looking for a tag that never
    existed). The noop table's pin stays; the active table's moves."""
    catalog, tables = cat
    txn = catalog.begin("tx", 11)
    txn.merge("left", _batch(spark, [("left", 5, "I", "L5")], lsn0=500))
    # right: empty deduped batch -> merge_into returns strategy "noop"
    empty = _batch(spark, [("right", 9, "I", "x")], lsn0=1).where("1=0")
    res = txn.merge("right", empty)
    assert res.strategy == "noop" and res.staged_id is None
    snaps = txn.commit()
    assert "left" in snaps
    assert _state(catalog.read("left"))[("left", 5)] == "L5"
    assert _state(catalog.read("right")) == {("right", 0): "seed-right"}


def test_all_noop_commit_does_not_churn_catalog_version(spark, cat):
    catalog, tables = cat
    v0 = catalog.state["_version"]
    txn = catalog.begin("tx", 12)
    snaps = txn.commit()
    assert snaps == {}
    catalog.refresh()
    assert catalog.state["_version"] == v0
    assert os.listdir(os.path.join(catalog.path, "txns")) == []


def test_router_atomic_stream_with_empty_route(spark, tmp_dir):
    """Atomic fan-out where one route's predicate never matches: every
    epoch is a noop for it; the stream must drain cleanly and the dead
    route's pin must never move."""
    from nvimagecodec_spark.sources.generator import (
        events_to_files,
        generate_change_events,
    )
    from nvimagecodec_spark.streaming.router import CdcRouter
    from tests.test_apply_end_to_end import TARGET_SCHEMA

    events = generate_change_events(n_events=600, seed=31, with_schema_events=False)
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events, stream_dir, files=4)
    ta = LakeTable.create(
        spark, os.path.join(tmp_dir, "all"), TARGET_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=4,
    )
    tn = LakeTable.create(
        spark, os.path.join(tmp_dir, "never"), TARGET_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=4,
    )
    catalog = TxnCatalog.create(
        spark, os.path.join(tmp_dir, "cat"), {"all": ta, "never": tn}
    )
    never_pin = catalog.pinned_snapshot("never")
    router = CdcRouter(
        spark,
        routes={
            "all": (ta, F.lit(True)),
            "never": (tn, F.lit(False)),
        },
        source_id="rtn",
    )
    n = router.run_stream(stream_dir, max_files_per_trigger=2, catalog=catalog)
    assert n >= 2
    catalog.refresh()
    assert catalog.pinned_snapshot("never") == never_pin
    assert catalog.read("never").count() == 0
    assert catalog.read("all").count() > 0
    assert os.listdir(os.path.join(catalog.path, "txns")) == []
