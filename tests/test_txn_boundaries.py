"""Source-transaction-atomic epochs (Debezium transaction-metadata
analog): events sharing a txn_id must land in ONE epoch, so no committed
snapshot ever exposes a partially-applied source transaction.

The invariant checked: every epoch's end_lsn (from lineage) is a safe
boundary — no transaction has min_lsn <= end < max_lsn — while the final
table state still equals the pandas oracle (snapping must not lose or
reorder anything).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.config import EngineConfig
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.oracle import apply_events_pandas
from nvimagecodec_spark.sources.changelog import ChangeStream
from nvimagecodec_spark.sources.generator import (
    generate_change_events,
    events_to_files,
)
from nvimagecodec_spark.streaming.engine import CdcEngine

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _stage(spark, tmp_dir, n=3000, txn_max=7, seed=11):
    ev = generate_change_events(
        n_events=n, seed=seed, txn_max_size=txn_max, with_schema_events=False
    )
    stream_dir = os.path.join(tmp_dir, "stream")
    # jsonl-only: the txn metadata rides the jsonl wire
    events_to_files(ev, stream_dir, files=6, encoding_mix=False)
    return ev, ChangeStream(spark, stream_dir)


def _txn_extents(ev: pd.DataFrame) -> pd.DataFrame:
    d = ev[ev["txn_id"].notna()]
    return d.groupby("txn_id")["lsn"].agg(["min", "max"]).reset_index()


def test_generator_assigns_and_wire_round_trips(spark, tmp_dir):
    ev, stream = _stage(spark, tmp_dir)
    assert ev["txn_id"].notna().all()
    # multi-event transactions exist (the feature isn't vacuous)
    ext = _txn_extents(ev)
    assert (ext["max"] > ext["min"]).any()
    got = stream.events().where(F.col("txn_id").isNotNull())
    # wire round trip: same (lsn -> txn_id) mapping for a sample
    rows = {r["lsn"]: r["txn_id"] for r in got.limit(500).collect()}
    want = dict(zip(ev["lsn"], ev["txn_id"]))
    for lsn, tid in rows.items():
        assert int(want[lsn]) == tid


def test_safe_boundaries_match_pandas(spark, tmp_dir):
    ev, stream = _stage(spark, tmp_dir)
    ext = _txn_extents(ev)
    top = int(ev["lsn"].max())
    candidates = list(range(0, top + 50, 37))
    safe = stream.safe_boundaries(candidates, start_lsn=-1)
    for b in candidates:
        splits = ((ext["min"] <= b) & (b < ext["max"])).any()
        assert (b in safe) == (not splits), b


def test_safe_boundaries_without_txn_metadata(spark, tmp_dir):
    ev = generate_change_events(n_events=500, seed=3, with_schema_events=False)
    stream_dir = os.path.join(tmp_dir, "s2")
    events_to_files(ev, stream_dir, files=3, encoding_mix=False)
    stream = ChangeStream(spark, stream_dir)
    cands = [10, 99, 1000]
    assert stream.safe_boundaries(cands) == set(cands)


def test_txn_atomic_epochs_never_split_a_transaction(spark, tmp_dir):
    ev, stream = _stage(spark, tmp_dir, n=4000, txn_max=9, seed=23)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=8
    )
    cap = 333  # deliberately unaligned with txn sizes
    cfg = EngineConfig(
        target_batch_events=cap,
        min_batch_events=1,
        max_batch_events=cap,
        expire_every_epochs=0,
        txn_atomic=True,
    )
    eng = CdcEngine(
        spark, table, source_id="txnb",
        checkpoint_dir=os.path.join(tmp_dir, "ckpt"), config=cfg,
    )
    n_epochs = eng.run_incremental(stream, max_epochs=100)
    assert n_epochs >= 5  # the cap actually sliced the stream

    ext = _txn_extents(ev)
    recs = [
        r for r in eng.lineage_log.records()
        if r.get("source_id") == "txnb" and r.get("offset_range")
    ]
    assert len(recs) == n_epochs
    for r in recs:
        end = r["offset_range"]["end_lsn"]
        assert r["offset_range"].get("txn_atomic") is True
        splits = ((ext["min"] <= end) & (end < ext["max"])).any()
        assert not splits, f"epoch end {end} splits a source transaction"

    # snapping lost nothing: final state equals the pandas oracle
    got = (
        table.read_logical()
        .select("conv_id", "turn_idx", "role", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        apply_events_pandas(ev)[["conv_id", "turn_idx", "role", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in got.columns:
        assert (got[c].fillna("~") == want[c].fillna("~")).all(), c


def test_oversized_transaction_is_indivisible(spark, tmp_dir):
    """One transaction larger than the rate cap: the epoch runs over the
    cap rather than splitting it."""
    ev = generate_change_events(
        n_events=600, seed=5, txn_max_size=1, with_schema_events=False
    )
    # fuse the middle 200 events into ONE giant transaction
    ev = ev.sort_values("lsn").reset_index(drop=True)
    ev.loc[200:399, "txn_id"] = 10_000_000
    stream_dir = os.path.join(tmp_dir, "s3")
    events_to_files(ev, stream_dir, files=4, encoding_mix=False)
    stream = ChangeStream(spark, stream_dir)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t3"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    cap = 50
    cfg = EngineConfig(
        target_batch_events=cap, min_batch_events=1, max_batch_events=cap,
        expire_every_epochs=0, txn_atomic=True,
    )
    eng = CdcEngine(
        spark, table, source_id="big",
        checkpoint_dir=os.path.join(tmp_dir, "ck3"), config=cfg,
    )
    eng.run_incremental(stream, max_epochs=100)
    ext = _txn_extents(ev)
    big = ext[ext["txn_id"] == 10_000_000].iloc[0]
    # exactly one epoch covers the giant txn whole
    covering = [
        r for r in eng.lineage_log.records()
        if r.get("offset_range")
        and r["offset_range"]["start_lsn"] < big["min"]
        and r["offset_range"]["end_lsn"] >= big["max"]
    ]
    assert len(covering) == 1
    assert covering[0]["offset_range"]["events_planned"] > cap
