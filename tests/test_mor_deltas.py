"""Merge-on-read delta layer (LakeTable.append_deltas / merge_into_delta).

The 100 TB incremental answer: a small batch of updates scattered across
keys rewrites nearly every bucket under copy-on-write; delta layering
makes the write O(batch) and defers resolution to the read, which
reconciles ONLY dirty buckets with the same order comparator the merge
strategies use. These tests pin:

- semantic equivalence: a CoW apply and a delta apply of the same epochs
  produce identical logical tables (and both match the pandas oracle);
- LWW across layers: late (lower-order) delta events never clobber newer
  base rows; deletes are not resurrected by stale inserts;
- read-path scoping: a table with NO deltas plans no reconcile exchange,
  and a dirty read only reconciles dirty buckets;
- compaction: folding deltas into base preserves the logical table and
  drops the consumed delta files; time travel still sees the pre-fold
  layering;
- exactly-once: replaying a tagged delta epoch is a no-op;
- engine integration: mor_deltas=True streams to the same final state as
  the pandas oracle with "delta-append" epochs.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into, merge_into_delta
from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas
from nvimagecodec_spark.sources.changelog import ChangeStream
from nvimagecodec_spark.sources.generator import events_to_files, generate_change_events

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_EV_COLS = ["op", "lsn", "commit_ts", "conv_id", "turn_idx", "after", "src_file", "src_offset"]


def _mk_table(spark, tmp_dir, name="tbl", buckets=8):
    return LakeTable.create(
        spark, os.path.join(tmp_dir, name), TARGET_SCHEMA, ["conv_id", "turn_idx"], buckets
    )


def _ev(spark, rows):
    """rows: (op, lsn, conv, turn, after_json)"""
    from datetime import datetime

    ts = datetime(2025, 1, 1)
    data = [
        (op, lsn, ts, conv, turn, after, "t", i)
        for i, (op, lsn, conv, turn, after) in enumerate(rows)
    ]
    schema = (
        "op string, lsn long, commit_ts timestamp, conv_id string, "
        "turn_idx int, after string, src_file string, src_offset long"
    )
    return spark.createDataFrame(data, schema)


def _logical(table, **kw) -> pd.DataFrame:
    pdf = table.read_logical(**kw).toPandas()
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_delta_apply_equals_cow_apply(spark, tmp_dir):
    events = generate_change_events(n_events=4000, seed=42, with_schema_events=False)
    stream_dir = os.path.join(tmp_dir, "stream")
    paths = sorted(events_to_files(events, stream_dir, files=8))
    cow = _mk_table(spark, tmp_dir, "cow")
    mor = _mk_table(spark, tmp_dir, "mor")
    # same single-file epochs, CoW vs delta layering — no compaction
    for i, p in enumerate(paths):
        batch = lww_dedupe(ChangeStream(spark, p).events())
        merge_into(cow, batch, tag={"source_id": "c", "batch_id": i})
        merge_into_delta(mor, batch, tag={"source_id": "m", "batch_id": i})
    a, b = _logical(cow), _logical(mor)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # the mor table actually layered deltas (writes never rewrote base)
    kinds = {f.get("kind", "base") for f in mor.current_snapshot().files}
    assert "delta" in kinds


def test_lww_across_layers_and_no_resurrection(spark, tmp_dir):
    t = _mk_table(spark, tmp_dir)
    # base: k@lsn10 ; delete d@lsn20
    merge_into(
        t,
        lww_dedupe(
            _ev(
                spark,
                [
                    ("I", 10, "k", 1, '{"role":"user","text":"v10"}'),
                    ("I", 10, "d", 1, '{"role":"user","text":"dv"}'),
                    ("D", 20, "d", 1, None),
                ],
            )
        ),
    )
    # delta layer 1: stale update for k (lsn 5 — must LOSE), stale insert
    # for deleted d (lsn 15 < 20 — must NOT resurrect), new key n@lsn30
    merge_into_delta(
        t,
        lww_dedupe(
            _ev(
                spark,
                [
                    ("U", 5, "k", 1, '{"role":"user","text":"stale"}'),
                    ("I", 15, "d", 1, '{"role":"user","text":"zombie"}'),
                    ("I", 30, "n", 1, '{"role":"user","text":"new"}'),
                ],
            )
        ),
    )
    # delta layer 2: genuine newer update for k (lsn 40)
    merge_into_delta(
        t,
        lww_dedupe(_ev(spark, [("U", 40, "k", 1, '{"role":"user","text":"v40"}')])),
    )
    got = _logical(t)
    state = {r.conv_id: r.text for r in got.itertuples()}
    assert state == {"k": "v40", "n": "new"}
    # delete survived two delta layers as the winner for d
    sys_rows = t.read(with_system=True).where(F.col("conv_id") == "d").collect()
    assert len(sys_rows) == 1 and sys_rows[0]["_sys_deleted"] is True


def test_clean_table_read_plans_no_reconcile_shuffle(spark, tmp_dir):
    from nvimagecodec_spark.plans import plan_of

    t = _mk_table(spark, tmp_dir)
    merge_into(t, lww_dedupe(_ev(spark, [("I", 1, "a", 1, '{"text":"x"}')])))
    plan = plan_of(t.read_logical())
    assert "Exchange" not in plan, plan  # no deltas -> straight scan
    merge_into_delta(t, lww_dedupe(_ev(spark, [("U", 2, "a", 1, '{"text":"y"}')])))
    plan2 = plan_of(t.read_logical())
    assert "Exchange" in plan2  # dirty bucket pays the reconcile


def test_dirty_read_reconciles_only_dirty_buckets(spark, tmp_dir):
    t = _mk_table(spark, tmp_dir, buckets=8)
    rows = [("I", i, f"c{i}", 1, '{"text":"base"}') for i in range(64)]
    merge_into(t, lww_dedupe(_ev(spark, rows)))
    # one updated key -> exactly one dirty bucket
    merge_into_delta(t, lww_dedupe(_ev(spark, [("U", 100, "c0", 1, '{"text":"upd"}')])))
    dirty = set(t.delta_stats())
    assert len(dirty) == 1
    got = _logical(t)
    assert len(got) == 64
    assert got.loc[got.conv_id == "c0", "text"].iloc[0] == "upd"
    # row counts per key: exactly one everywhere (reconcile dedupes)
    assert got.conv_id.is_unique


def test_compact_deltas_preserves_table_and_time_travel(spark, tmp_dir):
    t = _mk_table(spark, tmp_dir)
    merge_into(t, lww_dedupe(_ev(spark, [("I", 1, "a", 1, '{"text":"x"}'),
                                         ("I", 1, "b", 2, '{"text":"y"}')])))
    for i, (k, v) in enumerate([("a", "x2"), ("b", "y2"), ("a", "x3")]):
        merge_into_delta(
            t, lww_dedupe(_ev(spark, [("U", 10 + i, k, 1 if k == "a" else 2,
                                       f'{{"text":"{v}"}}')]))
        )
    pre = _logical(t)
    pre_snap = t.current_snapshot().snapshot_id
    assert t.delta_stats()  # layers present
    snap = t.compact_deltas(max_delta_files=0)
    assert snap is not None
    assert t.delta_stats() == {}  # all folded
    post = _logical(t)
    pd.testing.assert_frame_equal(pre, post)
    # time travel to the pre-fold snapshot still reconciles the layers
    tt = _logical(t, snapshot_id=pre_snap)
    pd.testing.assert_frame_equal(pre, tt)
    # nothing to do on a clean table
    assert t.compact_deltas(max_delta_files=0) is None


def test_delta_exactly_once_tag_replay(spark, tmp_dir):
    t = _mk_table(spark, tmp_dir)
    batch = lww_dedupe(_ev(spark, [("I", 1, "a", 1, '{"text":"x"}')]))
    r1 = merge_into_delta(t, batch, tag={"source_id": "s", "batch_id": 7})
    assert r1.strategy == "delta-append"
    snap_before = t.current_snapshot().snapshot_id
    r2 = merge_into_delta(t, batch, tag={"source_id": "s", "batch_id": 7})
    assert r2.strategy == "skipped-duplicate"
    assert t.refresh().current_snapshot().snapshot_id == snap_before


def test_engine_mor_stream_matches_oracle(spark, tmp_dir):
    from nvimagecodec_spark.config import EngineConfig
    from nvimagecodec_spark.streaming.engine import CdcEngine

    events = generate_change_events(n_events=3000, seed=9)
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events, stream_dir, files=6)
    t = _mk_table(spark, tmp_dir, buckets=8)
    eng = CdcEngine(
        spark,
        t,
        source_id="mor",
        checkpoint_dir=os.path.join(tmp_dir, "ckpt"),
        config=EngineConfig(mor_deltas=True, delta_compact_max_files=2,
                            expire_every_epochs=0),
    )
    eng.run_stream(stream_dir, max_files_per_trigger=2)
    recs = eng.lineage()
    assert recs and all(r["strategy"] in ("delta-append", "noop") for r in recs)
    got = t.read_logical().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = apply_events_pandas(events).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["conv_id", "turn_idx", "role", "text"]:
        ga = got[c].astype("object").where(got[c].notna(), None)
        ea = exp[c].astype("object").where(exp[c].notna(), None)
        assert list(ga) == list(ea), c
    # compaction policy bounded the layering
    assert all(n <= 2 + 1 for n in t.delta_stats().values())


def test_changelog_across_delta_commits(spark, tmp_dir):
    """read_changes over a (from, to] range whose commits are DELTA
    appends: the manifest diff flags the dirty buckets (delta files change
    the bucket file set) and both sides read reconciled state."""
    from nvimagecodec_spark.lakehouse.incremental import read_changes

    t = _mk_table(spark, tmp_dir)
    merge_into(t, lww_dedupe(_ev(spark, [("I", 1, "a", 1, '{"text":"x"}'),
                                         ("I", 1, "b", 2, '{"text":"y"}')])))
    s0 = t.current_snapshot().snapshot_id
    merge_into_delta(t, lww_dedupe(_ev(spark, [
        ("U", 10, "a", 1, '{"text":"x2"}'),
        ("D", 11, "b", 2, None),
        ("I", 12, "c", 3, '{"text":"z"}'),
    ])))
    s1 = t.current_snapshot().snapshot_id
    ch = {(r["conv_id"], r["op"]) for r in read_changes(t, s0, s1).collect()}
    assert ch == {("a", "U"), ("b", "D"), ("c", "I")}


def test_cow_merge_over_dirty_bucket_consumes_deltas(spark, tmp_dir):
    """Mixed mode: a CoW merge touching a delta-carrying bucket reads the
    RECONCILED state and its replace consumes the bucket's delta files —
    layers never leak past a rewrite of their bucket."""
    t = _mk_table(spark, tmp_dir, buckets=2)
    merge_into(t, lww_dedupe(_ev(spark, [("I", 1, "a", 1, '{"text":"x"}')])))
    merge_into_delta(t, lww_dedupe(_ev(spark, [("U", 2, "a", 1, '{"text":"x2"}')])))
    assert t.delta_stats()
    dirty_bucket = next(iter(t.delta_stats()))
    # CoW update of the SAME key -> rewrites the dirty bucket
    merge_into(t, lww_dedupe(_ev(spark, [("U", 3, "a", 1, '{"text":"x3"}')])))
    assert dirty_bucket not in t.delta_stats()
    got = _logical(t)
    assert list(got.text) == ["x3"]


def test_auto_ratio_picks_delta_for_scattered_small_batches(spark, tmp_dir):
    """Adaptive CoW-vs-MoR: the manifest row stats drive the choice — a
    scattered trickle over a big table goes delta-append; a backfill-sized
    batch (and the initial load on an empty table) stays CoW."""
    t = _mk_table(spark, tmp_dir, buckets=4)
    base = [("I", i, f"c{i}", 1, '{"text":"base"}') for i in range(2000)]
    r0 = merge_into(t, lww_dedupe(_ev(spark, base)), delta_auto_ratio=20.0)
    assert r0.strategy != "delta-append"  # empty table: no base to layer over

    # 10 scattered updates over 2000 rows: amplification 200x > 20 -> delta
    small = [("U", 10_000 + i, f"c{i * 37}", 1, '{"text":"upd"}') for i in range(10)]
    r1 = merge_into(t, lww_dedupe(_ev(spark, small)), delta_auto_ratio=20.0)
    assert r1.strategy == "delta-append"
    assert t.delta_stats()

    # 1000-row batch over ~2000 table rows: amplification 2x < 20 -> CoW
    big = [("U", 20_000 + i, f"c{i}", 1, '{"text":"bulk"}') for i in range(1000)]
    r2 = merge_into(t, lww_dedupe(_ev(spark, big)), delta_auto_ratio=20.0)
    assert r2.strategy in ("broadcast", "sort-merge")

    # final state: the bulk CoW (higher lsn, keys c0..c999) overwrote all
    # 10 delta-layer keys (c0,c37..c333); the other 1000 keys stay base
    got = _logical(t)
    assert len(got) == 2000
    assert (got.text == "bulk").sum() == 1000
    assert (got.text == "base").sum() == 1000
    assert (got.text == "upd").sum() == 0


def test_engine_auto_mode_end_to_end(spark, tmp_dir):
    from nvimagecodec_spark.config import EngineConfig
    from nvimagecodec_spark.streaming.engine import CdcEngine

    import shutil as sh

    # the realistic shape: one backfill-sized initial load, then a trickle
    # of small scattered epochs — exactly the regime split the adaptive
    # ratio exists to detect
    events = generate_change_events(n_events=2500, seed=17)
    stream_dir = os.path.join(tmp_dir, "stream")
    os.makedirs(stream_dir)
    big = events_to_files(events.iloc[:2000], os.path.join(tmp_dir, "big"), files=1)
    small = events_to_files(events.iloc[2000:], os.path.join(tmp_dir, "small"), files=10)
    for i, p in enumerate(big + small):
        sh.copy(p, os.path.join(stream_dir, f"part-{i:05d}.{p.rsplit('.', 1)[1]}"))
    t = _mk_table(spark, tmp_dir, buckets=8)
    eng = CdcEngine(
        spark, t, source_id="auto",
        checkpoint_dir=os.path.join(tmp_dir, "ckpt"),
        config=EngineConfig(mor_deltas="auto", mor_auto_ratio=3.0,
                            delta_compact_max_files=64, expire_every_epochs=0),
    )
    eng.run_stream(stream_dir, max_files_per_trigger=1)
    strategies = [r["strategy"] for r in eng.lineage()]
    # the initial load is CoW; later similar-size epochs over the grown
    # table cross the 3x amplification ratio and go delta
    assert strategies[0] != "delta-append"
    assert "delta-append" in strategies, strategies
    got = t.read_logical().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = apply_events_pandas(events).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["conv_id", "turn_idx", "role", "text"]:
        ga = got[c].astype("object").where(got[c].notna(), None)
        ea = exp[c].astype("object").where(exp[c].notna(), None)
        assert list(ga) == list(ea), c


def test_table_property_drives_auto_ratio(spark, tmp_dir):
    """merge.delta-auto-ratio as a TABLE property (Iceberg write.update.mode
    =merge-on-read analog): every unstaged merge on the table gets the
    adaptive choice without the caller passing the knob — the path derived-
    view syncs (dedup/text indexes, SCD2, agg views) use, since their sync()
    signatures never expose it. Explicit-argument override, force-CoW via 0,
    and the staged-merges-stay-CoW contract are all pinned."""
    t = LakeTable.create(
        spark,
        os.path.join(tmp_dir, "proptbl"),
        TARGET_SCHEMA,
        ["conv_id", "turn_idx"],
        4,
        properties={"merge.delta-auto-ratio": 20.0},
    )
    base = [("I", i, f"c{i}", 1, '{"text":"base"}') for i in range(2000)]
    r0 = merge_into(t, lww_dedupe(_ev(spark, base)))
    assert r0.strategy != "delta-append"  # empty table: no base to layer over

    # scattered trickle, NO explicit knob -> the property fires
    small = [("U", 10_000 + i, f"c{i * 37}", 1, '{"text":"upd"}') for i in range(10)]
    r1 = merge_into(t, lww_dedupe(_ev(spark, small)))
    assert r1.strategy == "delta-append"

    # explicit 0 forces CoW even though the property is set (the argument
    # always wins; 0/None-semantics: 0 disables, None defers to the property)
    small2 = [("U", 20_000 + i, f"c{i * 41}", 1, '{"text":"upd2"}') for i in range(10)]
    r2 = merge_into(t, lww_dedupe(_ev(spark, small2)), delta_auto_ratio=0)
    assert r2.strategy in ("broadcast", "sort-merge")

    # staged merges ignore the property (CoW by contract) — and publish fine
    small3 = [("U", 30_000 + i, f"c{i * 43}", 1, '{"text":"upd3"}') for i in range(10)]
    r3 = merge_into(t, lww_dedupe(_ev(spark, small3)), staged=True)
    assert r3.staged_id is not None and "delta" not in r3.strategy
    t.publish_staged(r3.staged_id, tag={"source_id": "prop", "batch_id": 1})

    got = _logical(t)
    assert (got.text == "upd3").sum() == 10
