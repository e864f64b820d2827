"""M2: streaming loop + exactly-once (SURVEY §7.1 M2, §2.8 T1-T3).

Mirrors the reference's iteration protocol tests: epochs serialized,
results latch once, replay/resume leaves final state identical.
"""

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import types as T

from nvimagecodec_spark.config import EngineConfig
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas
from nvimagecodec_spark.sources.changelog import ChangeStream
from nvimagecodec_spark.sources.generator import events_to_files, generate_change_events
from nvimagecodec_spark.streaming.engine import CdcEngine
from nvimagecodec_spark.streaming.ratelimit import AdaptiveRateController

from tests.test_apply_end_to_end import TARGET_SCHEMA, canon_oracle, canon_spark


def _setup(spark, tmp_dir, n_events=3000, with_schema=True, files=10):
    events = generate_change_events(n_events=n_events, seed=42, with_schema_events=with_schema)
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events, stream_dir, files=files)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "table"), TARGET_SCHEMA, ["conv_id", "turn_idx"], bucket_count=8
    )
    return events, stream_dir, table


def _assert_matches_oracle(table, events):
    got = canon_spark(table.read_logical())
    want = canon_oracle(apply_events_pandas(events))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.astype("object").where(got.notna(), None),
        want.astype("object").where(want.notna(), None),
        check_dtype=False,
    )


def test_stream_multi_epoch_matches_oracle(spark, tmp_dir):
    """NOTE: multi-epoch streaming splits the stream by FILE order, which
    (with bounded LSN disorder across file boundaries) can apply a late
    event in a later epoch — exactly the real CDC situation. LWW absorbs
    it: the merge coalesces by max order key, so epoch boundaries don't
    change the final state."""
    events, stream_dir, table = _setup(spark, tmp_dir)
    engine = CdcEngine(spark, table, source_id="s1")
    n = engine.run_stream(stream_dir, max_files_per_trigger=3)
    assert n >= 3  # multiple epochs actually exercised
    _assert_matches_oracle(table, events)
    recs = engine.lineage()
    assert len(recs) == n
    assert all(r["snapshot_id"] is not None or r["events"] == 0 for r in recs)


def test_kill_resume_exactly_once(spark, tmp_dir):
    """Run some epochs, 'crash' (drop the query, keep checkpoint), resume:
    final state identical to a single clean run; replayed epochs no-op."""
    events, stream_dir, table = _setup(spark, tmp_dir, n_events=2000, files=8)

    # stage the files in two waves to force an interrupted run
    half_dir = os.path.join(tmp_dir, "half")
    os.makedirs(half_dir)
    all_files = sorted(os.listdir(stream_dir))
    for f in all_files[:4]:
        shutil.copy(os.path.join(stream_dir, f), os.path.join(half_dir, f))

    engine = CdcEngine(spark, table, source_id="s1")
    engine.run_stream(half_dir, max_files_per_trigger=2)
    mid_snapshot = table.current_snapshot().snapshot_id
    assert mid_snapshot > 1

    # "crash recovery": new engine object, same checkpoint; rest of files arrive
    for f in all_files[4:]:
        shutil.copy(os.path.join(stream_dir, f), os.path.join(half_dir, f))
    engine2 = CdcEngine(spark, table, source_id="s1", checkpoint_dir=engine.checkpoint_dir)
    engine2.run_stream(half_dir, max_files_per_trigger=2)

    _assert_matches_oracle(table, events)


def test_incremental_loop_resumes_from_lineage(spark, tmp_dir):
    events, stream_dir, table = _setup(spark, tmp_dir, n_events=2000, with_schema=False)
    # pin the adaptive cap so exactly ~4 epochs are needed (the controller
    # would otherwise grow it and finish in 2 — its own test covers that)
    cfg = EngineConfig(target_batch_events=1000, min_batch_events=200, max_batch_events=1000)
    engine = CdcEngine(spark, table, source_id="inc", config=cfg)
    stream = ChangeStream(spark, stream_dir)
    n1 = engine.run_incremental(stream, max_epochs=2)
    assert n1 == 2
    # resume with a fresh engine — must pick up from lineage, not restart
    engine2 = CdcEngine(spark, table, source_id="inc", config=cfg)
    n2 = engine2.run_incremental(stream)
    assert n2 >= 1
    _assert_matches_oracle(table, events)
    # replaying again: no new epochs
    engine3 = CdcEngine(spark, table, source_id="inc", config=cfg)
    assert engine3.run_incremental(stream) == 0


def test_incremental_epochs_track_cap_with_gappy_lsns(spark, tmp_dir):
    """Round-3 VERDICT #5: a database LSN is a byte position, not a row
    number. With LSNs spaced 2000 apart, the old dense-LSN proxy
    (end = last + cap) would plan ~0.1 events per epoch and exhaust
    max_epochs; real offset accounting sizes every epoch by EVENT counts
    from the per-chunk histogram, so epoch sizes track the rate cap
    regardless of LSN density."""
    events = generate_change_events(n_events=600, seed=5, with_schema_events=False)
    events["lsn"] = events["lsn"] * 1000  # gappy: spacing 2 -> 2000
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events, stream_dir, files=6)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "table"),
        __import__("tests.test_apply_end_to_end", fromlist=["TARGET_SCHEMA"]).TARGET_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=8,
    )
    cfg = EngineConfig(target_batch_events=200, min_batch_events=200, max_batch_events=200)
    engine = CdcEngine(spark, table, source_id="gappy", config=cfg)
    n = engine.run_incremental(ChangeStream(spark, stream_dir), max_epochs=10)
    total = len(events)
    assert 3 <= n <= 6, n  # ~total/200 epochs, NOT max_epochs-exhausted
    recs = engine.lineage()
    assert len(recs) == n
    # every epoch except the tail carries ~cap events (chunk-granular)
    for r in recs[:-1]:
        assert 150 <= r["events"] <= 220, r["events"]
    assert sum(r["events"] for r in recs) == total
    _assert_matches_oracle(table, events)


def test_incremental_applies_lsn_zero(spark, tmp_dir):
    """Review-caught: slices are (last, end], so the loop must start
    below the smallest valid lsn — an event at lsn=0 (real sources start
    there) was silently dropped when progress started at 0."""
    import json

    stream_dir = os.path.join(tmp_dir, "s")
    os.makedirs(stream_dir)
    lines = [
        {"op": "I", "lsn": 0, "commit_ts": "2025-01-01 00:00:00",
         "conv_id": "zero", "turn_idx": 0,
         "after": {"role": "user", "text": "first", "ts": "2025-01-01 00:00:00"}},
        {"op": "I", "lsn": 1, "commit_ts": "2025-01-01 00:00:01",
         "conv_id": "one", "turn_idx": 0,
         "after": {"role": "user", "text": "second", "ts": "2025-01-01 00:00:00"}},
    ]
    with open(os.path.join(stream_dir, "a.jsonl"), "w") as f:
        for l in lines:
            f.write(json.dumps(l) + "\n")
    from tests.test_apply_end_to_end import TARGET_SCHEMA

    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), TARGET_SCHEMA, ["conv_id", "turn_idx"], 2
    )
    engine = CdcEngine(spark, table, source_id="z")
    n = engine.run_incremental(ChangeStream(spark, stream_dir))
    assert n >= 1
    rows = {r["conv_id"]: r["text"] for r in table.read_logical().collect()}
    assert rows == {"zero": "first", "one": "second"}


def test_lsn_counts_bins_lsn_zero_with_coarse_granularity(spark, tmp_dir):
    """Advisor-caught: with start_lsn=-1 (run_incremental's seed) and
    granularity>1, truncating div binned an lsn=0 event into chunk 0 —
    its chunk_end was g instead of 0, violating the documented invariant
    that chunk c covers (c*g, (c+1)*g]. lsn=0 must land in chunk -1
    (chunk_end 0) so slice(start=-1, end=0] captures exactly it."""
    import json

    stream_dir = os.path.join(tmp_dir, "s")
    os.makedirs(stream_dir)
    with open(os.path.join(stream_dir, "a.jsonl"), "w") as f:
        for lsn in (0, 1, 7, 8):
            f.write(json.dumps(
                {"op": "I", "lsn": lsn, "commit_ts": "2025-01-01 00:00:00",
                 "conv_id": f"c{lsn}", "turn_idx": 0,
                 "after": {"role": "user", "text": "x", "ts": "2025-01-01 00:00:00"}}
            ) + "\n")
    hist = ChangeStream(spark, stream_dir).lsn_counts(start_lsn=-1, granularity=4)
    # chunks: (-4,0] holds lsn 0; (0,4] holds lsn 1; (4,8] holds lsn 7,8
    assert hist == [(0, 1), (4, 1), (8, 2)], hist
    # every chunk_end is a valid slice bound covering exactly its count
    stream = ChangeStream(spark, stream_dir)
    last = -1
    for end, n in hist:
        assert stream.slice(start_lsn=last, end_lsn=end).count() == n
        last = end


def test_incremental_after_stream_no_tag_collision(spark, tmp_dir):
    """Review-caught: run_stream and run_incremental share the commit-tag
    keyspace of a source_id. Switching modes must seed the incremental
    loop's batch ids ABOVE the streaming epochs' tags — a collision made
    apply_epoch no-op as 'skipped-duplicate' while the loop advanced
    past real events, silently dropping them."""
    events, stream_dir, table = _setup(spark, tmp_dir, n_events=800, with_schema=False, files=4)
    engine = CdcEngine(spark, table, source_id="mixed")
    n1 = engine.run_stream(stream_dir, max_files_per_trigger=2)
    assert n1 >= 2  # tags (mixed, 0..n1-1) now exist

    # new events arrive; a FRESH engine drains them incrementally.
    # lsns continue past the first stream's range.
    extra = generate_change_events(n_events=300, seed=99, with_schema_events=False)
    extra["lsn"] = extra["lsn"] + int(events["lsn"].max())
    extra_dir = os.path.join(tmp_dir, "extra")
    events_to_files(extra, extra_dir, files=2)
    engine2 = CdcEngine(spark, table, source_id="mixed",
                        checkpoint_dir=os.path.join(tmp_dir, "ck2"))
    n2 = engine2.run_incremental(ChangeStream(spark, extra_dir))
    assert n2 >= 1
    # every applied epoch committed for real — none skipped as duplicate
    recs = [r for r in engine2.lineage() if r.get("offset_range")]
    assert recs and all(r["strategy"] != "skipped-duplicate" for r in recs)

    import pandas as pd

    combined = pd.concat([events, extra], ignore_index=True)
    _assert_matches_oracle(table, combined)


def test_run_stream_honors_max_epochs(spark, tmp_dir):
    """max_epochs was accepted and silently ignored (review-caught); the
    bound is best-effort but must actually stop a large backlog early."""
    events, stream_dir, table = _setup(spark, tmp_dir, n_events=2000, with_schema=False, files=10)
    engine = CdcEngine(spark, table, source_id="capped")
    n = engine.run_stream(stream_dir, max_files_per_trigger=1, max_epochs=2)
    assert n < 10, n  # stopped well before draining all 10 single-file epochs


def test_epoch_replay_is_noop_at_engine_level(spark, tmp_dir):
    events, stream_dir, table = _setup(spark, tmp_dir, n_events=500, with_schema=False, files=2)
    engine = CdcEngine(spark, table, source_id="x")
    ev = ChangeStream(spark, stream_dir).events()
    r1 = engine.apply_epoch(ev, batch_id=0)
    assert r1.snapshot is not None
    r2 = engine.apply_epoch(ev, batch_id=0)  # same epoch id → replay
    assert r2.strategy == "skipped-duplicate"
    assert table.current_snapshot().snapshot_id == r1.snapshot.snapshot_id


def test_staged_replay_does_not_fire_post_epoch(spark, tmp_dir):
    """A STAGED epoch's downstream syncs belong to the transaction that
    publishes it. On the skipped-duplicate replay path the hook must obey
    the same guard as the normal path — firing it there would run view
    syncs mid-transaction, before the catalog pointer flips."""
    events, stream_dir, table = _setup(spark, tmp_dir, n_events=400, with_schema=False, files=2)
    fired: list[tuple[int, str]] = []
    ev = ChangeStream(spark, stream_dir).events()

    engine = CdcEngine(
        spark,
        table,
        source_id="hook",
        post_epoch=lambda eng, bid: fired.append((bid, "fired")),
    )
    r1 = engine.apply_epoch(ev, batch_id=0)  # normal commit → fires
    assert r1.snapshot is not None and fired == [(0, "fired")]

    fired.clear()
    r2 = engine.apply_epoch(ev, batch_id=0, staged=True)  # staged replay
    assert r2.strategy == "skipped-duplicate"
    assert fired == []  # hook did NOT fire mid-transaction

    r3 = engine.apply_epoch(ev, batch_id=0)  # unstaged replay still heals
    assert r3.strategy == "skipped-duplicate"
    assert fired == [(0, "fired")]


def test_adaptive_rate_controller_converges():
    c = AdaptiveRateController(target_epoch_seconds=10.0, cap=1000, min_cap=100, max_cap=10**7)
    # throughput: 1000 events/sec → ideal cap 10_000
    for _ in range(40):
        cap = c.observe(c.cap, c.cap / 1000.0)
    assert 8000 < cap < 12500
    # regime change: now 100 events/sec → ideal cap 1_000
    for _ in range(40):
        cap = c.observe(c.cap, c.cap / 100.0)
    assert 800 < cap < 1300


def test_dead_letters_split(spark, tmp_dir):
    stream_dir = os.path.join(tmp_dir, "s")
    os.makedirs(stream_dir)
    with open(os.path.join(stream_dir, "a.jsonl"), "w") as f:
        f.write('{"op":"I","lsn":2,"commit_ts":"2025-01-01 00:00:00","conv_id":"c","turn_idx":0,"after":{"role":"user","text":"hi","ts":"2025-01-01 00:00:00"}}\n')
        f.write("this is not an event\n")
        f.write('<xml>nope</xml>\n')
    cs = ChangeStream(spark, stream_dir)
    assert cs.events().count() == 1
    dead = cs.dead_letters().collect()
    assert len(dead) == 2


def test_crash_between_schema_apply_and_merge_commit(spark, tmp_dir):
    """Hard part (SURVEY §7.3 #2): a crash AFTER the epoch's schema events
    were applied but BEFORE the data merge committed. On replay the schema
    events re-apply as no-ops (add/rename/widen are all idempotent) and
    the merge runs — final state equals the clean-run oracle."""
    from nvimagecodec_spark.operators.schema_events import (
        apply_schema_events,
        split_schema_events,
    )

    events, stream_dir, table = _setup(spark, tmp_dir, n_events=1500, with_schema=True, files=1)
    ev = ChangeStream(spark, stream_dir).events()

    # simulate the partial epoch: schema applied, merge never committed
    _data, schema_ev = split_schema_events(ev)
    res1 = apply_schema_events(table, schema_ev)
    assert res1.applied and not res1.rejected
    schema_versions_after_crash = len(table.meta["schemas"])
    assert table.read_logical().count() == 0  # no data committed

    # recovery: the full epoch replays from the checkpointed offset
    engine = CdcEngine(spark, table, source_id="rec")
    r = engine.apply_epoch(ev, batch_id=0)
    assert r.snapshot is not None
    _assert_matches_oracle(table, events)
    # idempotent re-application added no duplicate schema versions
    table.refresh()
    assert len(table.meta["schemas"]) == schema_versions_after_crash


def test_interval_trigger_soak_kill_resume(spark, tmp_dir):
    """Round-3 verdict #7: the ALWAYS-ON tail (processingTime trigger,
    the production mode / reference T1 loop) under sustained load: a
    writer thread appends files while the query polls; the query is
    killed mid-flight, resumed on the same checkpoint with the writer
    still appending, and the final state must be exactly-once identical
    to the single-batch oracle. availableNow covers the drain path in
    the tests above; this covers the live handle's lifecycle."""
    import threading
    import time as _time

    events = generate_change_events(n_events=3000, seed=11, with_schema_events=False)
    staged = os.path.join(tmp_dir, "staged")
    events_to_files(events, staged, files=12)
    stream_dir = os.path.join(tmp_dir, "stream")
    os.makedirs(stream_dir)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "table"), TARGET_SCHEMA, ["conv_id", "turn_idx"], bucket_count=8
    )
    engine = CdcEngine(spark, table, source_id="soak")
    files = sorted(os.listdir(staged))

    def writer():
        for f in files:
            shutil.copy(os.path.join(staged, f), os.path.join(stream_dir, f + ".tmp"))
            # atomic publish: the tailing FileStreamSource must never list
            # a half-copied file
            os.rename(
                os.path.join(stream_dir, f + ".tmp"), os.path.join(stream_dir, f)
            )
            _time.sleep(0.4)

    t = threading.Thread(target=writer)
    t.start()
    handle = engine.run_stream(
        stream_dir, max_files_per_trigger=2, trigger_interval="1 seconds"
    )
    assert handle.isActive  # the live production handle, caller-owned
    # let the tail apply a couple of epochs, then KILL mid-flight (the
    # writer is still appending)
    deadline = _time.time() + 90
    while _time.time() < deadline and len(engine.lineage()) < 2:
        _time.sleep(0.2)
    handle.stop()
    n_before = len(engine.lineage())
    assert n_before >= 1, "no epoch applied before the kill"
    assert t.is_alive() or len(os.listdir(stream_dir)) == len(files)

    # resume on the SAME checkpoint while the writer keeps appending
    engine2 = CdcEngine(
        spark, table, source_id="soak", checkpoint_dir=engine.checkpoint_dir
    )
    handle2 = engine2.run_stream(
        stream_dir, max_files_per_trigger=2, trigger_interval="1 seconds"
    )
    t.join()
    # poll until the tail catches up to the full oracle state
    deadline = _time.time() + 120
    ok = False
    while _time.time() < deadline:
        try:
            _assert_matches_oracle(table, events)
            ok = True
            break
        except AssertionError:
            _time.sleep(1.0)
    handle2.stop()
    assert ok, "tail never converged to the oracle state"

    # exactly-once bookkeeping: no epoch applied twice
    batch_ids = [r["batch_id"] for r in engine2.lineage()]
    assert len(batch_ids) == len(set(batch_ids))
    # and a third run over the same directory is a pure no-op
    snap = table.current_snapshot().snapshot_id
    engine3 = CdcEngine(
        spark, table, source_id="soak", checkpoint_dir=engine.checkpoint_dir
    )
    engine3.run_stream(stream_dir, max_files_per_trigger=4)
    assert table.current_snapshot().snapshot_id == snap


def test_adaptive_split_controller_dynamics():
    """Round-3 verdict #6 unit semantics: the split fraction is a feedback
    loop, not a constant. Probe epochs keep the sort-merge baseline fresh;
    a split that outruns the baseline widens (more buckets to broadcast),
    a split >10% behind halves; broadcast/noop epochs carry no signal."""
    from nvimagecodec_spark.streaming.ratelimit import AdaptiveSplitController

    c = AdaptiveSplitController(threshold=1000, probe_every=4)
    # epochs 1-3 split-enabled, epoch 4 is the baseline probe
    plans = [c.plan() for _ in range(4)]
    assert plans[:3] == [1000, 1000, 1000] and plans[3] == 0

    # baseline: sort-merge at 10k rows/s
    c.observe("sort-merge", 100_000, 10.0)
    assert c.sortmerge_ewma == pytest.approx(10_000)
    # split running FASTER -> threshold grows
    c.observe("split(light:3,heavy:2)", 120_000, 10.0)
    assert c.threshold == pytest.approx(1250)
    # split collapsing to half the baseline -> EWMA drops below the
    # deadband after one more observation, threshold backs off
    c.observe("split(light:3,heavy:2)", 30_000, 10.0)
    assert c.threshold == pytest.approx(625)
    # floor respected under sustained losses
    for _ in range(10):
        c.observe("split(light:1,heavy:1)", 10_000, 10.0)
    assert c.threshold == c.min_threshold
    # strategies outside the split regime never move the knob
    t = c.threshold
    c.observe("broadcast", 50_000, 1.0)
    c.observe("noop", 0, 0.0)
    assert c.threshold == t
    # recovery: splits beating the baseline again grow the threshold back
    for _ in range(6):
        c.observe("split(light:2,heavy:2)", 500_000, 10.0)
    assert c.threshold > t
    # cap respected
    for _ in range(40):
        c.observe("split(light:2,heavy:2)", 500_000, 10.0)
    assert c.threshold == c.max_threshold


def test_engine_auto_split_probes_and_adapts(spark, tmp_dir):
    """split_light_buckets='auto' end to end: the engine plans a threshold
    per epoch (periodic probe epochs run plain sort-merge), observes apply
    throughput, and records the evolving threshold in lineage — final
    state stays oracle-identical regardless of which strategy each epoch
    took."""
    events, stream_dir, table = _setup(spark, tmp_dir, n_events=2000, with_schema=False, files=8)
    cfg = EngineConfig(
        split_light_buckets="auto",
        # tiny broadcast threshold forces the sort-merge/split regime so
        # the controller actually engages on this small fixture
        broadcast_threshold_rows=10,
        light_bucket_max_rows=50,
        expire_every_epochs=0,
    )
    engine = CdcEngine(spark, table, source_id="autosplit", config=cfg)
    n = engine.run_stream(stream_dir, max_files_per_trigger=2)
    assert n >= 3
    _assert_matches_oracle(table, events)
    recs = engine.lineage()
    assert all(r["split_threshold"] is not None for r in recs)
    # the controller planned every epoch: probe cadence means epoch 4
    # (plan #4) ran the plain path; strategies must all be valid
    assert engine.split_ctl.epochs_planned == n
    for r in recs:
        assert r["strategy"].startswith(
            ("split", "sort-merge", "broadcast", "delta", "noop", "initial-load")
        )
