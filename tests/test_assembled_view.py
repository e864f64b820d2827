"""Incrementally-maintained assembled-conversations view + sharded
JSONL export maintenance.

Invariants: after any sequence of base epochs and syncs, (a) the view
equals ``assemble_conversations`` over the base's CURRENT logical state,
with NO base re-scan during sync (the stored turn array is the prior
state); (b) the export directory is byte-identical to a from-scratch
export of the same snapshot, while only manifest-dirty shards rewrite.
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into
from nvimagecodec_spark.operators.transcripts import (
    AssembledTranscriptsView,
    ShardedJsonlExport,
    assemble_conversations,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows, lsn0):
    """[(conv, turn, op, role, text)] → deduped change batch."""
    data = [
        (
            c,
            t,
            op,
            lsn0 + i,
            json.dumps({"role": role, "text": txt}) if op != "D" else None,
        )
        for i, (c, t, op, role, txt) in enumerate(rows)
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


def _expected(base):
    live = base.read_logical().select("conv_id", "turn_idx", "role", "text")
    return assemble_conversations(live, line_cols=["role", "text"])


def _vrows(df):
    cols = ["conv_id", "n_turns", "first_turn", "last_turn", "n_chars", "full_text"]
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=lambda t: (t[0] is not None, t[0] or ""),
    )


@pytest.fixture()
def base(spark, tmp_dir):
    return LakeTable.create(
        spark,
        os.path.join(tmp_dir, "base"),
        SCHEMA,
        ["conv_id", "turn_idx"],
        bucket_count=8,
    )


EPOCH1 = [
    ("a", 0, "I", "user", "hello"),
    ("a", 1, "I", "assistant", "hi"),
    ("a", 2, "I", "user", "bye"),
    ("b", 0, "I", "user", "solo"),
    ("c", 0, "I", "user", "x"),
    ("c", 1, "I", "assistant", None),  # null text renders empty
    (None, 0, "I", "user", "nullconv"),  # null key is an ordinary key
]

EPOCH2 = [
    ("a", 1, "U", "assistant", "hi EDITED"),  # update middle turn
    ("a", 2, "D", None, None),  # delete last turn
    ("a", 5, "I", "tool", "late add"),  # append new turn
    ("b", 0, "D", None, None),  # conversation fully deleted
    ("d", 0, "I", "user", "new conv"),  # brand-new conversation
    (None, 1, "I", "assistant", "nullconv2"),
]


def test_view_matches_full_recompute_across_epochs(spark, base, tmp_dir):
    merge_into(base, _batch(spark, EPOCH1, 100))
    view = AssembledTranscriptsView.create(
        spark, os.path.join(tmp_dir, "view"), base, line_cols=["role", "text"]
    )
    view.sync(base)
    assert _vrows(view.conversations()) == _vrows(_expected(base))

    merge_into(base, _batch(spark, EPOCH2, 200))
    res = view.sync(base)
    assert res.strategy != "noop"
    got, want = _vrows(view.conversations()), _vrows(_expected(base))
    assert got == want
    # deleted conversation is gone, edits visible
    convs = {r[0]: r for r in got}
    assert "b" not in convs
    assert "hi EDITED" in convs["a"][5] and "bye" not in convs["a"][5]
    assert convs["a"][3] == 5  # last_turn moved to the appended turn
    assert None in convs  # null conv assembled like any other

    # replayed sync is a tagged no-op
    assert view.sync(base).strategy in ("noop", "skipped-duplicate")


def test_view_second_epoch_with_lower_lsns_still_applies(spark, base, tmp_dir):
    # regression: per-conversation max(change lsn) is NOT monotone across
    # epochs (interleaved streams) — epoch 2 inserts new turns whose lsns
    # are all LOWER than epoch 1's; the view row must still update
    # (sync order = base snapshot sequence, not event lsn)
    merge_into(base, _batch(spark, EPOCH1, 1000))
    view = AssembledTranscriptsView.create(
        spark, os.path.join(tmp_dir, "view"), base, line_cols=["role", "text"]
    )
    view.sync(base)
    late = [("a", 9, "I", "tool", "low-lsn add"), ("b", 1, "I", "user", "also")]
    merge_into(base, _batch(spark, late, 10))
    view.sync(base)
    assert _vrows(view.conversations()) == _vrows(_expected(base))
    a = {r["conv_id"]: r for r in view.conversations().collect()}["a"]
    assert a["last_turn"] == 9 and "low-lsn add" in a["full_text"]


def test_view_reopen_and_turn_order(spark, base, tmp_dir):
    merge_into(base, _batch(spark, EPOCH1, 100))
    path = os.path.join(tmp_dir, "view")
    AssembledTranscriptsView.create(
        spark, path, base, line_cols=["role", "text"]
    ).sync(base)
    # re-open from path alone (config persisted in table properties)
    view = AssembledTranscriptsView(spark, path)
    a = {r["conv_id"]: r for r in view.conversations().collect()}["a"]
    assert a["full_text"] == "user: hello\nassistant: hi\nuser: bye"
    assert (a["first_turn"], a["last_turn"], a["n_turns"]) == (0, 2, 3)


def test_view_bootstrap_after_create_snapshot_expired(spark, base, tmp_dir):
    merge_into(base, _batch(spark, EPOCH1, 100))
    merge_into(base, _batch(spark, EPOCH2, 200))
    # expire everything but the head — the create snapshot is gone, so the
    # first sync must bootstrap from full live state, not a changelog
    base.expire_snapshots(keep_last=1)
    view = AssembledTranscriptsView.create(
        spark, os.path.join(tmp_dir, "view"), base, line_cols=["role", "text"]
    )
    view.sync(base)
    assert _vrows(view.conversations()) == _vrows(_expected(base))


def _shard_contents(path):
    out = {}
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        lines = []
        for p in sorted(glob.glob(os.path.join(d, "part-*"))):
            lines.extend(open(p, encoding="utf-8").read().splitlines())
        out[os.path.basename(d)] = lines
    return out


def test_export_incremental_equals_full(spark, base, tmp_dir):
    merge_into(base, _batch(spark, EPOCH1, 100))
    view = AssembledTranscriptsView.create(
        spark, os.path.join(tmp_dir, "view"), base, line_cols=["role", "text"]
    )
    view.sync(base)
    cols = ["conv_id", "n_turns", "first_turn", "last_turn", "n_chars", "full_text"]
    exp = ShardedJsonlExport.create(
        spark, os.path.join(tmp_dir, "exp"), view.table, columns=cols
    )
    # no-op sync touches nothing
    assert exp.sync()["dirty_shards"] == []

    before = _shard_contents(exp.path)
    merge_into(base, _batch(spark, EPOCH2, 200))
    view.sync(base)
    res = exp.sync()
    assert res["dirty_shards"] and res["dirty_shards"] != ["*"]

    # byte-identical to a from-scratch export of the same snapshot
    full = ShardedJsonlExport.create(
        spark, os.path.join(tmp_dir, "exp_full"), view.table, columns=cols
    )
    assert _shard_contents(exp.path) == _shard_contents(full.path)

    # shards outside the dirty set kept their exact files (no rewrite)
    dirty = {f"shard={b}" for b in res["dirty_shards"]}
    after = _shard_contents(exp.path)
    for shard, lines in before.items():
        if shard not in dirty:
            assert after[shard] == lines


def test_export_emptied_shard_dir_removed(spark, tmp_dir):
    t = LakeTable.create(
        spark,
        os.path.join(tmp_dir, "t"),
        T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("v", T.LongType()),
            ]
        ),
        ["conv_id"],
        bucket_count=4,
    )

    def b(rows, lsn0):
        data = [
            (c, op, lsn0 + i, json.dumps({"v": v}) if op != "D" else None)
            for i, (c, op, v) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, "conv_id string, op string, lsn long, after string"
        ).withColumns(
            {
                "commit_ts": F.lit("2026-01-01 00:00:00").cast("timestamp"),
                "src_file": F.lit("test"),
                "src_offset": F.col("lsn"),
            }
        )
        return lww_dedupe(df, key_cols=["conv_id"])

    merge_into(t, b([("a", "I", 1), ("b", "I", 2)], 10))
    exp = ShardedJsonlExport.create(spark, os.path.join(tmp_dir, "e"), t)
    occupied = set(_shard_contents(exp.path))
    assert occupied
    # delete every row of one key → its shard dir must disappear
    merge_into(t, b([("a", "D", None)], 20))
    exp.sync()
    want = {
        f"shard={r['s']}"
        for r in t.read_logical()
        .select(t.bucket_expr(t.read_logical()).alias("s"))
        .distinct()
        .collect()
    }
    assert set(_shard_contents(exp.path)) == want


def test_export_create_rejects_double_init_and_bad_cols(spark, base, tmp_dir):
    merge_into(base, _batch(spark, EPOCH1, 100))
    p = os.path.join(tmp_dir, "e")
    ShardedJsonlExport.create(spark, p, base)
    with pytest.raises(FileExistsError):
        ShardedJsonlExport.create(spark, p, base)
    with pytest.raises(ValueError):
        ShardedJsonlExport.create(spark, os.path.join(tmp_dir, "e2"), base, columns=["nope"])


def test_view_registers_in_txn_catalog(spark, tmp_dir):
    """AssembledTranscriptsView satisfies the register_view contract:
    after each committed transaction, catalog.read of the view is
    consistent with catalog.read of its base (synced inside the flip)."""
    from nvimagecodec_spark.lakehouse.txn import TxnCatalog

    base = LakeTable.create(
        spark,
        os.path.join(tmp_dir, "base"),
        SCHEMA,
        ["conv_id", "turn_idx"],
        bucket_count=4,
    )
    merge_into(base, _batch(spark, EPOCH1, 100))
    cat = TxnCatalog.create(spark, os.path.join(tmp_dir, "cat"), {"t": base})
    view = AssembledTranscriptsView.create(
        spark, os.path.join(tmp_dir, "view"), base, line_cols=["role", "text"]
    )
    cat.register_view("asm", view, "t")

    txn = cat.begin("tx", 1)
    txn.merge("t", _batch(spark, EPOCH2, 200))
    txn.commit()

    got = {r["conv_id"]: r["full_text"] for r in cat.read("asm").collect()}
    live = cat.read("t").select("conv_id", "turn_idx", "role", "text")
    want = {
        r["conv_id"]: r["full_text"]
        for r in assemble_conversations(live, line_cols=["role", "text"]).collect()
    }
    assert got == want and "d" in got and "b" not in got


def test_export_crash_between_rewrite_and_state_flip_heals(spark, base, tmp_dir):
    """A crash after rewriting dirty shards but BEFORE the state-file
    flip leaves the old cursor; the re-run recomputes the same dirty set
    and converges (sync is idempotent)."""
    merge_into(base, _batch(spark, EPOCH1, 100))
    exp = ShardedJsonlExport.create(spark, os.path.join(tmp_dir, "e"), base)
    merge_into(base, _batch(spark, EPOCH2, 200))
    head = base.current_snapshot().snapshot_id
    # simulate the crash: do the rewrite, skip the state flip
    from nvimagecodec_spark.lakehouse.incremental import changed_buckets

    dirty = changed_buckets(base, exp.state["snapshot_id"], head)
    exp._rewrite_buckets(dirty, head)
    assert exp.state["snapshot_id"] != head  # cursor still old

    res = exp.sync()  # healing run
    assert res["snapshot_id"] == head
    full = ShardedJsonlExport.create(spark, os.path.join(tmp_dir, "full"), base)
    assert _shard_contents(exp.path) == _shard_contents(full.path)


def test_engine_post_epoch_hook_drives_view_and_export(spark, tmp_dir):
    """post_epoch wires the downstream materializations into the
    streaming loop itself: after run_stream drains, the view and the
    shard files are already at the table head — no second orchestrator.
    A replayed epoch re-fires the hook (idempotent via sync cursors)."""
    from nvimagecodec_spark.sources.generator import (
        events_to_files,
        generate_change_events,
    )
    from nvimagecodec_spark.streaming.engine import CdcEngine

    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(
        generate_change_events(n_events=800, seed=3), stream_dir, files=4
    )
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), schema, ["conv_id", "turn_idx"], bucket_count=4
    )
    view = AssembledTranscriptsView.create(
        spark, os.path.join(tmp_dir, "v"), table, line_cols=["role", "text"]
    )
    exp = ShardedJsonlExport.create(
        spark, os.path.join(tmp_dir, "e"), view.table, columns=["conv_id", "full_text"]
    )
    fired = []

    def after(engine, batch_id):
        fired.append(batch_id)
        view.sync(engine.table)
        exp.sync()

    eng = CdcEngine(
        spark,
        table,
        source_id="hooked",
        checkpoint_dir=os.path.join(tmp_dir, "ck"),
        post_epoch=after,
    )
    n = eng.run_stream(stream_dir, max_files_per_trigger=2)
    assert n >= 2 and len(fired) == n

    # view + files already match the head, no extra sync needed
    assert _vrows(view.conversations()) == _vrows(_expected(table))
    back = {}
    for p in glob.glob(os.path.join(tmp_dir, "e", "shard=*", "part-*")):
        for line in open(p, encoding="utf-8"):
            rec = json.loads(line)
            back[rec["conv_id"]] = rec["full_text"]
    want = {r["conv_id"]: r["full_text"] for r in view.conversations().collect()}
    assert back == want

    # replay: same checkpoint, same files → epochs skip, hook re-fires,
    # state unchanged
    before = _shard_contents(os.path.join(tmp_dir, "e"))
    fired.clear()
    eng2 = CdcEngine(
        spark,
        table,
        source_id="hooked",
        checkpoint_dir=os.path.join(tmp_dir, "ck2"),
        post_epoch=after,
    )
    eng2.run_stream(stream_dir, max_files_per_trigger=4)
    assert fired  # re-fired on the replayed (skipped-duplicate) epochs
    assert _shard_contents(os.path.join(tmp_dir, "e")) == before


def test_always_on_tail_with_downstream_syncs_kill_resume(spark, tmp_dir):
    """Chaos tier: an ALWAYS-ON interval-trigger tail with post_epoch
    view+export syncs, a writer thread appending mid-flight, and a kill +
    resume on the same checkpoint. Final state must converge THREE deep:
    table == pandas oracle, view == full reassembly, shard files == view.
    The hook's replay firing is what heals a kill that lands between the
    table commit and the downstream syncs."""
    import shutil as _shutil
    import threading
    import time as _time

    from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas
    from nvimagecodec_spark.sources.generator import (
        events_to_files,
        generate_change_events,
    )
    from nvimagecodec_spark.streaming.engine import CdcEngine
    from tests.test_apply_end_to_end import TARGET_SCHEMA
    from tests.test_streaming import _assert_matches_oracle

    events = generate_change_events(n_events=2400, seed=23, with_schema_events=False)
    staged = os.path.join(tmp_dir, "staged")
    events_to_files(events, staged, files=10)
    stream_dir = os.path.join(tmp_dir, "stream")
    os.makedirs(stream_dir)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), TARGET_SCHEMA, ["conv_id", "turn_idx"], bucket_count=8
    )
    view = AssembledTranscriptsView.create(
        spark, os.path.join(tmp_dir, "v"), table, line_cols=["role", "text"]
    )
    exp = ShardedJsonlExport.create(
        spark, os.path.join(tmp_dir, "e"), view.table, columns=["conv_id", "full_text"]
    )

    def after(engine, batch_id):
        view.sync(engine.table)
        exp.sync()

    files = sorted(os.listdir(staged))

    def writer():
        for f in files:
            _shutil.copy(os.path.join(staged, f), os.path.join(stream_dir, f + ".tmp"))
            os.rename(os.path.join(stream_dir, f + ".tmp"), os.path.join(stream_dir, f))
            _time.sleep(0.3)

    t = threading.Thread(target=writer)
    t.start()
    eng = CdcEngine(spark, table, source_id="soak2", post_epoch=after)
    handle = eng.run_stream(stream_dir, max_files_per_trigger=2, trigger_interval="1 seconds")
    deadline = _time.time() + 90
    while _time.time() < deadline and len(eng.lineage()) < 2:
        _time.sleep(0.2)
    handle.stop()  # kill mid-flight, writer still appending
    assert len(eng.lineage()) >= 1

    eng2 = CdcEngine(
        spark, table, source_id="soak2", checkpoint_dir=eng.checkpoint_dir, post_epoch=after
    )
    handle2 = eng2.run_stream(stream_dir, max_files_per_trigger=2, trigger_interval="1 seconds")
    t.join()
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

    # downstream syncs may lag the last commit by one hook firing if the
    # kill landed inside it — one explicit sync is the documented heal
    view.sync(table)
    exp.sync()
    live = table.read_logical().select("conv_id", "turn_idx", "role", "text")
    want = {
        r["conv_id"]: r["full_text"]
        for r in assemble_conversations(live, line_cols=["role", "text"]).collect()
    }
    got = {r["conv_id"]: r["full_text"] for r in view.conversations().collect()}
    assert got == want
    back = {}
    for p in glob.glob(os.path.join(tmp_dir, "e", "shard=*", "part-*")):
        for line in open(p, encoding="utf-8"):
            rec = json.loads(line)
            back[rec["conv_id"]] = rec["full_text"]
    assert back == want


def test_view_survives_base_line_column_rename(spark, base, tmp_dir):
    """Schema evolution on the base: a line column renamed after the view
    was created resolves through prev_names (field-id stable) — syncs
    keep rendering it; a DROPPED line column raises explicitly."""
    merge_into(base, _batch(spark, EPOCH1, 100))
    view = AssembledTranscriptsView.create(
        spark, os.path.join(tmp_dir, "view"), base, line_cols=["role", "text"]
    )
    view.sync(base)
    base.rename_column("text", "body")
    late = [("a", 7, "I", "user", "post-rename")]
    data = [
        (c, t, op, 500 + i, json.dumps({"role": r, "body": x}))
        for i, (c, t, op, r, x) in enumerate(late)
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, op string, lsn long, after string"
    ).withColumns(
        {
            "commit_ts": F.lit("2026-01-02 00:00:00").cast("timestamp"),
            "src_file": F.lit("test"),
            "src_offset": F.col("lsn"),
        }
    )
    merge_into(base, lww_dedupe(df))
    view.sync(base)
    a = {r["conv_id"]: r for r in view.conversations().collect()}["a"]
    assert "post-rename" in a["full_text"] and a["last_turn"] == 7

    base.drop_column("body")
    merge_into(base, _batch(spark, [("a", 8, "I", "user", None)], 600))
    with pytest.raises(ValueError, match="no longer exists"):
        view.sync(base)
