"""Dead-letter sink + per-partition lineage (SURVEY G8 / VERDICT r01 #8-9).

The reference never silently loses a sample — an unparseable input latches
an UNSUPPORTED status in the per-sample results vector
(/root/reference/include/nvimgcodec.h:735-768,
/root/reference/src/processing_results.h:51-89). The Spark-scale analog:
unclaimed lines land in the dead-letter sink with their lineage, and the
epoch's lineage record carries per-source-file (rows, dead, offset/LSN
range, status) entries.
"""

import json
import os

import pytest
from pyspark.sql import types as T

from nvimagecodec_spark.config import EngineConfig
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.streaming.engine import CdcEngine

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _line(op, conv, turn, lsn, text):
    return json.dumps(
        {
            "op": op,
            "lsn": lsn,
            "commit_ts": "2025-01-01 00:00:00",
            "conv_id": conv,
            "turn_idx": turn,
            "after": {"text": text, "ts": "2025-01-01 00:00:00"},
        }
    )


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    (d / "000-valid.jsonl").write_text(
        "\n".join(_line("I", f"c{i}", 0, i + 1, f"t{i}") for i in range(5)) + "\n"
    )
    (d / "001-garbage.jsonl").write_text(
        "this is not an event\n<<binary junk>>\n\nnot json either\n"
    )
    (d / "002-mixed.jsonl").write_text(
        _line("U", "c0", 0, 100, "t0v2") + "\nBROKEN LINE\n" + _line("I", "c9", 1, 101, "t9") + "\n"
    )
    return str(d)


def test_dead_letters_sunk_and_accounted(spark, tmp_path, stream_dir):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    dl_dir = str(tmp_path / "dead")
    engine = CdcEngine(
        spark,
        table,
        source_id="dl-test",
        config=EngineConfig(dead_letter_dir=dl_dir, expire_every_epochs=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    engine.run_stream(stream_dir, max_files_per_trigger=10)

    # apply unaffected: all valid events landed, LWW picked the update
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read_logical().collect()}
    assert rows[("c0", 0)] == "t0v2"
    assert rows[("c9", 1)] == "t9"
    assert len(rows) == 6

    # every garbage line is in the sink with its lineage (3 + 1; blank
    # lines are dropped, not dead-lettered)
    dl = spark.read.parquet(dl_dir).collect()
    assert len(dl) == 4
    assert all(r["raw_value"] for r in dl)
    assert {os.path.basename(r["src_file"]) for r in dl} == {
        "001-garbage.jsonl",
        "002-mixed.jsonl",
    }
    assert all(r["source_id"] == "dl-test" for r in dl)

    # lineage: totals + per-partition rows with the all-dead file visible
    recs = [r for r in engine.lineage() if r.get("events")]
    total_dead = sum(r.get("dead_letters", 0) for r in engine.lineage())
    assert total_dead == 4
    parts = [p for r in engine.lineage() for p in r.get("partitions", [])]
    by_file = {os.path.basename(p["src_file"]): p for p in parts}
    assert by_file["001-garbage.jsonl"]["status"] == "dead-only"
    assert by_file["001-garbage.jsonl"]["rows"] == 0
    assert by_file["001-garbage.jsonl"]["dead_letters"] == 3
    assert by_file["000-valid.jsonl"]["status"] == "ok"
    assert by_file["000-valid.jsonl"]["rows"] == 5
    assert by_file["002-mixed.jsonl"]["rows"] == 2
    assert by_file["002-mixed.jsonl"]["dead_letters"] == 1
    # lsn range of the applied rows is latched per partition
    assert by_file["000-valid.jsonl"]["lsn_range"] == [1, 5]
    # and the epochs all committed (partition failure != epoch failure)
    assert all(r.get("snapshot_id") for r in recs)


def test_no_sink_configured_still_counts(spark, tmp_path, stream_dir):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    engine = CdcEngine(
        spark,
        table,
        source_id="dl-test2",
        config=EngineConfig(dead_letter_dir=None, expire_every_epochs=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    engine.run_stream(stream_dir, max_files_per_trigger=10)
    assert table.read_logical().count() == 6
    assert sum(r.get("dead_letters", 0) for r in engine.lineage()) == 4


def test_dead_letter_sink_idempotent_under_crash_replay(spark, tmp_path, stream_dir, monkeypatch):
    """Crash AFTER the dead-letter write but BEFORE the merge commit, then
    replay the epoch: the sink partition is overwritten, not appended —
    no duplicate dead letters (exactly-once extends to the sink)."""
    from nvimagecodec_spark.sources.changelog import ChangeStream, parse_changes
    from nvimagecodec_spark.streaming import engine as engine_mod

    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    dl_dir = str(tmp_path / "dead")
    engine = CdcEngine(
        spark,
        table,
        source_id="dl-replay",
        config=EngineConfig(dead_letter_dir=dl_dir, expire_every_epochs=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    events = parse_changes(
        ChangeStream(spark, stream_dir).raw(), keep_dead=True
    )

    crash = {"armed": True}
    orig = engine_mod.merge_into

    def crashing_merge(*a, **k):
        if crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("simulated crash between DL write and commit")
        return orig(*a, **k)

    monkeypatch.setattr(engine_mod, "merge_into", crashing_merge)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        engine.apply_epoch(events, batch_id=0)
    n_after_crash = spark.read.parquet(dl_dir).count()
    assert n_after_crash == 4

    # replay the same epoch to completion
    engine.apply_epoch(events, batch_id=0)
    dl = spark.read.parquet(dl_dir)
    assert dl.count() == 4, "replay duplicated dead letters"
    assert table.read_logical().count() == 6


def test_lineage_partitions_capped_server_side(spark, tmp_path):
    """Round-3 verdict #1: a many-file epoch must not collect one row per
    source file to the driver — the per-file detail is capped SERVER-side
    at MAX_PARTITION_LINEAGE (dead-only files prioritized into the capped
    set), while the totals stay exact."""
    from nvimagecodec_spark.sources.changelog import ChangeStream, parse_changes
    from nvimagecodec_spark.streaming.engine import CdcEngine as E

    d = tmp_path / "many"
    d.mkdir()
    n_files = E.MAX_PARTITION_LINEAGE + 36  # 100 files > cap 64
    dead_files = {7, 42}
    for i in range(n_files):
        name = f"{i:03d}.jsonl"
        if i in dead_files:
            (d / name).write_text("GARBAGE NOT AN EVENT\n")
        else:
            (d / name).write_text(_line("I", f"c{i}", 0, i + 1, f"t{i}") + "\n")
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    engine = CdcEngine(
        spark,
        table,
        source_id="cap",
        config=EngineConfig(dead_letter_dir=str(tmp_path / "dead"), expire_every_epochs=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    events = parse_changes(ChangeStream(spark, str(d)).raw(), keep_dead=True)

    # the fused stats job itself returns a bounded detail set + exact totals
    stats = engine._epoch_stats(events)
    assert stats["truncated"] is True
    assert len(stats["partitions"]) == E.MAX_PARTITION_LINEAGE
    assert stats["n_files"] == n_files          # exact despite the cap
    assert stats["n_dead"] == len(dead_files)
    assert stats["n_events"] == n_files - len(dead_files)
    assert stats["distinct_keys"] == n_files - len(dead_files)
    # dead-only files are prioritized into the capped detail
    dead_first = [p["status"] for p in stats["partitions"][: len(dead_files)]]
    assert dead_first == ["dead-only"] * len(dead_files)

    # end to end: the lineage record carries the capped detail + the flag
    engine.apply_epoch(events, batch_id=0)
    rec = engine.lineage()[-1]
    assert rec["partitions_truncated"] is True
    assert len(rec["partitions"]) == E.MAX_PARTITION_LINEAGE
    assert rec["dead_letters"] == len(dead_files)
    assert rec["events"] == n_files - len(dead_files)
    assert table.read_logical().count() == n_files - len(dead_files)


def test_poison_storm_keeps_sink_parallel(spark, tmp_path):
    """Round-3 advice #7: an epoch where a misconfigured upstream emits
    ~10^5 bad lines must not funnel the dead-letter sink through ONE
    task — above the threshold the sink keeps 8-way parallelism (file
    count proves the write parallelism; the healthy rows still apply)."""
    d = tmp_path / "storm"
    d.mkdir()
    with open(d / "000-storm.jsonl", "w") as f:
        for i in range(5):
            f.write(_line("I", f"c{i}", 0, i + 1, f"t{i}") + "\n")
        for i in range(100_000):
            f.write(f"POISON LINE {i} ##\n")
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    dl_dir = str(tmp_path / "dead")
    engine = CdcEngine(
        spark,
        table,
        source_id="storm",
        config=EngineConfig(dead_letter_dir=dl_dir, expire_every_epochs=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    engine.run_stream(str(d), max_files_per_trigger=10)

    assert table.read_logical().count() == 5  # healthy path unaffected
    dead = spark.read.parquet(dl_dir)
    assert dead.count() == 100_000
    part = [
        p for p in os.walk(dl_dir)
    ]
    n_files = sum(
        1 for root, _d, fns in part for fn in fns if fn.endswith(".parquet")
    )
    assert n_files > 1, "poison storm serialized through one sink task"
