"""Streaming windowed aggregation (watermark semantics) and the
applyInPandasWithState custom stateful operator."""

import json
import os

import pytest

from nvimagecodec_spark.streaming.windows import (
    conversation_progress,
    read_change_stream,
    windowed_op_rates,
)


def _write_file(d, name, rows, mtime=None):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if mtime is not None:  # FileStreamSource orders batches by mtime
        os.utime(p, (mtime, mtime))


def _ev(lsn, ts, conv, turn, op="I"):
    return {
        "op": op,
        "lsn": lsn,
        "commit_ts": ts,
        "conv_id": conv,
        "turn_idx": turn,
        "after": {"role": "user", "text": f"t{lsn}", "tool": None, "ts": ts},
        "schema_change": None,
    }


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    return str(d)


def _run_to_memory(spark, df, name, checkpoint, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()


def test_windowed_op_rates_finalizes_windows_exactly_once(spark, stream_dir, tmp_path):
    """Watermark guarantees asserted here: a window emits (append mode)
    exactly once, after the watermark passes its end; a late row arriving
    AFTER its window was finalized+emitted cannot change it or re-emit it
    (its state is already cleaned up). Dropping late rows BEFORE window
    finalization is best-effort in Spark and deliberately not asserted."""
    # batch 1: two events in [00:00, 00:05), one in [00:05, 00:10)
    _write_file(
        stream_dir,
        "a.jsonl",
        [
            _ev(1, "2025-01-01 00:01:00", "c1", 0),
            _ev(2, "2025-01-01 00:02:00", "c2", 0),
            _ev(3, "2025-01-01 00:09:00", "c1", 1),
        ],
        mtime=1_700_000_000,
    )
    # batch 2: far-future event pushes the watermark to 05:50, finalizing
    # and emitting every 2025-01-01 00:xx window.
    _write_file(
        stream_dir,
        "b.jsonl",
        [_ev(5, "2025-01-01 06:00:00", "c3", 0)],
        mtime=1_700_000_100,
    )
    # batch 3: the 05:50 watermark (derived from batch 2) takes effect and
    # finalizes+emits the 00:xx windows at this batch's end.
    _write_file(
        stream_dir,
        "c.jsonl",
        [_ev(6, "2025-01-01 06:01:00", "c3", 1)],
        mtime=1_700_000_200,
    )
    # batch 4: a late event for the ALREADY-EMITTED [00:00, 00:05) window —
    # its state is cleaned up; the row must be dropped (emit-once).
    _write_file(
        stream_dir,
        "d.jsonl",
        [_ev(7, "2025-01-01 00:03:00", "c9", 0)],
        mtime=1_700_000_300,
    )
    changes = read_change_stream(spark, stream_dir, max_files_per_trigger=1)
    rates = windowed_op_rates(changes, window_duration="5 minutes", watermark="10 minutes")
    _run_to_memory(spark, rates, "rates", str(tmp_path / "ck1"), "append")
    rows = spark.sql("select * from rates").collect()
    first_window = [r for r in rows if "00:00:00" in str(r["window_start"])]
    assert len(first_window) == 1, rows  # emitted exactly once, never re-emitted
    assert first_window[0]["n_events"] == 2  # late c9 event did not mutate it
    second_window = [r for r in rows if "00:05:00" in str(r["window_start"])]
    assert len(second_window) == 1 and second_window[0]["n_events"] == 1


def test_conversation_progress_state_survives_batches(spark, stream_dir, tmp_path):
    _write_file(
        stream_dir,
        "a.jsonl",
        [_ev(1, "2025-01-01 00:00:00", "c1", 0), _ev(2, "2025-01-01 00:00:01", "c1", 3)],
        mtime=1_700_000_000,
    )
    _write_file(
        stream_dir,
        "b.jsonl",
        [_ev(9, "2025-01-01 00:00:02", "c1", 1), _ev(4, "2025-01-01 00:00:03", "c2", 7)],
        mtime=1_700_000_100,
    )
    changes = read_change_stream(spark, stream_dir, max_files_per_trigger=1)
    prog = conversation_progress(changes)
    _run_to_memory(spark, prog, "prog", str(tmp_path / "ck2"), "update")
    rows = spark.sql("select * from prog").collect()
    # latest emission per conversation reflects state accumulated across batches
    latest = {}
    for r in rows:
        cur = latest.get(r["conv_id"])
        if cur is None or r["events_seen"] >= cur["events_seen"]:
            latest[r["conv_id"]] = r
    assert latest["c1"]["events_seen"] == 3
    assert latest["c1"]["max_turn"] == 3
    assert latest["c1"]["last_lsn"] == 9
    assert latest["c2"]["events_seen"] == 1 and latest["c2"]["max_turn"] == 7
