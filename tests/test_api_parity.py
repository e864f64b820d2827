"""U7-parity surfaces added round 2: timestamp time travel, spark.sql
views over the table, tag-range changelogs, and the always-on streaming
trigger (production tail mode)."""

import json
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.incremental import read_changes_for_tags
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


def _events(spark, rows):
    df = spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, lsn long, commit_ts string, "
        "src_file string, src_offset long, after string",
    )
    return df.withColumn("commit_ts", F.to_timestamp("commit_ts"))


def test_timestamp_time_travel(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 4)
    merge_into(t, lww_dedupe(_events(spark, [("I", "c1", 0, 1, "2025-01-01 00:00:00", "f", 0, '{"text":"v1"}')])))
    mid_ms = int(time.time() * 1000)
    time.sleep(0.01)
    merge_into(t, lww_dedupe(_events(spark, [("U", "c1", 0, 2, "2025-01-01 01:00:00", "f", 1, '{"text":"v2"}')])))

    old = t.snapshot_as_of(mid_ms)
    rows = t.read_logical(snapshot_id=old.snapshot_id).collect()
    assert rows[0]["text"] == "v1"
    assert t.read_logical().collect()[0]["text"] == "v2"
    with pytest.raises(KeyError):
        t.snapshot_as_of(0)


def test_sql_view_over_table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 4)
    merge_into(
        t,
        lww_dedupe(
            _events(
                spark,
                [
                    ("I", "c1", 0, 1, "2025-01-01 00:00:00", "f", 0, '{"text":"a"}'),
                    ("I", "c2", 0, 2, "2025-01-01 00:00:01", "f", 1, '{"text":"b"}'),
                ],
            )
        ),
    )
    t.create_view("transcripts")
    got = spark.sql(
        "SELECT conv_id, text FROM transcripts ORDER BY conv_id"
    ).collect()
    assert [(r["conv_id"], r["text"]) for r in got] == [("c1", "a"), ("c2", "b")]
    # tombstones stay invisible through SQL too
    merge_into(t, lww_dedupe(_events(spark, [("D", "c1", 0, 9, "2025-01-01 02:00:00", "f", 2, None)])))
    t.create_view("transcripts")
    assert spark.sql("SELECT count(*) AS n FROM transcripts").first()["n"] == 1


def test_changelog_between_tags(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 4)
    for batch_id, (op, conv, lsn, txt) in enumerate(
        [("I", "c1", 1, "a"), ("U", "c1", 2, "a2"), ("I", "c3", 3, "c")]
    ):
        merge_into(
            t,
            lww_dedupe(
                _events(
                    spark,
                    [(op, conv, 0, lsn, "2025-01-01 00:00:00", "f", lsn,
                      json.dumps({"text": txt}) if txt else None)],
                )
            ),
            tag={"source_id": "src", "batch_id": batch_id},
        )
    ch = {
        (r["conv_id"], r["turn_idx"]): r
        for r in read_changes_for_tags(t, "src", 0, 2).collect()
    }
    assert ch[("c1", 0)]["op"] == "U" and ch[("c1", 0)]["text"] == "a2"
    assert ch[("c3", 0)]["op"] == "I"
    with pytest.raises(KeyError):
        read_changes_for_tags(t, "src", 0, 99)


def test_always_on_trigger_returns_handle(spark, tmp_path):
    from nvimagecodec_spark.config import EngineConfig
    from nvimagecodec_spark.streaming.engine import CdcEngine

    d = tmp_path / "stream"
    d.mkdir()
    line = json.dumps(
        {
            "op": "I",
            "lsn": 1,
            "commit_ts": "2025-01-01 00:00:00",
            "conv_id": "c1",
            "turn_idx": 0,
            "after": {"text": "x"},
        }
    )
    (d / "a.jsonl").write_text(line + "\n")
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 4)
    engine = CdcEngine(
        spark,
        t,
        source_id="tail",
        config=EngineConfig(expire_every_epochs=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    handle = engine.run_stream(str(d), trigger_interval="1 seconds")
    try:
        assert handle.isActive
        # late-arriving file is picked up by the running tail
        deadline = time.time() + 60
        (d / "b.jsonl").write_text(
            line.replace('"lsn": 1', '"lsn": 2').replace('"c1"', '"c2"') + "\n"
        )
        while time.time() < deadline:
            if t.refresh().read_logical().count() == 2:
                break
            time.sleep(1)
        assert t.read_logical().count() == 2
    finally:
        handle.stop()
