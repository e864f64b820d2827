"""rollback(snapshot_id): metadata-only restore of an earlier snapshot.

Reference analog: re-presenting a previously decoded state without
re-decoding — the code stream's parsed state is cached and re-served
(/root/reference/src/code_stream.cpp:106-142)."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.incremental import read_changes
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
            "src_file": F.lit("t"),
            "src_offset": F.col("lsn"),
        }
    )
    return lww_dedupe(df)


def _state(df):
    return {(r.conv_id, r.turn_idx): r.text for r in df.collect()}


@pytest.fixture()
def table(spark, tmp_dir):
    t = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    merge_into(t, _batch(spark, [("a", 0, "I", "v1"), ("b", 0, "I", "w1")]))
    return t


def test_rollback_restores_state_and_keeps_history(spark, table):
    good = table.current_snapshot().snapshot_id
    good_state = _state(table.read_logical())
    merge_into(
        table,
        _batch(spark, [("a", 0, "U", "BAD"), ("c", 0, "I", "junk")], lsn0=100),
    )
    bad = table.current_snapshot().snapshot_id
    snap = table.rollback(good)
    assert snap.operation == "rollback"
    assert snap.summary["rollback_to"] == good
    assert _state(table.read_logical()) == good_state
    # history preserved: the bad head is still time-travelable
    assert _state(table.read_logical(snapshot_id=bad))[("a", 0)] == "BAD"
    # the restore is itself CDC: diff(bad -> rollback) undoes the epoch
    ch = read_changes(table, bad, snap.snapshot_id)
    ops = {(r.conv_id, r.turn_idx): r.op for r in ch.collect()}
    assert ops[("a", 0)] == "U"  # BAD -> v1
    assert ops[("c", 0)] == "D"  # junk row removed
    # rollback to the current head is a no-op, not a new commit
    again = table.rollback(snap.snapshot_id)
    assert again.snapshot_id == snap.snapshot_id


def test_rollback_restores_schema_pointer(spark, table):
    good = table.current_snapshot().snapshot_id
    table.add_column("rating", "int")
    merge_into(
        table,
        lww_dedupe(
            spark.createDataFrame(
                [("a", 1, "I", 200, json.dumps({"text": "x", "rating": 5}))],
                "conv_id string, turn_idx int, op string, lsn long, after string",
            ).withColumns(
                {
                    "commit_ts": F.lit("2026-01-01 00:00:00").cast("timestamp"),
                    "src_file": F.lit("t"),
                    "src_offset": F.col("lsn"),
                }
            )
        ),
    )
    assert "rating" in [f.name for f in table.schema().fields]
    table.rollback(good)
    assert "rating" not in [f.name for f in table.schema().fields]
    # schema evolution composes on top of the restored pointer
    table.add_column("rating", "long")
    assert dict((f.name, f.dataType.simpleString()) for f in table.schema().fields)[
        "rating"
    ] == "bigint"


def test_rollback_across_rebucket_refused(spark, table):
    good = table.current_snapshot().snapshot_id
    table.rebucket(8)
    with pytest.raises(ValueError, match="rebucket"):
        table.rollback(good)
    # but rolling back to a post-rebucket snapshot is fine
    anchor = table.current_snapshot().snapshot_id
    merge_into(table, _batch(spark, [("d", 0, "I", "later")], lsn0=300))
    table.rollback(anchor)
    assert ("d", 0) not in _state(table.read_logical())


def test_rollback_then_merge_continues_normally(spark, table):
    good = table.current_snapshot().snapshot_id
    merge_into(table, _batch(spark, [("a", 0, "D", None)], lsn0=50))
    table.rollback(good)
    # new writes land on the restored state
    merge_into(table, _batch(spark, [("a", 0, "U", "v2")], lsn0=60))
    st = _state(table.read_logical())
    assert st[("a", 0)] == "v2"
    assert st[("b", 0)] == "w1"
