"""Apply-time CHECK constraints (operators/validate.py + engine wiring).

Pinned semantics: ANSI CHECK (NULL passes, only explicit FALSE rejects),
deletes bypass payload checks, a withheld winner leaves the table's
current value untouched, violations carry ALL failed rule names, and the
engine sink is exactly-once per (source_id, batch_id).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.config import EngineConfig
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into
from nvimagecodec_spark.operators.validate import validate_batch

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

RULES = {
    "score_nonneg": "score >= 0",
    "role_known": "role IN ('user', 'assistant')",
}


def _batch(spark, rows, lsn0=0):
    data = [
        (c, t, op, lsn0 + i, json.dumps(after) if after is not None else None)
        for i, (c, t, op, after) in enumerate(rows)
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


@pytest.fixture()
def table(spark, tmp_dir):
    return LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )


def test_split_semantics(spark, table):
    batch = _batch(
        spark,
        [
            ("a", 0, "I", {"role": "user", "score": 1.0}),          # passes
            ("a", 1, "I", {"role": "robot", "score": -2.0}),        # fails BOTH
            ("a", 2, "I", {"role": "assistant", "score": -0.5}),    # fails one
            ("a", 3, "I", {"role": None, "score": None}),           # NULLs pass
            ("a", 4, "D", None),                                    # delete bypasses
        ],
    )
    ok, bad = validate_batch(table, batch, RULES)
    assert {r.turn_idx for r in ok.collect()} == {0, 3, 4}
    viol = {r.turn_idx: sorted(r.violated) for r in bad.collect()}
    assert viol == {1: ["role_known", "score_nonneg"], 2: ["score_nonneg"]}
    # passing batch keeps the exact input columns (merge contract)
    assert ok.columns == batch.columns


def test_withheld_winner_keeps_table_value(spark, table):
    merge_into(table, _batch(spark, [("a", 0, "I", {"role": "user", "score": 1.0})]))
    batch = _batch(spark, [("a", 0, "U", {"role": "user", "score": -9.0})], lsn0=100)
    ok, bad = validate_batch(table, batch, RULES)
    merge_into(table, ok)
    row = table.read_logical().collect()[0]
    assert row.score == 1.0  # stale value kept, not clobbered or deleted
    assert bad.count() == 1


def test_empty_rules_passthrough(spark, table):
    batch = _batch(spark, [("a", 0, "I", {"role": "x", "score": -1.0})])
    ok, bad = validate_batch(table, batch, {})
    assert ok.count() == 1 and bad.count() == 0
    assert "violated" in bad.columns


def test_engine_epoch_routes_violations(spark, tmp_dir, table):
    from nvimagecodec_spark.streaming.engine import CdcEngine

    sink = os.path.join(tmp_dir, "violations")
    eng = CdcEngine(
        spark,
        table,
        source_id="gate",
        config=EngineConfig(
            constraints=RULES, constraint_violation_dir=sink, expire_every_epochs=0
        ),
    )
    events = (
        _batch(
            spark,
            [
                ("a", 0, "I", {"role": "user", "score": 1.0}),
                ("a", 1, "I", {"role": "robot", "score": 2.0}),
            ],
        )
        .withColumn("src_format", F.lit("jsonl"))
    )
    eng.apply_epoch(events, batch_id=1)
    assert {r.turn_idx for r in table.read_logical().collect()} == {0}
    rec = eng.lineage()[-1]
    assert rec["constraint_violations"] == 1
    sunk = spark.read.parquet(sink)
    rows = sunk.collect()
    assert len(rows) == 1 and rows[0].violated == ["role_known"]
    assert rows[0].batch_id == 1
    # replaying the same epoch is a tagged no-op: the sink is not duplicated
    eng.apply_epoch(events, batch_id=1)
    assert spark.read.parquet(sink).count() == 1


def test_envelope_collision_raises(spark, tmp_dir):
    clash = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("op", T.StringType()),  # collides with envelope
        ]
    )
    t = LakeTable.create(spark, os.path.join(tmp_dir, "c"), clash, ["conv_id"])
    b = _batch(spark, [("a", 0, "I", {"role": "user", "score": 0.0})])
    with pytest.raises(ValueError, match="collide"):
        validate_batch(t, b.drop("turn_idx"), {"r": "op = 'x'"})
