"""Chained engines: table A's snapshot-diff changelog replayed into table
B must reproduce A's logical state exactly — proving read_changes emits a
complete, correctly-ordered change stream (the export half of CDC)."""

import pyspark.sql.functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.incremental import read_changes
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
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


def _changes_to_events(changes):
    """read_changes output → CHANGE_SCHEMA-shaped events for merge_into."""
    return changes.select(
        "op",
        "conv_id",
        "turn_idx",
        "lsn",
        "commit_ts",
        F.lit("chained").alias("src_file"),
        F.col("lsn").alias("src_offset"),
        F.when(
            F.col("op") != "D",
            F.to_json(F.struct("role", "text")),
        ).alias("after"),
    )


def test_changelog_replay_reproduces_state(spark, tmp_path):
    a = LakeTable.create(spark, str(tmp_path / "a"), SCHEMA, ["conv_id", "turn_idx"], 8)
    b = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["conv_id", "turn_idx"], 8)
    base = a.current_snapshot().snapshot_id

    # epoch 1 on A: inserts
    merge_into(
        a,
        lww_dedupe(
            _events(
                spark,
                [
                    ("I", "c1", 0, 1, "2025-01-01 00:00:00", "f", 0, '{"role":"user","text":"a"}'),
                    ("I", "c1", 1, 2, "2025-01-01 00:00:01", "f", 1, '{"role":"assistant","text":"b"}'),
                    ("I", "c2", 0, 3, "2025-01-01 00:00:02", "f", 2, '{"role":"user","text":"c"}'),
                ],
            )
        ),
    )
    s1 = a.current_snapshot().snapshot_id
    # epoch 2 on A: update + delete + insert
    merge_into(
        a,
        lww_dedupe(
            _events(
                spark,
                [
                    ("U", "c1", 0, 10, "2025-01-01 01:00:00", "g", 0, '{"role":"user","text":"a2"}'),
                    ("D", "c2", 0, 11, "2025-01-01 01:00:01", "g", 1, None),
                    ("I", "c3", 0, 12, "2025-01-01 01:00:02", "g", 2, '{"role":"tool","text":"d"}'),
                ],
            )
        ),
    )
    s2 = a.current_snapshot().snapshot_id

    # replay A's changelog epoch-by-epoch into B
    for lo, hi in [(base, s1), (s1, s2)]:
        ch = read_changes(a, lo, hi)
        merge_into(b, lww_dedupe(_changes_to_events(ch)))

    cols = ["conv_id", "turn_idx", "role", "text"]
    a_rows = sorted(tuple(r) for r in a.read_logical().select(*cols).collect())
    b_rows = sorted(tuple(r) for r in b.read_logical().select(*cols).collect())
    assert a_rows == b_rows and len(a_rows) == 3
