"""asof_join semantics: nearest prior match, inclusive ties, left rows
without a match keep nulls."""

import pyspark.sql.functions as F

from nvimagecodec_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("k1", "2025-01-01 10:00:00", "e1"),
            ("k1", "2025-01-01 12:00:00", "e2"),
            ("k1", "2025-01-01 09:00:00", "e0"),  # before any right row
            ("k2", "2025-01-01 10:00:00", "e3"),  # key with no right rows
        ],
        "k string, t string, ev string",
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [
            ("k1", "2025-01-01 10:00:00", 100),  # tie with e1: inclusive
            ("k1", "2025-01-01 11:30:00", 200),
            ("k1", "2025-01-01 13:00:00", 300),  # after everything
        ],
        "k string, rt string, val int",
    ).withColumn("rt", F.to_timestamp("rt"))

    out = {
        r["ev"]: r["val"]
        for r in asof_join(left, right, key="k", left_time="t", right_time="rt").collect()
    }
    assert out["e0"] is None  # no right row at or before 09:00
    assert out["e1"] == 100  # inclusive: right row AT left time matches
    assert out["e2"] == 200  # nearest prior, not latest overall
    assert out["e3"] is None  # key never seen on the right


def test_asof_join_multi_key_and_suffix(spark):
    left = spark.createDataFrame(
        [("a", 1, "2025-01-01 10:00:00", "x")], "k1 string, k2 int, t string, ev string"
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [("a", 1, "2025-01-01 09:00:00", 7), ("a", 2, "2025-01-01 09:30:00", 9)],
        "k1 string, k2 int, rt string, val int",
    ).withColumn("rt", F.to_timestamp("rt"))
    rows = asof_join(
        left, right, key=["k1", "k2"], left_time="t", right_time="rt", suffix="_r"
    ).collect()
    assert len(rows) == 1 and rows[0]["val_r"] == 7  # (a,2) row never considered
