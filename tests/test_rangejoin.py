"""Banded interval join: BETWEEN semantics through an equi-join plan."""

import pytest
from pyspark.sql import functions as F

from nvimagecodec_spark.operators.rangejoin import interval_join
from nvimagecodec_spark.plans import plan_of


def _pairs(out, lid="lid", rid="rid"):
    return sorted((r[lid], r[rid]) for r in out.select(lid, rid).collect())


def _l(spark, pts):
    return spark.createDataFrame([(i, p) for i, p in pts], "lid int, p long")


def _r(spark, ivals):
    return spark.createDataFrame(
        [(i, s, e) for i, s, e in ivals], "rid int, s long, e long"
    )


def test_between_inclusive_both_ends(spark):
    out = interval_join(
        _l(spark, [(0, 9), (1, 10), (2, 15), (3, 20), (4, 21)]),
        _r(spark, [(0, 10, 20)]),
        "p", "s", "e", bucket_width=7,
    )
    assert _pairs(out) == [(1, 0), (2, 0), (3, 0)]


def test_overlapping_intervals_match_independently(spark):
    out = interval_join(
        _l(spark, [(0, 5)]),
        _r(spark, [(0, 0, 10), (1, 5, 5), (2, 6, 20)]),
        "p", "s", "e", bucket_width=4,
    )
    assert _pairs(out) == [(0, 0), (0, 1)]


def test_interval_spanning_many_buckets(spark):
    # interval length 100 with W=3 → explodes to ~35 bucket rows; every
    # in-range point must still match exactly once
    out = interval_join(
        _l(spark, [(i, i * 10) for i in range(12)]),
        _r(spark, [(0, 0, 100)]),
        "p", "s", "e", bucket_width=3,
    )
    assert _pairs(out) == [(i, 0) for i in range(11)]


def test_negative_domain_floor_div(spark):
    # points below zero: truncating division would misbucket -1 vs -W-1
    out = interval_join(
        _l(spark, [(0, -15), (1, -10), (2, -1), (3, 0), (4, 4)]),
        _r(spark, [(0, -10, 0)]),
        "p", "s", "e", bucket_width=8,
    )
    assert _pairs(out) == [(1, 0), (2, 0), (3, 0)]


def test_null_and_inverted_intervals_never_match(spark):
    out = interval_join(
        _l(spark, [(0, 5), (1, None)]),
        _r(spark, [(0, 1, 9), (1, 9, 1), (2, None, 9), (3, 1, None)]),
        "p", "s", "e", bucket_width=4,
    )
    assert _pairs(out) == [(0, 0)]


def test_equality_keys_restrict_matches(spark):
    left = spark.createDataFrame(
        [(0, "a", 5), (1, "b", 5)], "lid int, k string, p long"
    )
    right = spark.createDataFrame([(0, "a", 0, 10)], "rid int, k string, s long, e long")
    out = interval_join(left, right, "p", "s", "e", bucket_width=4, on="k")
    assert _pairs(out) == [(0, 0)]


def test_timestamp_columns_compare_as_micros(spark):
    left = spark.createDataFrame(
        [(0, "2024-01-01 00:00:30"), (1, "2024-01-01 02:00:00")],
        "lid int, p string",
    ).withColumn("p", F.col("p").cast("timestamp"))
    right = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", "2024-01-01 01:00:00")], "rid int, s string, e string"
    ).withColumns({"s": F.col("s").cast("timestamp"), "e": F.col("e").cast("timestamp")})
    out = interval_join(
        left, right, "p", "s", "e", bucket_width=3600 * 1_000_000
    )
    assert _pairs(out) == [(0, 0)]


def test_column_clash_raises_and_suffix_resolves(spark):
    left = _l(spark, [(0, 5)]).withColumnRenamed("lid", "id")
    right = _r(spark, [(0, 0, 9)]).withColumnRenamed("rid", "id")
    with pytest.raises(ValueError, match="duplicate"):
        interval_join(left, right, "p", "s", "e", bucket_width=4)
    out = interval_join(left, right, "p", "s", "e", bucket_width=4, suffix="_r")
    assert out.columns == ["id", "p", "id_r", "s_r", "e_r"]
    assert _pairs(out, "id", "id_r") == [(0, 0)]


def test_plan_is_equi_join_not_nested_loop(spark):
    out = interval_join(
        _l(spark, [(0, 5)]), _r(spark, [(0, 0, 9)]), "p", "s", "e", bucket_width=4
    )
    plan = plan_of(out, mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the banding must reach the join as an equality key
    assert "Join" in plan or "join" in plan
