"""Deterministic sampling/splitting: selection must be a pure function
of (id, seed) — invariant to partitioning, row order, and reruns — and
hash_split must label every row exactly once."""

import pytest
from pyspark.sql import functions as F

from nvimagecodec_spark.operators.sampling import (
    hash_split,
    hex_threshold,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.01"


def test_sample_invariant_to_partitioning(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = {"en": 0.5, "de": 0.1}
    a = {r["doc_id"] for r in stratified_sample(docs, rates).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(17, "source"), rates)
        .select("doc_id")
        .collect()
    }
    assert a == b and a  # same rows, and non-empty
    # a different seed selects a different (overlapping) set
    c = {r["doc_id"] for r in stratified_sample(docs, rates, seed=8).select("doc_id").collect()}
    assert c != a


def test_sample_rates_roughly_honored(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = (
        stratified_sample(docs, {"en": 0.5}, default_rate=0.0)
        .groupBy("lang")
        .count()
        .collect()
    )
    by_lang = {r["lang"]: r["count"] for r in out}
    assert set(by_lang) == {"en"}  # default 0 drops every other stratum
    n_en = docs.where(F.col("lang") == "en").count()
    assert 0.3 * n_en < by_lang["en"] < 0.7 * n_en  # 32-bit Bernoulli @ 0.5


def test_split_disjoint_exhaustive_stable(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(docs, w).select("doc_id", "split")
    rows = out.collect()
    assert len(rows) == docs.count()  # exhaustive, one label per row
    again = {r["doc_id"]: r["split"] for r in hash_split(docs.repartition(13), w).select("doc_id", "split").collect()}
    assert {r["doc_id"]: r["split"] for r in rows} == again
    counts = out.groupBy("split").count().collect()
    got = {r["split"]: r["count"] for r in counts}
    assert set(got) == {"train", "val", "test"}
    assert got["train"] > got["val"] and got["train"] > got["test"]


def test_split_weights_must_sum_to_one(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"train": 0.5, "val": 0.1})


def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) == "g"  # sorts above every hex digit
    assert hex_threshold(0.5) == "80000000"
    # monotone
    assert hex_threshold(0.1) < hex_threshold(0.2) < hex_threshold(0.99) < "g"


# ------------------------------------------------------- token_budget_sample

def _naive_budget(spark_rows, budget, by_group=True):
    """Reference: global hash-order prefix per group (driver replay)."""
    import hashlib

    def draw(doc_id):
        return hashlib.md5(f"{doc_id}:7".encode()).hexdigest()[:8]

    sel = set()
    groups = {}
    for r in spark_rows:
        groups.setdefault(r["lang"] if by_group else "all", []).append(r)
    for g, rows in groups.items():
        run = 0
        for r in sorted(rows, key=lambda r: (draw(r["doc_id"]), r["doc_id"])):
            cost = r["n_chars"] or 0
            if run + cost > budget:
                break
            run += cost
            sel.add(r["doc_id"])
    return sel


@pytest.mark.parametrize("budget", [0, 1, 5_000, 40_000, 10**12])
def test_token_budget_prefix_matches_naive(spark, budget):
    from nvimagecodec_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = docs.select("doc_id", "lang", "n_chars").collect()
    got = {
        r["doc_id"]
        for r in token_budget_sample(
            docs, budget, tokens_col="n_chars", group_col="lang"
        ).collect()
    }
    assert got == _naive_budget(rows, budget)


def test_token_budget_invariant_to_partitioning_and_band_width(spark):
    from nvimagecodec_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {
        r["doc_id"]
        for r in token_budget_sample(docs, 30_000, "n_chars", "lang").collect()
    }
    b = {
        r["doc_id"]
        for r in token_budget_sample(
            docs.repartition(13, "source"), 30_000, "n_chars", "lang", band_chars=1
        ).collect()
    }
    assert a == b and a


def test_token_budget_global_group_and_null_cost(spark):
    from nvimagecodec_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None)).otherwise(F.col("n_chars")),
    )
    rows = docs.select("doc_id", "lang", "n_chars").collect()
    got = {
        r["doc_id"]
        for r in token_budget_sample(docs, 20_000, tokens_col="n_chars").collect()
    }
    assert got == _naive_budget(rows, 20_000, by_group=False)
    # null-cost docs that land inside the prefix are kept for free
    assert any(d % 11 == 0 for d in got)
