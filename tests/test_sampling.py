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
