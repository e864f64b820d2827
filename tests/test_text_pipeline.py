"""PII scan + benchmark decontamination (round-3 additions to the
training-data operator set). Semantics are oracle-checked in
test_entry_oracle.py; these pin the scale shapes and edge behavior."""

import pytest
from pyspark.sql import functions as F

from nvimagecodec_spark.operators import text as X


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "plain words only nothing sensitive here at all"),
        (1, "mail me at alice.smith+x@example.co.uk thanks"),
        (2, "server 192.168.10.255 and backup 10.0.0.1 are down"),
        (3, "call +4915112345678 or +14155550123 now"),
        (4, "a@b.io 1.2.3.4 +12345678 everything at once"),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scan_counts(spark, docs):
    got = {r["doc_id"]: r for r in X.pii_scan(docs).collect()}
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_phones"]) == (0, 0, 0)
    assert not got[0]["has_pii"]
    assert got[1]["n_emails"] == 1 and got[1]["has_pii"]
    assert got[2]["n_ips"] == 2
    assert got[3]["n_phones"] == 2
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (1, 1, 1)


def test_contamination_semantics(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with different words entirely"),
            (3, "quick brown fox jumps high today"),  # partial overlap w/ 1
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in X.contamination(corpus, bench, n=3).collect()}
    # doc 1 contains all 3 benchmark shingles; doc 3 shares 2; doc 2 none
    assert got[1]["n_hits"] == 3 and got[1]["contaminated"]
    assert got[3]["n_hits"] == 2 and got[3]["contaminated"]
    assert got[2]["n_hits"] == 0 and not got[2]["contaminated"]
    assert got[2]["overlap_ratio"] == 0.0


def test_contamination_reports_shingle_less_docs(spark):
    """Advisor-caught: a doc with fewer than n tokens (or null text) yields
    zero shingles and used to vanish from the report — callers could not
    distinguish 'clean' from 'never evaluated'. It must appear with
    n_shingles=0, n_hits=0, overlap_ratio NULL, contaminated=false."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "too short"),   # < n tokens → zero 3-gram shingles
            (3, None),          # null text
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in X.contamination(corpus, bench, n=3).collect()}
    assert set(got) == {1, 2, 3}  # every input doc is in the report
    for d in (2, 3):
        r = got[d]
        assert (r["n_shingles"], r["n_hits"]) == (0, 0)
        assert r["overlap_ratio"] is None and r["contaminated"] is False
    assert got[1]["contaminated"]  # evaluated docs unchanged


def test_contamination_benchmark_broadcasts(spark):
    """The corpus must never shuffle for candidate detection: the
    benchmark shingle set broadcasts (100 TB contract — only the per-doc
    counts aggregate)."""
    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = corpus.where(F.col("doc_id") < 3)
    df = X.contamination(corpus, bench, n=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert df.count() == 50


def test_repetition_stats_pins_semantics(spark):
    """Gopher-style repetition metrics on hand-computable docs, including
    the not-evaluable tiers: <2 tokens → no bigrams (NULL fracs), 2
    tokens → bigram but no trigram (NULL dup frac). NULL means 'never
    evaluated', zero means 'measured clean' — same contract as
    contamination."""
    docs = spark.createDataFrame(
        [
            (1, "one"),                    # no bigrams at all
            (2, "two words"),              # 1 bigram, no trigrams
            (3, "a a a a"),                # bigrams: 'a a' x3; trigrams: 'a a a' x2
            (4, None),                     # null text
            (5, "spam spam spam go spam spam spam"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in X.repetition_stats(docs).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert (got[1]["n_bigrams"], got[1]["top_bigram_frac"], got[1]["dup_trigram_frac"]) == (0, None, None)
    assert (got[2]["n_bigrams"], got[2]["top_bigram_frac"], got[2]["dup_trigram_frac"]) == (1, 1.0, None)
    assert (got[3]["n_bigrams"], got[3]["top_bigram_frac"], got[3]["dup_trigram_frac"]) == (3, 1.0, 0.5)
    assert (got[4]["n_bigrams"], got[4]["top_bigram_frac"]) == (0, None)
    # doc 5: 6 bigrams, 'spam spam' x4 → 4/6; 5 trigrams with 'spam spam spam'
    # twice → dup = (5 - 4)/5
    assert got[5]["n_bigrams"] == 6
    assert got[5]["top_bigram_frac"] == round(4 / 6, 4)
    assert got[5]["dup_trigram_frac"] == round(1 / 5, 4)


def test_bpe_pretokens_pins_segmentation(spark):
    """The BPE pre-tokenizer must segment like the published GPT-2
    pattern (contraction suffixes split, digit/punct runs are tokens,
    leading space glued): these exact splits were verified identical
    under DuckDB's RE2 — if this test starts failing after a pattern
    edit, the oracle WILL hash-mismatch."""
    rows = [
        (1, "it's 2026! e-mail@foo.bar"),
        (2, ""),
        (3, "   "),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", X.bpe_pretokens(F.col("text")).alias("toks")
        ).collect()
    }
    assert got[1] == ["it", "'s", " 2026", "!", " e", "-", "mail", "@", "foo", ".", "bar"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] is None


def test_token_stats_bpe_columns(spark):
    df = spark.createDataFrame(
        [(1, "don't panic"), (2, "word")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in X.token_stats(df).collect()}
    # "don't panic" → whitespace: 2 words; bpe: don|'t|' panic' → 3
    assert (got[1]["n_tokens"], got[1]["n_bpe_tokens"], got[1]["bpe_per_word"]) == (2, 3, 1.5)
    assert (got[2]["n_tokens"], got[2]["n_bpe_tokens"]) == (1, 1)


def test_tfidf_top_terms_planted(spark):
    """4-doc corpus with a hand-computable model: 'rare' appears in one
    doc (idf = ln 4), 'mid' in two (ln 2), 'common' in all (idf 0 —
    never a top term unless nothing else exists)."""
    import math

    rows = [
        (1, "common rare rare mid"),
        (2, "common mid"),
        (3, "common zeta"),
        (4, "common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["tfidf"])
        for r in X.tfidf_top_terms(df, top_k=2).collect()
    }
    assert got[(1, 1)][:2] == ("rare", 2)
    assert abs(got[(1, 1)][3] - 2 * math.log(4)) < 1e-9
    assert got[(1, 2)] == ("mid", 1, 2, pytest.approx(math.log(2)))
    # doc 4 has ONLY the zero-idf term; it still ranks (score 0)
    assert got[(4, 1)] == ("common", 1, 4, pytest.approx(0.0))
    # ties rank by term ascending, deterministically
    tie = spark.createDataFrame(
        [(1, "bb aa"), (2, "cc")], "doc_id long, text string"
    )
    t = {r["rank"]: r["term"] for r in X.tfidf_top_terms(tie, top_k=2).where("doc_id = 1").collect()}
    assert t == {1: "aa", 2: "bb"}


def test_unigram_logloss_rare_tokens_score_higher(spark):
    import math

    rows = [
        (1, "the the the the"),   # most common token only
        (2, "the weird"),         # half rare
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in X.unigram_logloss(df).collect()}
    # model: the=5/6, weird=1/6 over 6 tokens
    assert got[1]["n_tokens"] == 4
    assert got[1]["mean_nll"] == pytest.approx(-math.log(5 / 6))
    assert got[2]["mean_nll"] == pytest.approx(
        (-math.log(5 / 6) - math.log(1 / 6)) / 2
    )
    assert got[2]["mean_nll"] > got[1]["mean_nll"]


def test_redact_pii_rewrites_and_counts(spark, docs):
    got = {r["doc_id"]: r for r in X.redact_pii(docs).collect()}
    assert got[0]["n_redactions"] == 0
    assert got[0]["text_redacted"] == "plain words only nothing sensitive here at all"
    assert got[1]["n_redactions"] == 1
    assert "<EMAIL>" in got[1]["text_redacted"]
    assert "alice" not in got[1]["text_redacted"]
    assert got[2]["text_redacted"].count("<IP>") == 2
    assert got[3]["text_redacted"].count("<PHONE>") == 2
    assert got[4]["n_redactions"] == 3
    assert (
        got[4]["text_redacted"]
        == "<EMAIL> <IP> <PHONE> everything at once"
    )


def _chunks(spark, text, chunk_size=64, overlap=16):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        X.chunk_tokens(df, chunk_size=chunk_size, overlap=overlap)
        .orderBy("chunk_idx")
        .collect()
    )
    return rows


def test_chunk_tokens_single_chunk_boundary(spark):
    # exactly chunk_size tokens -> one chunk
    rows = _chunks(spark, " ".join(f"t{i}" for i in range(64)))
    assert len(rows) == 1 and rows[0]["n_chunk_tokens"] == 64


def test_chunk_tokens_tail_containment(spark):
    # 50 tokens with stride 48: a 2nd chunk would add NO new tokens
    # beyond chunk 0's 64-token coverage -> exactly one chunk
    rows = _chunks(spark, " ".join(f"t{i}" for i in range(50)))
    assert len(rows) == 1
    assert rows[0]["n_chunk_tokens"] == 50


def test_chunk_tokens_overlap_and_coverage(spark):
    toks = [f"t{i}" for i in range(100)]
    rows = _chunks(spark, " ".join(toks))
    assert len(rows) == 2
    c0, c1 = rows[0]["chunk_text"].split(" "), rows[1]["chunk_text"].split(" ")
    assert c0 == toks[0:64]
    assert c1 == toks[48:100]  # 16-token overlap with chunk 0
    # every token covered, in order
    assert c0 + c1[16:] == toks


def test_chunk_tokens_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "one two")],
        "doc_id long, text string",
    )
    rows = X.chunk_tokens(df).collect()
    assert {r["doc_id"] for r in rows} == {4}


def test_chunk_tokens_bad_overlap_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        X.chunk_tokens(df, chunk_size=8, overlap=8)
