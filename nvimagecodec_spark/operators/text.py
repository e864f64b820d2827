"""Text-analysis operators for training-data pipelines over `documents`.

All pure column expressions (whole-stage codegen; zero Python in the hot
path). Scale note: every operator here is embarrassingly parallel — a
narrow map over the scan with pushdown-friendly projections; at 100 TB the
only cost is the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nvimagecodec_spark.functions.compat import round4
from nvimagecodec_spark.functions.hashing import md5_fingerprint, md5_hash32, normalize_text

# fixed, engine-portable stopword list (english function words)
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(col), r"\s+")


# GPT-2-style BPE pre-tokenizer: contraction suffixes, letter runs, digit
# runs, punctuation runs — each optionally preceded by one space. This is
# the published GPT-2 pattern minus the `\s+(?!\S)` lookahead branch
# (RE2, DuckDB's engine, has no lookahead; dropping it only changes how
# trailing whitespace is grouped, which we don't count anyway) — verified
# to tokenize identically under Java regex (Spark) and RE2 (DuckDB).
BPE_PRETOKEN_PAT = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_pretokens(col: Column) -> Column:
    """BPE pre-tokenizer segmentation of lowercased text (the units a
    byte-pair-encoding tokenizer would merge within). A much better
    proxy for LLM token cost than whitespace words: punctuation and
    digit runs count, contractions split."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_PRETOKEN_PAT), 0)


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting + basic length stats per document: whitespace words
    AND BPE-ish pre-tokens (`bpe_per_word` ≈ tokens-per-word inflation, a
    standard budget estimator for training-data costing)."""
    t = tokens(F.col(text_col))
    bpe = F.size(bpe_pretokens(F.col(text_col)))
    return docs.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.length(F.col(text_col)).alias("n_chars_computed"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        round4(F.length(F.col(text_col)) / F.size(t)).alias("chars_per_token"),
        round4(bpe / F.greatest(F.size(t), F.lit(1))).alias("bpe_per_word"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality scoring: length, repetition, stopword ratio.

    Mirrors published quality-filter heuristics (C4/Gopher-style): documents
    that are too short, too repetitive, or with no function words are low
    quality. Integer/rounded outputs keep the oracle comparison exact.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    uniq = F.size(F.array_distinct(t))
    stop_hits = F.size(F.array_intersect(F.array_distinct(t), F.array(*[F.lit(w) for w in EN_STOPWORDS])))
    sw_ratio = stop_hits / F.greatest(uniq, F.lit(1))
    rep_ratio = uniq / F.greatest(n, F.lit(1))
    score = (
        F.when(n < 5, 0.0).otherwise(1.0)
        * round4(rep_ratio)
        * (F.lit(0.5) + F.lit(0.5) * round4(sw_ratio))
    )
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        round4(rep_ratio).alias("unique_ratio"),
        round4(sw_ratio).alias("stopword_ratio"),
        round4(score).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram-free heuristic language ID: english function-word hit rate.

    (The real engine would plug a fasttext-style model in as a pandas UDF;
    the heuristic keeps this oracle-checkable and dependency-free.)
    """
    t = F.array_distinct(tokens(F.lower(F.col(text_col))))
    hits = F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in EN_STOPWORDS])))
    ratio = hits / F.greatest(F.size(t), F.lit(1))
    return docs.select(
        F.col(id_col),
        F.col("lang").alias("lang_declared"),
        round4(ratio).alias("en_ratio"),
        F.when(ratio >= 0.02, "en").otherwise("other").alias("lang_pred"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 of normalized text + a 32-bit bucket hash."""
    norm = normalize_text(F.col(text_col))
    return docs.select(
        F.col(id_col),
        md5_fingerprint(norm).alias("fp_md5"),
        md5_hash32(norm, seed=0).alias("fp_h32"),
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): character classes + greedy bounded quantifiers only — no
# alternation or backtracking-order ambiguity, so leftmost-first (Java)
# and leftmost-longest (RE2) scans produce the same match sets.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{7,15}"


def pii_scan(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts (emails / IPv4 / international phone
    numbers) + a redaction flag — the pre-training compliance scan every
    large-scale text pipeline runs. Pure column expressions: one narrow
    map over the scan, no shuffle, no Python."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all(t, F.lit(PII_IP), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0)))
    return docs.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        ((n_emails + n_ips + n_phones) > 0).alias("has_pii"),
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per document, how many of its n-gram
    shingles appear in the benchmark corpus (train/test overlap — the
    check every published-eval pipeline must run before training).

    Scale shape: the benchmark side is tiny relative to the corpus
    (10^4-10^5 eval items vs 10^9 docs), so its DISTINCT shingle set
    BROADCASTS into the doc-shingle stream — candidate detection is a
    map-side semi-join with no shuffle of the corpus; only the per-doc
    hit counts (two ints per doc) aggregate."""
    from nvimagecodec_spark.operators.dedup import shingles

    doc_sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    bench_sh = (
        shingles(benchmark, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    # EVERY input doc appears in the report (advisor-caught): a document
    # with fewer than n tokens (or null text) yields zero shingles and was
    # absent from the output entirely — a compliance-style report must
    # distinguish 'clean' (evaluated, 0 hits) from 'never evaluated', so
    # shingle-less docs emit n_shingles=0, n_hits=0, overlap_ratio NULL,
    # contaminated=false.
    ids = docs.select(id_col).distinct()
    per_doc = ids.join(
        doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles")),
        id_col,
        "left",
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    # a shingle-less doc's raw n_shingles is NULL here, so the division
    # yields NULL — exactly the 'not evaluable' marker the report wants
    ratio = F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_shingles")
    return (
        per_doc.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            round4(ratio).alias("overlap_ratio"),
            F.coalesce(ratio >= threshold, F.lit(False)).alias("contaminated"),
        )
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition metrics (Gopher-style repetition filters):
    the fraction of word bigrams taken by the single most frequent bigram
    and the fraction of trigram occurrences that are duplicates. Documents
    dominated by a repeated phrase (boilerplate, SEO spam, scraper loops)
    score high on both and are filtered before training.

    Shape: n-grams are built as array expressions from the tokenized text
    (JVM-side `transform` over an index sequence — no Python), exploded,
    and counted per (doc, gram). One shuffle keyed by (doc, gram) — far
    finer than doc_id alone, so a single giant document cannot skew a
    task. Every input doc appears in the output: docs with fewer tokens
    than the n-gram width get zero counts and NULL ratios ('not
    evaluable', not 'clean' — same contract as `contamination`).

    Reference analog: ROI-overlap statistics computed per code stream
    before dispatch (/root/reference/src/image_generic_codec.h:687-708) —
    a cheap per-item statistic that gates which items continue down the
    pipeline.
    """

    def grams(width: int) -> Column:
        joined = F.expr(
            # sequence(0, size-width) is DESCENDING when size < width
            # (Spark generates down-counting sequences) — guard first
            f"transform(sequence(0, size(_toks) - {width}), "
            f"i -> concat_ws(' ', slice(_toks, i + 1, {width})))"
        )
        return F.when(F.size(F.col("_toks")) >= width, joined).otherwise(
            F.array().cast("array<string>")
        )

    def gram_counts(width: int, frac_expr):
        exploded = (
            docs.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_toks"))
            .select(F.col(id_col), F.explode(grams(width)).alias("gram"))
        )
        per_gram = exploded.groupBy(id_col, "gram").agg(
            F.count(F.lit(1)).alias("c")
        )
        return per_gram.groupBy(id_col).agg(*frac_expr)

    bi = gram_counts(
        2,
        [
            F.sum("c").alias("n_bigrams"),
            round4(F.max("c") / F.sum("c")).alias("top_bigram_frac"),
        ],
    )
    tri = gram_counts(
        3,
        [
            F.sum("c").alias("_n_tri"),
            # duplicate occurrences = total - distinct grams
            round4((F.sum("c") - F.count(F.lit(1))) / F.sum("c")).alias(
                "dup_trigram_frac"
            ),
        ],
    )
    return (
        docs.select(F.col(id_col))
        .join(bi, id_col, "left")
        .join(tri, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("top_bigram_frac"),
            F.col("dup_trigram_frac"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int | None = None,
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic keyword/topic
    extraction pass of a corpus pipeline.

    tf = term count within the doc; idf = ln(N / df) with df = number of
    docs containing the term. Deterministic ranking: score DESC, then
    term ASC (ties are common in short docs; an unordered tie would be
    partition-order-dependent). ``round_to`` rounds the score BEFORE
    ranking — two engines computing ln() a ulp apart would otherwise
    rank near-ties differently (needed whenever the output is compared
    across engines, e.g. the DuckDB oracle).

    Scale shape: one explode → ONE (doc, term) count agg (map-side
    combinable) → df via a second combinable agg over distinct docs per
    term (derived from the first agg's output, so the corpus is read
    once) → per-doc top-k window. N (corpus size) is a broadcast scalar
    via a 1-row cross join, not a driver collect.

    Reference analog: per-sample metadata extraction over a batch
    (/root/reference/extensions/nvtiff/metadata_extractor.cpp:317-466).
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.countDistinct(id_col).alias("_n")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf", F.col("tf") * F.log(F.col("_n") / F.col("df"))
        )
    )
    if round_to is not None:
        scored = scored.withColumn("tfidf", F.round("tfidf", round_to))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def unigram_logloss(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality proxy: per-document mean
    negative log-likelihood under the corpus's OWN unigram model
    (add-nothing MLE — every token in the corpus has mass). Documents
    made of globally rare tokens score high (gibberish/noise candidates);
    boilerplate made of the corpus's most common tokens scores low.
    The real CCNet uses a 5-gram KenLM; the unigram form is the same
    decision statistic computable exactly in SQL on both engines.

    Scale shape: one explode feeding (doc, term) counts, a tiny term →
    corpus-count model joined back (the model is vocabulary-sized), and
    one combinable per-doc sum. The corpus total is a broadcast scalar.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).where(F.col("term") != "")
    per_doc_term = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    model = per_doc_term.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = model.select(F.sum("ctf").alias("_total"))
    scored = (
        per_doc_term.join(model, "term")
        .crossJoin(F.broadcast(total))
        .withColumn("nll", -F.col("tf") * F.log(F.col("ctf") / F.col("_total")))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        (F.sum("nll") / F.sum("tf")).alias("mean_nll"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction: replace every email / IPv4 / phone match with a typed
    placeholder token — the step AFTER `pii_scan` in a compliance pipeline
    (scan reports, redact rewrites). Counts are taken BEFORE rewriting so
    the report reflects the original text.

    Replacement order is part of the contract (email → ip → phone), since a
    replacement can in principle change later matches; the DuckDB oracle
    applies the same order. Pure column expressions — one narrow map, the
    same engine-portable patterns as `pii_scan`.

    Reference analog: in-place sample rewriting during decode
    (/root/reference/src/image_generic_codec.h:687-708 ROI processing) — a
    per-item transform that must not change item count or ordering."""
    t = F.col(text_col)
    n_redactions = (
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
        + F.size(F.regexp_extract_all(t, F.lit(PII_IP), F.lit(0)))
        + F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0)))
    )
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IP, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        n_redactions.alias("n_redactions"),
        red.alias("text_redacted"),
    )


def chunk_tokens(
    docs: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows — the context-window
    chunking pass that precedes embedding or training-sequence creation.

    Chunk i covers tokens [i*stride+1, i*stride+chunk_size] (stride =
    chunk_size - overlap). A chunk is emitted only if it contributes at
    least one token beyond the previous chunk's coverage, so a short tail
    fully contained in its predecessor is never duplicated:
    n_chunks = 1 + floor(max(n_tokens - overlap - 1, 0) / stride).
    Docs with no tokens (null/blank text) emit zero chunks by design —
    chunking is a fan-out, not a report (contrast `contamination`).

    Scale shape: a pure narrow fan-out (explode over a computed index
    sequence; the token array is built once per doc) — no shuffle at all;
    output partitioning follows the scan. At 100 TB this is the cheapest
    possible shape: cost = scan + write.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    base = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            tokens(F.col(text_col)).alias("_toks"),
        )
        .withColumn(
            "_n_chunks",
            (
                F.lit(1)
                + F.floor(
                    F.greatest(F.size("_toks") - (overlap + 1), F.lit(0)) / stride
                )
            ).cast("int"),
        )
    )
    exploded = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.explode(F.expr("sequence(0, _n_chunks - 1)")).alias("chunk_idx"),
    )
    sl = F.expr(f"slice(_toks, chunk_idx * {stride} + 1, {chunk_size})")
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(sl).alias("n_chunk_tokens"),
        F.concat_ws(" ", sl).alias("chunk_text"),
    )
