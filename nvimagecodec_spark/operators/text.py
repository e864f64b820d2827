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
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.split(F.trim(col), r"\s+")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting + basic length stats per document."""
    t = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_computed"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        round4(F.length(F.col(text_col)) / F.size(t)).alias("chars_per_token"),
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
