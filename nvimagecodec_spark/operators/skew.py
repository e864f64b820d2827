"""Hot-key detection + salting (SURVEY §2.5 G1, §7.1 M3).

Reference analog: ``sortSamples`` orders the batch cost-descending so the
most expensive items (large images) can't become stragglers
(/root/reference/src/image_generic_decoder.cpp:100-148). Our skew unit is
the hot ``conv_id``: a Zipf head key receiving ~10% of an epoch's events
would serialize the dedupe shuffle into one reducer.

Strategy: a cheap pre-pass counts events per key (itself map-side
combinable), keys above threshold get a salt in [0, salt_buckets);
phase-1 LWW runs per (key, salt) — spreading the hot key over
salt_buckets reducers — then phase-2 LWW over the tiny per-salt winners
restores exact semantics (LWW max is associative, so two-phase = one-phase).

Note Spark's AQE covers *join* skew, not *aggregation* skew — this is the
piece that needs custom code (SURVEY §4 short list, item 2).

MEASURED CAVEAT (local[32], 10M events, 50% on one key): the engine's
default LWW is a map-side-combinable ``max(struct)``, which already
collapses a hot key to one row per map partition before the shuffle —
plain dedupe 1.2s vs salted 3.6s (the salt's second shuffle strictly
loses). Salting therefore only pays for NON-combinable formulations
(``row_number`` windows, ``collect_list``-style aggs) where every hot-key
row really does land on one reducer; the engine keeps hot-key DETECTION
always-on for lineage/monitoring and gates the salted path behind
``EngineConfig.salt_non_combinable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nvimagecodec_spark.operators.lww import KEY_COLS, ORDER_COLS, lww_dedupe


def hot_keys(df: DataFrame, key_cols: list[str] | None = None, threshold: int = 10_000) -> DataFrame:
    """Keys whose event count in `df` exceeds `threshold` (partial-agg count)."""
    key_cols = key_cols or KEY_COLS
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") > threshold)
    )


def with_salt(df: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Uniform random-ish salt derived from per-row lineage (deterministic)."""
    return df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("src_file"), F.col("src_offset")), F.lit(salt_buckets)).cast("int"),
    )


def lww_dedupe_salted(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase LWW: per-(key, salt) partial winners, then global winners.

    Exactness: max over a key's events = max over {max per salt bucket}.
    Used when an epoch's hot-key stats cross EngineConfig.hot_key_threshold;
    for uniform batches plain lww_dedupe already gets map-side combine and
    the extra shuffle stage isn't worth it.
    """
    key_cols = key_cols or KEY_COLS
    order_cols = order_cols or ORDER_COLS
    salted = with_salt(df, salt_buckets)
    phase1 = lww_dedupe(salted, key_cols=key_cols + ["_salt"], order_cols=order_cols)
    phase2 = lww_dedupe(phase1.drop("_salt"), key_cols=key_cols, order_cols=order_cols)
    return phase2


def lww_dedupe_window_salted(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted two-phase form of the NON-combinable window formulation —
    the case where salting actually wins (see module MEASURED CAVEAT).

    A ``row_number`` window partitions by key: every hot-key row lands on
    ONE reducer, which then sorts the whole hot partition. Phase 1 runs
    the window per (key, salt) — the hot key's sort spreads over
    salt_buckets reducers — and phase 2 resolves the per-salt winners
    with the tiny combinable max (exact: top-1 of a key = top-1 of its
    per-salt top-1s).

    MEASURED (tests/test_skew_bench.py, local[8], 12M rows, 70% on one
    key): plain window 2.4s vs salted 3.6s — at local parallelism even
    the non-combinable formulation loses to the salt's extra full
    shuffle, because a single reducer's O(h log h) sort is comparable to
    one shuffle pass. This operator is the tool for the regime local
    boxes can't reach: hot partitions bigger than a reducer's memory
    (spill thrash) or clusters wide enough that one straggling sort
    idles them."""
    from nvimagecodec_spark.operators.lww import lww_dedupe_window

    key_cols = key_cols or KEY_COLS
    order_cols = order_cols or ORDER_COLS
    salted = with_salt(df, salt_buckets)
    phase1 = lww_dedupe_window(salted, key_cols=key_cols + ["_salt"], order_cols=order_cols)
    phase2 = lww_dedupe(phase1.drop("_salt"), key_cols=key_cols, order_cols=order_cols)
    return phase2
