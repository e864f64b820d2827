"""Deterministic sampling & splitting for training-data pipelines.

A 100-TB corpus is never trained on whole: pipelines draw per-stratum
samples (language/source mixes) and carve train/val/test splits. Both
must be DETERMINISTIC — re-running the pipeline, or running it on two
clusters, must select the same rows (seeded RNG sampling is partition-
order-dependent in any distributed engine; hash-based selection is not).

Mechanism: the first 8 hex chars of ``md5(id || ':' || seed)`` are a
uniform 32-bit draw; a row is kept iff that hex string is
lexicographically below ``hex_threshold(rate)``. Fixed-width lowercase
hex compares identically to its numeric value, and md5 is bit-identical
across Spark, DuckDB and Python — so the oracle replicates selection
exactly, and the same row set is chosen at any scale, partitioning, or
engine.

Scale shape: both operators are pure narrow column maps — NO shuffle, no
Python, nothing driver-side; they fuse into whatever scan precedes them
and reduce downstream volume by the sample rate.

Reference analog: deterministic sub-stream selection — a sub-code-stream
view selects a byte range of the container without touching the rest
(/root/reference/include/nvimgcodec.h:601-612).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hex_threshold(rate: float) -> str:
    """8-hex-char cutoff such that P[draw < cutoff] == rate (32-bit
    granularity). ``"g"`` is the ≥1.0 sentinel: every hex digit sorts
    below 'g', so comparison keeps all rows."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "00000000"
    return format(int(rate * 2**32), "08x")


def _draw(id_col: str, seed: int) -> Column:
    return F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))), 1, 8
    )


def draw_sql(id_col: str, seed: int) -> str:
    """DuckDB expression computing the identical 32-bit hex draw —
    exported so oracle SQL is composed from the same definition."""
    return f"substr(md5(CAST({id_col} AS VARCHAR) || ':{seed}'), 1, 8)"


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 7,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep each row of
    stratum s with probability ``rates[s]`` (``default_rate`` for
    unlisted strata), selected by id hash — the training-mix primitive
    (e.g. keep 50% of English, 10% of everything else)."""
    thresh = F.lit(hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(hex_threshold(rate))
        ).otherwise(thresh)
    return df.where(_draw(id_col, seed) < thresh)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 7,
    split_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive, deterministic split assignment (e.g.
    train/val/test): the [0,1) hash line is cut at the cumulative
    weights, insertion order of ``weights`` fixes the segment order.
    Every row gets exactly one label; the same id always lands in the
    same split, on any cluster."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    draw = _draw(id_col, seed)
    names = list(weights)
    # forward WHEN chain: the FIRST matching cutoff wins, so each label
    # owns exactly [prev_cum, cum) of the hash line; the last segment
    # absorbs the rounding tail
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = draw < F.lit(hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    return df.withColumn(split_col, expr)


def split_case_sql(
    weights: dict[str, float], id_col: str = "doc_id", seed: int = 7
) -> str:
    """DuckDB CASE expression mirroring ``hash_split`` label assignment."""
    draw = draw_sql(id_col, seed)
    names = list(weights)
    cum = 0.0
    parts = ["CASE"]
    for name in names[:-1]:
        cum += weights[name]
        parts.append(f"WHEN {draw} < '{hex_threshold(cum)}' THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)


def token_budget_sample(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    group_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 7,
    band_chars: int = 2,
) -> DataFrame:
    """Deterministic PREFIX sample up to a token budget (per group):
    order docs by their md5 draw, take them while the running token
    total stays ≤ ``budget``; the first overflowing doc and everything
    after it are dropped. This is how a training run takes "exactly 2B
    tokens of code, 500M of forums" out of a 100-TB corpus — Bernoulli
    rates only hit a budget in expectation; the prefix hits it exactly,
    and the hash order makes the chosen set independent of partitioning.

    Scale shape — the naive formulation is a running-sum window over
    every row, which serializes each group into one task (a 10-TB
    'web' domain = one sort on one executor). Instead:

    1. Band each row by the first ``band_chars`` hex chars of its draw
       (256 bands): fixed-width hex sorts numerically, so bands are
       contiguous slices of the global hash order.
    2. ONE combinable groupBy builds the (group, band) token histogram
       — ≤ 256 rows per group — and a window over that tiny frame
       classifies each band: fully inside the budget, fully beyond it,
       or the single CUTOFF band where the budget crosses.
    3. The histogram broadcast-joins back: full bands pass with no
       sort at all, dropped bands vanish, and only the cutoff band
       (~1/256 of the group) pays the exact running-sum window.

    Null token counts cost 0 (kept for free). Ties in the 32-bit draw
    break on ``id_col``. Reference analog: bounded batch admission —
    items admitted in arrival order until the batch budget is reached
    (/root/reference/src/image_generic_codec.h:1018-1049 batch sizing).
    """
    from pyspark.sql.window import Window

    grp = group_col or "_tbs_all"
    reserved = {"_tbs_draw", "_tbs_band", "_bsum", "_before", "_cls", "_run"} | (
        {grp} if group_col is None else set()
    )
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"input columns {clash} collide with helper names")
    out_cols = [F.col(c) for c in df.columns]
    base = df
    if group_col is None:
        base = base.withColumn(grp, F.lit("all"))
    draw = _draw(id_col, seed)
    toks = F.coalesce(F.col(tokens_col), F.lit(0)).cast("long")
    base = base.withColumn("_tbs_draw", draw).withColumn(
        "_tbs_band", F.substring(draw, 1, band_chars)
    )
    hist = base.groupBy(grp, "_tbs_band").agg(F.sum(toks).alias("_bsum"))
    wb = (
        Window.partitionBy(grp)
        .orderBy("_tbs_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn(
        "_before", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
    ).select(
        grp,
        "_tbs_band",
        "_before",
        F.when(F.col("_before") + F.col("_bsum") <= budget, F.lit("full"))
        .when(F.col("_before") >= budget, F.lit("drop"))
        .otherwise(F.lit("cut"))
        .alias("_cls"),
    )
    tagged = base.join(F.broadcast(hist), [grp, "_tbs_band"])
    full = tagged.where(F.col("_cls") == "full")
    wr = (
        Window.partitionBy(grp)
        .orderBy("_tbs_draw", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cut = (
        tagged.where(F.col("_cls") == "cut")
        .withColumn("_run", F.col("_before") + F.sum(toks).over(wr))
        .where(F.col("_run") <= budget)
    )
    return full.select(*out_cols).unionByName(cut.select(*out_cols))


def domain_mixture(
    df: DataFrame,
    domain_col: str = "source",
    alpha: float = 0.5,
    weight: Column | None = None,
) -> DataFrame:
    """Temperature-reweighted domain mixture — the standard multi-domain
    training-mix recipe (sample domain d with probability ∝ mass_d^alpha,
    alpha<1 upweights small domains; alpha=1 is proportional sampling).

    ``weight`` is the per-row mass (default: whitespace token count of
    ``text``). Output per domain: n_docs, n_tokens, raw_share,
    temp_share, and the sampling ``multiplier`` (temp/raw — the factor a
    per-domain sampler applies to proportional rates).

    Scale shape: ONE map-side-combinable groupBy on the domain — the
    shares are windows over the *aggregated* frame, whose cardinality is
    the number of domains (tiny by construction), so the unpartitioned
    window is driver-safe at any corpus size.
    """
    from nvimagecodec_spark.functions.compat import round4
    from pyspark.sql.window import Window

    if weight is None:
        weight = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    per = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight).alias("n_tokens"),
    )
    w = Window.partitionBy()
    pw = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    raw_share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    temp_share = pw / F.sum(pw).over(w)
    return per.select(
        F.col(domain_col),
        "n_docs",
        "n_tokens",
        round4(raw_share).alias("raw_share"),
        round4(temp_share).alias("temp_share"),
        round4(temp_share / raw_share).alias("multiplier"),
    )
