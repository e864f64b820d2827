"""Banded interval (range) join — point-in-interval matching at scale.

Joins each left row whose ``point`` falls inside a right row's
``[start, end]`` interval (inclusive both ends, SQL ``BETWEEN``
semantics), optionally also requiring equality on shared keys.

Scale design — Spark plans a bare ``l.point BETWEEN r.start AND r.end``
join condition as BroadcastNestedLoopJoin (or a cartesian product when
neither side broadcasts): O(|L|·|R|) comparisons, a non-starter at
100 TB. This operator BANDS the domain instead:

- pick a bucket width W (>= the typical interval length),
- each interval explodes to the ``ceil(len/W) + 1`` buckets it touches
  (one row per covered bucket — 2 rows for intervals shorter than W),
- each point maps to exactly ONE bucket,
- the join becomes an equi-join on (bucket, keys...) — hash-shuffled,
  AQE-skew-splittable, whole-stage-codegen — followed by the exact
  ``BETWEEN`` filter that discards same-bucket non-overlaps.

Cost is |L| + |R|·(avg_len/W + 1) shuffled rows instead of |L|·|R|
compared pairs; W trades duplication of the interval side against
bucket selectivity.

Reference analog: region-of-interest decode — a sample participates in
work iff its coordinates fall inside the requested region's
[start, end] box (/root/reference/include/nvimgcodec.h:510-511,571).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _to_long(df: DataFrame, col: str) -> Column:
    """Timestamps compare as epoch micros; integral types pass through."""
    t = df.schema[col].dataType
    if isinstance(t, T.TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(t, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("long")
    return F.col(col).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    bucket_width: int,
    on: str | list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Inner join: left rows with ``point`` in ``[start, end]``.

    ``bucket_width`` is in the column's native unit — epoch MICROSECONDS
    for timestamp columns, days for dates, the raw value for integers.
    Rows with a null point/bound and inverted intervals (end < start)
    never match, exactly like SQL ``BETWEEN``. Output: every left column
    + every right column (right columns optionally ``suffix``-renamed;
    overlaps without a suffix raise).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = [on] if isinstance(on, str) else list(on or [])
    right_cols = [c for c in right.columns if c not in keys]
    clashes = [c for c in right_cols if c + suffix in left.columns]
    if clashes:
        raise ValueError(
            f"interval_join output would duplicate column(s) {clashes}; "
            f"pass suffix= (e.g. '_r') or rename"
        )

    w = F.lit(int(bucket_width))
    # floor-div (not `/` + floor) keeps the math exact for |values| > 2^53
    p_long = _to_long(left, point)
    s_long = _to_long(right, start)
    e_long = _to_long(right, end)

    l_b = left.withColumn("_bkt", _floor_div(p_long, w)).withColumn(
        "_p", p_long
    )
    r_b = (
        right.where(F.col(start).isNotNull() & F.col(end).isNotNull())
        .where(e_long >= s_long)
        .withColumn("_s", s_long)
        .withColumn("_e", e_long)
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(_floor_div(F.col("_s"), w), _floor_div(F.col("_e"), w))
            ),
        )
    )
    cond = [l_b["_bkt"] == r_b["_bkt"]] + [
        l_b[k].eqNullSafe(r_b[k]) for k in keys
    ]
    j = l_b.join(r_b, cond, "inner").where(
        (F.col("_p") >= F.col("_s")) & (F.col("_p") <= F.col("_e"))
    )
    out = [l_b[c].alias(c) for c in left.columns] + [
        r_b[c].alias(c + suffix) for c in right_cols
    ]
    return j.select(*out)


def _floor_div(c: Column, w: Column) -> Column:
    """Floor division that is correct for negative values too (Spark's
    ``div`` truncates toward zero; epoch values before 1970 are legal).
    The subtraction makes the numerator an exact multiple of ``w``, and
    the division runs in decimal so values past 2^53 don't round (same
    precision trap lsn_counts hit with `/` on byte-position LSNs)."""
    n = (c - ((c % w + w) % w)).cast("decimal(38,0)")
    return (n / w.cast("decimal(38,0)")).cast("long")
