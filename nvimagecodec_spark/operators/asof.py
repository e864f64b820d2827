"""As-of (nearest-prior) join — a classic temporal operator Spark lacks
as a built-in, expressed as a composition of existing DataFrame ops.

Semantics: for each left row, attach the right row with the same key and
the greatest ``right_time <= left_time`` (LEFT-join behavior: unmatched
left rows keep nulls).

Scale design — union + running ``last(ignorenulls)`` window instead of a
range join: a naive ``left.join(right, key AND r.t <= l.t)`` explodes to
|matches| pairs before the per-key top-1 filter; the union formulation
shuffles each row exactly once on the key and carries the latest right
payload forward in a single ordered pass per key partition. Right rows
sort before left rows on time ties, matching the inclusive ``<=``.

Reference analog: metadata-to-sample association walks the latest parsed
state at a given stream offset (lazy parse + per-offset views,
/root/reference/src/code_stream.cpp:47-95,201).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: latest ``right`` row per key with
    ``right_time <= left_time``. ``right_cols`` defaults to all non-key,
    non-time columns of ``right``; they are appended (optionally suffixed)
    to every left row."""
    keys = [key] if isinstance(key, str) else list(key)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_time
    ]
    clashes = [c for c in right_cols if c + suffix in left.columns]
    if clashes:
        raise ValueError(
            f"asof_join output would duplicate column(s) {clashes}; "
            f"pass suffix= (e.g. '_right') or narrow right_cols"
        )

    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols]).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    # right rows first on time ties => inclusive right_time <= left_time;
    # ties BETWEEN right rows at the same (key, right_time) break on the
    # payload struct itself so the winner is deterministic, not
    # partition-order-dependent (struct ordering is field-wise)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_is_right").desc(), F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out_left = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"_match.{c}").alias(c + suffix) for c in right_cols]
    return carried.where(F.col("_is_right") == 0).select(*out_left, *out_right)
