"""Z-order (Morton-curve) clustering for multi-column file skipping.

The column-stats tier (`write.stat-cols` + ``read(range_filters=)``)
skips files whose per-file [min, max] box misses the predicate. With the
default key-sorted layout that box is only tight on the LEADING sort
column; a range filter on any other column reads every file. Z-ordering
sorts rows by the bit-interleaving of the clustered columns, so when a
bucket splits into several files (``write.max-records-per-file``) each
file covers a compact region of the multi-dimensional space — per-file
min/max becomes selective on EVERY clustered column at once. This is
Delta Lake's ``OPTIMIZE ZORDER BY`` / the classic UB-tree recipe,
rebuilt as pure Spark column expressions (shifts/masks — whole-stage
codegen, zero Python).

Scale shape: the z-value is a narrow map; computing it needs each
column's global [lo, hi], which is ONE tiny agg job (O(cols) scalars to
the driver, independent of row count). Clustering happens only in
maintenance rewrites (``compact(zorder_by=)`` / ``optimize(zorder_by=)``)
— the per-epoch merge hot path never pays for it.

Reference analog: tiled/ROI layout decisions made at encode time so
later partial reads touch only intersecting tiles
(/root/reference/include/nvimgcodec.h:564-574 region definitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits/column keeps the interleaved value inside a long for up to
# 4 columns and is far finer than any realistic file count per bucket
ZORDER_BITS = 16


def _as_double(df: DataFrame, col: str) -> Column:
    """Normalize a column to a double for range scaling. Timestamps map
    through unix micros (monotone); numerics cast directly."""
    dtype = dict(df.dtypes).get(col, "")
    c = F.col(col)
    if dtype.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if dtype == "date":
        return F.unix_date(c).cast("double")
    if dtype == "string":
        # strings cluster by their first 8 bytes' lexicographic value —
        # enough to make per-file ranges selective on prefixes
        return (
            F.coalesce(
                F.conv(F.substring(F.hex(F.encode(c, "UTF-8")), 1, 15), 16, 10).cast(
                    "double"
                ),
                F.lit(0.0),
            )
        )
    return c.cast("double")


def interleave_bits(scaled: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of pre-scaled non-negative longs in [0, 2^bits)."""
    n = len(scaled)
    acc = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("long")
            acc = acc + F.shiftleft(bit, i * n + j)
    return acc


def zvalue_expr(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS) -> Column:
    """Z-value expression over ``cols`` of ``df``.

    Runs one small agg job for the global [lo, hi] of each column (the
    scaling frame); nulls and constant columns map to 0 — they carry no
    clustering information but must not error or bias the interleave.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if len(cols) * bits > 62:
        raise ValueError(f"zorder of {len(cols)} cols x {bits} bits overflows a long")
    norm = [_as_double(df, c) for c in cols]
    aggs: list[Column] = []
    for i, e in enumerate(norm):
        aggs += [F.min(e).alias(f"lo{i}"), F.max(e).alias(f"hi{i}")]
    r = df.select(*aggs).first()
    levels = (1 << bits) - 1
    scaled: list[Column] = []
    for i, e in enumerate(norm):
        lo, hi = r[f"lo{i}"], r[f"hi{i}"]
        if lo is None or hi is None or not hi > lo:
            scaled.append(F.lit(0).cast("long"))
            continue
        s = F.floor((e - F.lit(float(lo))) * F.lit(float(levels)) / F.lit(float(hi) - float(lo)))
        s = F.least(F.greatest(s, F.lit(0)), F.lit(levels)).cast("long")
        scaled.append(F.coalesce(s, F.lit(0).cast("long")))
    return interleave_bits(scaled, bits)
