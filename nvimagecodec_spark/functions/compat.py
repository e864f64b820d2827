"""Cross-engine-deterministic numeric helpers.

Spark's ``round()`` converts doubles through BigDecimal-of-toString
(HALF_UP on the decimal *rendering*) while DuckDB rounds the raw binary
double — at representation boundaries (0.36365 stored as 0.36364999…)
they disagree. ``round4``/``round2`` use floor(x*scale + 0.5)/scale,
which both engines evaluate identically on identical doubles (all our
ratios are non-negative).

``ts_micros`` normalizes TIMESTAMP / TIMESTAMP_NTZ to unix microseconds
(bigint) — the only timestamp representation that crosses the
Spark↔DuckDB boundary without canonicalization drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def roundn(col: Column, n: int = 4) -> Column:
    scale = 10 ** n
    return F.floor(col * scale + F.lit(0.5)) / F.lit(float(scale))


def round4(col: Column) -> Column:
    return roundn(col, 4)


def round2(col: Column) -> Column:
    return roundn(col, 2)


def sql_roundn(expr: str, n: int = 4) -> str:
    scale = 10 ** n
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale}.0)"


def ts_micros(col: Column) -> Column:
    return F.unix_micros(col.cast("timestamp"))
