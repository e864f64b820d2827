"""Physical-plan inspection helpers — the engine's scale properties,
queryable.

The 100 TB story rests on plan SHAPES, not vibes: map-side partial
aggregation before the LWW shuffle, broadcast joins for small sides,
filter pushdown + column pruning into parquet scans, partition pruning on
cell/bucket layouts, and zero per-row Python UDFs. These helpers extract
those facts from a DataFrame so tests (tests/test_plans.py and friends)
and operators can assert them, and users can audit a query the same way.

Reference analog: the debug/metrics surface (SURVEY §2 U5) — the engine
exposes what it is about to execute, not just the result.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = [
    "plan_of",
    "optimized_plan",
    "has_broadcast_join",
    "has_sort_merge_join",
    "has_partial_agg",
    "partition_filters",
    "pushed_filters",
    "python_udf_count",
]


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (`df.explain(mode)` captured)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def optimized_plan(df: DataFrame) -> str:
    """Catalyst's optimized LOGICAL plan as text."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_of(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_of(df)


def has_partial_agg(df: DataFrame, fn: str = "max") -> bool:
    """True if the plan partial-aggregates map-side (combiner before the
    exchange) — the property that makes a hot key survivable."""
    return f"partial_{fn}" in plan_of(df)


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the scan ('' if none) — non-empty
    means directory-level pruning, zero I/O for unmatched partitions."""
    plan = plan_of(df)
    if "PartitionFilters" not in plan:
        return ""
    seg = plan.split("PartitionFilters:", 1)[1]
    return seg.split("]", 1)[0].strip(" [")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause of the scan ('' if none) — predicates
    evaluated inside the parquet reader, before rows materialize."""
    plan = plan_of(df)
    if "PushedFilters" not in plan:
        return ""
    seg = plan.split("PushedFilters:", 1)[1]
    return seg.split("]", 1)[0].strip(" [")


def python_udf_count(df: DataFrame) -> int:
    """Row-at-a-time Python UDF evaluations in the plan (BatchEvalPython).
    The package bans these in hot paths — Arrow-batched pandas UDFs show
    up as ArrowEvalPython / mapInPandas instead and don't count here."""
    return plan_of(df).count("BatchEvalPython")
