"""Sessionization over the events stream (gap-based session windows).

Batch formulation: lag + cumulative sum of gap breaks per user — the
standard Spark idiom. (Structured Streaming offers session windows
natively via ``F.session_window``; the batch form is what the oracle can
check.) One shuffle on user_id; the window is partition-local after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nvimagecodec_spark.functions.compat import ts_micros


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign session ids: (user, session_idx) with gap > gap_minutes."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    us = ts_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_sess = (
        F.when(prev_us.isNull(), 1)
        .when((us - prev_us) > gap_minutes * 60 * 1_000_000, 1)
        .otherwise(0)
    )
    return events.withColumn("session_idx", F.sum(new_sess).over(w))


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session summary: session count, events/session stats."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    per_session = s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        ts_micros(F.max(ts_col)).alias("_end"),
        ts_micros(F.min(ts_col)).alias("_start"),
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max(F.col("_end") - F.col("_start")).alias("max_session_us"),
    )
