"""Pure Structured Streaming operators over the change stream — the
always-on monitoring surface next to the foreachBatch apply loop.

- :func:`windowed_op_rates` — event-time tumbling-window op counts with a
  watermark bounding late-data state (SURVEY §2.8 T6: disorder resolved by
  event time, state bounded; reference analog: the per-iteration
  accounting log, /root/reference/src/image_generic_codec.h:923-930).
- :func:`conversation_progress` — a CUSTOM STATEFUL operator via
  ``applyInPandasWithState``: per-conversation running progress (events
  seen, max turn, last LSN) carried across micro-batches in the state
  store (reference analog: reusable batched state objects,
  /root/reference/src/decode_state_batch.cpp; SURVEY §2.5 G12).

Both consume the same parsed CHANGE_SCHEMA stream the apply path uses —
one parser, many consumers.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from nvimagecodec_spark.sources.changelog import parse_changes


def read_change_stream(
    spark, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming tail of a change-event directory → parsed CHANGE_SCHEMA.

    Lineage offsets use literal placeholders here: a pure streaming
    consumer reads state, it doesn't arbitrate LWW ties (the apply path
    attaches real lineage inside its epoch function)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = (
        reader.load(source_dir)
        .withColumn("src_file", F.input_file_name())
        .withColumn("src_offset", F.lit(0).cast("long"))
    )
    return parse_changes(raw)


def windowed_op_rates(
    changes: DataFrame,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time windows of per-op event counts.

    The watermark bounds how long a window stays open for late events —
    the state-size/completeness trade every streaming agg makes. Append
    output mode: a window emits exactly once, when the watermark passes
    its end; after that its state is cleaned up and later-arriving rows
    for it are dropped. (Dropping late rows BEFORE finalization is
    best-effort in Spark — the guarantees are emit-once + state cleanup,
    verified in tests/test_streaming_windows.py.)
    """
    return (
        changes.withWatermark("commit_ts", watermark)
        .groupBy(F.window("commit_ts", window_duration).alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "n_convs",
        )
    )


_PROGRESS_OUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_turn", T.IntegerType()),
        T.StructField("last_lsn", T.LongType()),
    ]
)
_PROGRESS_STATE = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_turn", T.IntegerType()),
        T.StructField("last_lsn", T.LongType()),
    ]
)


def _progress_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    events_seen, max_turn, last_lsn = (
        state.get if state.exists else (0, -1, -1)
    )
    for pdf in pdfs:
        events_seen += len(pdf)
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            last_lsn = max(last_lsn, int(pdf["lsn"].max()))
    state.update((events_seen, max_turn, last_lsn))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "events_seen": [events_seen],
            "max_turn": [max_turn],
            "last_lsn": [last_lsn],
        }
    )


def conversation_progress(changes: DataFrame) -> DataFrame:
    """Custom stateful operator: per-conversation running progress,
    state carried across micro-batches via the checkpointed state store
    (Arrow-batched — pandas per group, no per-row Python)."""
    # lsn coalesced like turn_idx: CHANGE_SCHEMA allows null lsn (e.g. a
    # Debezium envelope without source.lsn) and int(NaN.max()) would kill
    # the whole streaming query inside the state function
    data = changes.where(F.col("conv_id").isNotNull()).select(
        "conv_id",
        F.coalesce(F.col("turn_idx"), F.lit(-1)).alias("turn_idx"),
        F.coalesce(F.col("lsn"), F.lit(-1)).alias("lsn"),
    )
    return data.groupBy("conv_id").applyInPandasWithState(
        _progress_fn,
        outputStructType=_PROGRESS_OUT,
        stateStructType=_PROGRESS_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
