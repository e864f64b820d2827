"""SCD Type-2 history — changelog → validity-interval dimension table.

Turns a CDC change stream into the classic slowly-changing-dimension
shape: one row per (key, version) with ``valid_from`` / ``valid_to``
bounds, where a new version opens whenever a tracked attribute actually
changes (or a key is re-inserted after a delete) and the current version
carries ``is_current = true``. Deletes close the open interval and emit
no row of their own.

Scale design — ONE shuffle for the whole derivation:

- The change stream is sorted per key by the full LWW order struct
  (window partitioned by the key columns). Run detection is a null-safe
  lag comparison on the tracked columns + the delete/rebirth boundary;
  version ids are a running sum of boundaries — all partition-local
  after the single hash exchange.
- ``valid_to`` needs the timestamp of the first event AFTER a run, so
  ``lead`` is computed over the FULL sequence (deletes included) before
  dead rows are dropped.
- The per-version collapse is ``groupBy(key..., version)``. Spark's
  EnsureRequirements sees ``HashPartitioning(key)`` already satisfies
  clustering on the superset ``(key..., version)``, so the aggregation
  runs in the same stage — no second exchange (pinned in
  tests/test_scd2.py).

Reference analog: per-offset parsed-state views — each stream position
exposes the state in force at that offset, superseded states remain
addressable (/root/reference/src/code_stream.cpp:47-95; time-travel tier
of SURVEY §2 S7/U7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nvimagecodec_spark.operators.lww import KEY_COLS, ORDER_COLS, _ord_struct


def scd2_history(
    changes: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    track_cols: list[str] | None = None,
    ts_col: str = "commit_ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Build the SCD2 table from a change stream.

    ``changes`` rows: key columns + ``op`` (I/U/D) + payload + order
    columns. ``track_cols`` are the attributes whose change opens a new
    version (default: every payload column except order/op). Exact
    duplicate deliveries (same key + same full order) are dropped first
    so re-delivered events can't split a run.

    Output: key cols + track cols (the version's values) +
    ``valid_from_lsn``/``valid_to_lsn`` + ``valid_from``/``valid_to``
    (``ts_col`` bounds, valid_to null while current) + ``n_events``
    (events collapsed into the version) + ``is_current``.
    """
    key_cols = key_cols or KEY_COLS
    order_cols = order_cols or ORDER_COLS
    if track_cols is None:
        skip = set(key_cols) | set(order_cols) | {op_col}
        track_cols = [c for c in changes.columns if c not in skip]
    if not track_cols:
        raise ValueError("scd2_history needs at least one tracked column")

    ord_c = _ord_struct(order_cols).alias("_ord")
    df = changes.select(*changes.columns, ord_c)

    w = Window.partitionBy(*key_cols).orderBy("_ord")
    # Exact-duplicate deliveries (same key + same full order) sort
    # adjacent, so a lag comparison drops them PARTITION-LOCALLY — a
    # dropDuplicates(key+order) would hash-exchange on the superset key
    # and cost a second shuffle.
    df = df.withColumn(
        "_dup", F.lag("_ord").over(w).eqNullSafe(F.col("_ord"))
    ).where(~F.col("_dup"))
    is_dead = F.col(op_col) == "D"
    prev_dead = F.lag(is_dead).over(w)

    def _tracked_changed() -> Column:
        changed = F.lit(False)
        for c in track_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
        return changed

    # A version boundary: first event for the key, rebirth after a D, or
    # a tracked attribute changed. D rows are boundaries too (they must
    # not extend the run they close), but they are dropped below.
    boundary = (
        F.when(prev_dead.isNull(), True)
        .when(prev_dead, True)
        .when(is_dead, True)
        .otherwise(_tracked_changed())
    )
    # Two select stages: the running version-id sums the BOUNDARY column,
    # and a window function can't take another window function as input.
    # Both stages share the same partitioning + ordering, so they are
    # consecutive Window nodes over ONE exchange, not a second shuffle.
    marked = df.select(
        *key_cols,
        *track_cols,
        F.col(op_col).alias("_op"),
        F.col(lsn_col).alias("_lsn"),
        F.col(ts_col).alias("_ts"),
        "_ord",
        boundary.cast("int").alias("_boundary"),
        # valid_to of a run = first event after it, deletes included —
        # computed before dead rows are dropped. The existence marker is
        # a lead over a CONSTANT: lead(lsn) is null both at end-of-key
        # and when the closing event carries a null lsn (CHANGE_SCHEMA
        # permits them), which would mislabel a closed version current.
        F.lead(F.col(lsn_col)).over(w).alias("_next_lsn"),
        F.lead(F.col(ts_col)).over(w).alias("_next_ts"),
        F.lead(F.lit(1)).over(w).alias("_next_exists"),
    )
    seq = marked.withColumn("_version", F.sum("_boundary").over(w))

    live = seq.where(F.col("_op") != "D")
    last_pick = F.max(
        F.struct(
            F.col("_ord"),
            F.col("_next_lsn").alias("_nl"),
            F.col("_next_ts").alias("_nt"),
            F.col("_next_exists").alias("_ne"),
        )
    ).alias("_last")
    out = live.groupBy(*key_cols, "_version").agg(
        F.min("_lsn").alias("valid_from_lsn"),
        F.min("_ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
        *[F.first(c).alias(c) for c in track_cols],  # constant within a run
        last_pick,
    )
    return out.select(
        *key_cols,
        *track_cols,
        "valid_from_lsn",
        F.col("_last._nl").alias("valid_to_lsn"),
        "valid_from",
        F.col("_last._nt").alias("valid_to"),
        "n_events",
        F.col("_last._ne").isNull().alias("is_current"),
    )
