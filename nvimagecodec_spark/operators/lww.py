"""Last-writer-wins dedupe — the engine's core aggregate (SURVEY §2.7 A5).

Semantics: for each key ``(conv_id, turn_idx)``, keep the event with the
highest ``(lsn, commit_ts, src_file, src_offset)``. Reference analog:
"first successful processor wins, statuses latch once"
(/root/reference/src/processing_results.cpp:30-48) with the deterministic
tiebreak mirroring ``sortSamples``'s stable index tiebreak
(/root/reference/src/image_generic_decoder.cpp:146).

Scale design — why ``max(struct(...))`` and not a window:

- ``groupBy(key).agg(max(struct(ord..., payload)))`` gets a *partial
  (map-side) aggregation* before the shuffle: with 5% duplicate events and
  hot keys receiving ~10% of all updates (FIXTURES.md §3), most redundant
  rows die in the map stage and never cross the network. A
  ``row_number() OVER (PARTITION BY key ...)`` window must shuffle and
  sort EVERY event, and a single hot conv_id serializes into one task.
- Struct comparison in Spark is field-order lexicographic, so putting the
  ordering columns first makes ``max`` exactly LWW. Ordering fields are
  null-coalesced so a missing tiebreak can't poison the comparison.

``lww_dedupe_window`` keeps the window formulation for tests/verification
(both must agree on every fixture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KEY_COLS = ["conv_id", "turn_idx"]
ORDER_COLS = ["lsn", "commit_ts", "src_file", "src_offset"]

def _null_floor(col_name: str) -> Column:
    # lazily built (Columns need an active SparkSession)
    floors = {
        "lsn": lambda: F.lit(-(2**62)).cast("long"),
        "commit_ts": lambda: F.to_timestamp(F.lit("1900-01-01 00:00:00")),
        "src_file": lambda: F.lit(""),
        "src_offset": lambda: F.lit(-(2**62)).cast("long"),
    }
    floors["_sys_lsn"] = floors["lsn"]
    floors["_sys_cts"] = floors["commit_ts"]
    floors["_sys_sf"] = floors["src_file"]
    floors["_sys_so"] = floors["src_offset"]
    return floors.get(col_name, lambda: F.lit(""))()


def _ord_struct(order_cols: list[str]) -> Column:
    return F.struct(
        *[F.coalesce(F.col(c), _null_floor(c)).alias(f"_o_{c}") for c in order_cols]
    )


def lww_dedupe(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One winning row per key via map-side-combinable max-of-struct.

    Output columns: key columns + every non-key column of ``df`` (winner's
    values). The plan shows `partial_max` before the exchange — verify
    with tests/test_plans.py.
    """
    key_cols = key_cols or KEY_COLS
    order_cols = order_cols or ORDER_COLS
    payload_cols = [c for c in df.columns if c not in key_cols]
    packed = F.struct(
        _ord_struct(order_cols).alias("_ord"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_row"),
    )
    won = df.groupBy(*key_cols).agg(F.max(packed).alias("_w"))
    return won.select(
        *key_cols, *[F.col(f"_w._row.{c}").alias(c) for c in payload_cols]
    )


def lww_dedupe_window(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Window/row_number formulation — same semantics, used as an internal
    cross-check oracle (and by tests). Not the scale path."""
    key_cols = key_cols or KEY_COLS
    order_cols = order_cols or ORDER_COLS
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.coalesce(F.col(c), _null_floor(c)).desc() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
