"""Incrementally-maintained aggregate view (materialized GROUP BY).

A count/sum rollup of a CDC-maintained base table, stored as its own
LakeTable and kept fresh with O(changed-rows) work per sync — the
streaming-materialized-view pattern: never re-aggregate the world
because one epoch landed.

Maintenance is RETRACTION-based. ``read_changes(with_before=True)``
yields before/after images, and every change row contributes signed
deltas:

- I → ``(+1, +after)`` under the after-image's group,
- D → ``(−1, −before)`` under the before-image's group,
- U → BOTH — so a row whose group column changed migrates cleanly
  (its old group shrinks, its new group grows).

Deltas collapse to one row per touched group (map-side combinable sum —
the only shuffle of the sync), current totals for exactly the touched
view buckets are read back (the delta group keys are pushed through the
view's own bucket transform; untouched buckets are never scanned), and
new totals merge in through the same exactly-once tagged ``merge_into``
as data. A group whose row count returns to zero is deleted, not left
as a ghost row.

Sync cursor = the view table's commit-tag log (batch_id = base snapshot
id), identical to IncrementalDedupIndex — replays are no-ops, and a
view created after the base's create snapshot was expired bootstraps
from full state instead of silently diffing from the oldest retained
snapshot.

Reference analog: incremental status accumulation — per-batch results
fold into a persistent status vector rather than recomputing all
samples (/root/reference/src/processing_results.h:51-89).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.incremental import read_changes
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.merge import MergeResult, merge_into

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


class IncrementalAggView:
    """``SELECT group_cols, count(*), sum(sum_cols...)`` as a LakeTable."""

    SOURCE_ID = "aggview-sync"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = LakeTable(spark, path)
        props = self.table.meta.get("properties", {})
        self.group_cols = props["aggview.group-cols"].split(",")
        self.sum_cols = [c for c in props["aggview.sum-cols"].split(",") if c]

    # ----------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        base: LakeTable,
        group_cols: list[str],
        sum_cols: list[str] | None = None,
        bucket_count: int | None = None,
    ) -> "IncrementalAggView":
        sum_cols = sum_cols or []
        base_fields = {f.name: f for f in base.schema().fields}
        for c in group_cols + sum_cols:
            if c not in base_fields:
                raise ValueError(f"base table has no column {c!r}")
        fields = [T.StructField(c, base_fields[c].dataType) for c in group_cols]
        fields.append(T.StructField("n_rows", T.LongType()))
        for c in sum_cols:
            # integral sums stay exact (long); everything else widens to
            # double — incremental +/- on long never drifts, which keeps
            # the view hash-identical to a from-scratch recompute.
            t = base_fields[c].dataType
            out_t = T.LongType() if isinstance(t, _INTEGRAL) else T.DoubleType()
            fields.append(T.StructField(f"sum_{c}", out_t))
        LakeTable.create(
            spark,
            path,
            T.StructType(fields),
            list(group_cols),
            bucket_count=bucket_count or base.bucket_count,
            properties={
                "aggview.group-cols": ",".join(group_cols),
                "aggview.sum-cols": ",".join(sum_cols),
            },
        )
        return cls(spark, path)

    # ----------------------------------------------------------- sync
    def last_synced_base_snapshot(self) -> int | None:
        ids = [
            s["tag"]["batch_id"]
            for s in self.table.meta["snapshots"]
            if s.get("tag", {}) and s["tag"].get("source_id") == self.SOURCE_ID
        ]
        ids += [
            b for (src, b) in self.table.meta.get("expired_tags", []) if src == self.SOURCE_ID
        ]
        return max(ids) if ids else None

    def sync(self, base: LakeTable, to_id: int | None = None) -> MergeResult:
        """Fold base changes since the last sync into the view."""
        head = base.current_snapshot().snapshot_id
        to_id = head if to_id is None else to_id
        from_id = self.last_synced_base_snapshot()
        if from_id is not None:
            if to_id == from_id:
                return MergeResult(None, [], 0, 0, 0.0, "noop")
            if to_id < from_id:
                raise ValueError(
                    f"sync target snapshot {to_id} is older than last synced {from_id}"
                )
            deltas = self._deltas_from_changes(base, from_id, to_id)
        else:
            oldest = base.history()[0]
            if oldest.operation == "create":
                deltas = self._deltas_from_changes(base, oldest.snapshot_id, to_id)
            else:
                # base create snapshot EXPIRED → full-state bootstrap
                deltas = self._deltas_from_state(base, to_id)
        # cached: the collapsed deltas (one row per touched group) feed
        # both the bucket discovery collect and the totals join
        deltas = deltas.cache()
        try:
            batch = self._merge_batch(deltas, to_id)
            return merge_into(
                self.table,
                batch,
                tag={"source_id": self.SOURCE_ID, "batch_id": to_id},
            )
        finally:
            deltas.unpersist()

    def _signed(self, rows: DataFrame, prefix: str, sign: int) -> DataFrame:
        """One signed contribution per change row: group key from the
        ``prefix`` image, ±1 row count, ± each sum column. A group/sum
        column that is a base KEY col has no ``before_`` copy (keys
        cannot change) — it reads unprefixed on both sides."""
        cols = set(rows.columns)
        gs = [
            F.col(f"{prefix}{g}" if f"{prefix}{g}" in cols else g).alias(g)
            for g in self.group_cols
        ]
        ss = [
            (F.lit(sign) * F.coalesce(F.col(f"{prefix}{c}" if f"{prefix}{c}" in cols else c), F.lit(0)))
            .alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        return rows.select(*gs, F.lit(sign).cast("long").alias("n_rows"), *ss)

    def _deltas_from_changes(self, base: LakeTable, from_id: int, to_id: int) -> DataFrame:
        ch = read_changes(base, from_id, to_id, with_before=True)
        plus = self._signed(ch.where(F.col("op") != "D"), "", 1)
        minus = self._signed(ch.where(F.col("op") != "I"), "before_", -1)
        return self._collapse(plus.unionByName(minus))

    def _deltas_from_state(self, base: LakeTable, to_id: int) -> DataFrame:
        df = base.read(snapshot_id=to_id, with_system=True)
        live = df.where(~F.coalesce(F.col("_sys_deleted"), F.lit(False)))
        return self._collapse(self._signed(live, "", 1))

    def _collapse(self, contributions: DataFrame) -> DataFrame:
        aggs = [F.sum("n_rows").alias("n_rows")] + [
            F.sum(f"sum_{c}").alias(f"sum_{c}") for c in self.sum_cols
        ]
        return contributions.groupBy(*self.group_cols).agg(*aggs)

    def _merge_batch(self, deltas: DataFrame, to_id: int) -> DataFrame:
        """deltas + current totals of the TOUCHED buckets → change rows."""
        # The delta side is one row per touched GROUP — bounded by the
        # epoch's distinct groups, and the bucket list by bucket_count.
        touched = [
            r["b"]
            for r in deltas.select(
                self.table.bucket_expr(deltas).alias("b")
            ).distinct().collect()
        ]
        sum_out = [f"sum_{c}" for c in self.sum_cols]
        state = self.table.read(buckets=touched, with_system=True)
        state = state.where(~F.coalesce(F.col("_sys_deleted"), F.lit(False))).select(
            *[F.col(g).alias(f"o_{g}") for g in self.group_cols],
            F.col("n_rows").alias("o_n"),
            *[F.col(c).alias(f"o_{c}") for c in sum_out],
        )
        cond = None
        for g in self.group_cols:
            c = F.col(f"o_{g}").eqNullSafe(F.col(g))
            cond = c if cond is None else (cond & c)
        j = deltas.join(state, cond, "left_outer")
        o_exists = F.col("o_n").isNotNull()
        new_n = F.coalesce(F.col("o_n"), F.lit(0)) + F.col("n_rows")
        new_sums = [
            (F.coalesce(F.col(f"o_{s}"), F.lit(0)) + F.col(s)).alias(s) for s in sum_out
        ]
        gkeys = [
            F.coalesce(F.col(g), F.col(f"o_{g}")).alias(g) for g in self.group_cols
        ]
        rows = j.select(
            *gkeys, o_exists.alias("_had"), new_n.alias("_n"), *new_sums
        )
        # zero-count groups: delete if the view held them, skip otherwise
        rows = rows.where(F.col("_had") | (F.col("_n") != 0))
        after = F.to_json(
            F.struct(
                F.col("_n").alias("n_rows"),
                *[F.col(s) for s in sum_out],
            )
        )
        return rows.select(
            *self.group_cols,
            F.when(F.col("_n") == 0, "D").otherwise("I").alias("op"),
            F.when(F.col("_n") != 0, after).alias("after"),
            F.lit(to_id).cast("long").alias("lsn"),
            F.lit(None).cast("timestamp").alias("commit_ts"),
            F.lit(self.SOURCE_ID).alias("src_file"),
            F.lit(to_id).cast("long").alias("src_offset"),
        )

    # ----------------------------------------------------------- queries
    def totals(self) -> DataFrame:
        """Live view rows: group cols + n_rows + sum_<c>."""
        return self.table.read_logical()
