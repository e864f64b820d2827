"""MERGE INTO — copy-on-write, bucket-granular upsert apply (SURVEY §2.3).

Reference analog: the umbrella apply operator ``ImageGenericDecoder``
(/root/reference/src/image_generic_decoder.cpp:45-98) with its
batched hot path + fallback strategy chain
(/root/reference/src/image_generic_codec.h:470-478, 1018-1049).

Scale design:

- The target table is bucket-partitioned on the key
  (``pmod(xxhash64(conv_id, turn_idx), B)``). A deduped batch touches a
  set of buckets; ONLY those buckets' files are read (manifest pruning)
  and rewritten. Cost per epoch is O(batch + touched-bucket data), never
  O(table). At 100 TB, B is sized so a bucket (or bucket × day with a
  time partition) fits a task comfortably.
- Because both sides are bucketed by the *same* key hash, the join is
  per-bucket co-partitioned; we repartition both sides on `_bucket` so
  the sort-merge join shuffles only the (small) batch — the table side
  moves once, and AQE coalesces empty partitions.
- **Strategy selection** (analog of the priority/fallback backend chain,
  G2): a small deduped batch (< broadcast_threshold_rows) uses a
  broadcast hash join against the touched buckets — zero shuffle of the
  table side; a large batch falls back to the shuffled sort-merge path.
- Deletes apply as an anti-join filter; upserts as coalesce of
  batch-over-current (full outer join on the key).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nvimagecodec_spark.lakehouse.table import BUCKET_COL, LakeTable, Snapshot


@dataclass
class MergeResult:
    snapshot: Snapshot | None
    touched_buckets: list[int]
    upserts: int
    deletes: int
    duration_sec: float
    strategy: str  # "broadcast" | "sort-merge" | "noop" | "skipped-duplicate"


def _batch_to_rows(table: LakeTable, deduped: DataFrame) -> DataFrame:
    """Winning change events → target-schema rows (+ op kept for routing).

    The raw `after` JSON is decoded HERE — once per winning key, not once
    per event — with a from_json schema derived from the table's current
    (evolved) schema. A renamed column is extracted under both its current
    and original names and coalesced, so pre-rename events still apply;
    columns added by schema evolution but absent in old payloads null-fill
    (out-of-bounds constant fill analog,
    /root/reference/src/imgproc/out_of_bound_roi_fill.cpp:26-46).
    """
    from pyspark.sql import types as T

    key_cols = table.key_cols
    tschema = table.table_schema
    fields: list[T.StructField] = []
    name_variants: dict[str, list[str]] = {}
    for c in tschema.columns:
        if c.name in key_cols:
            continue
        variants = [c.name] + [p for p in c.prev_names if p != c.name]
        name_variants[c.name] = variants
        for v in variants:
            fields.append(T.StructField(v, c.logical_type(), True))
    j = F.from_json(F.col("after"), T.StructType(fields))
    exprs = [F.col(k) for k in key_cols]
    for c in tschema.columns:
        if c.name in key_cols:
            continue
        variants = name_variants[c.name]
        e = F.coalesce(*[j[v] for v in variants]) if len(variants) > 1 else j[variants[0]]
        exprs.append(e.alias(c.name))
    return deduped.select(*exprs, F.col("op"))


def merge_into(
    table: LakeTable,
    deduped: DataFrame,
    tag: dict | None = None,
    broadcast_threshold_rows: int = 100_000,
    batch_counts: tuple[int, int] | None = None,
) -> MergeResult:
    """Apply a deduped change batch (one row/key, op ∈ I,U,D) to the table.

    Exactly-once: if ``tag`` = {source_id, batch_id} already committed, the
    merge is a no-op (replay safety; T3 in SURVEY §2.8).
    """
    t0 = time.time()
    if tag is not None and table.has_commit_tag(tag["source_id"], tag["batch_id"]):
        return MergeResult(None, [], 0, 0, time.time() - t0, "skipped-duplicate")

    key_cols = table.key_cols
    batch = _batch_to_rows(table, deduped)
    batch = table.with_bucket(batch)
    # Cache: the batch drives bucket discovery AND the join; at scale this
    # is the (small) side we must not recompute from the raw stream twice.
    batch = batch.persist()
    try:
        if batch_counts is not None:
            n_upserts, n_deletes = batch_counts
        else:
            agg = batch.agg(
                F.sum(F.when(F.col("op") != "D", 1).otherwise(0)).alias("u"),
                F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("d"),
            ).collect()[0]
            n_upserts, n_deletes = int(agg["u"] or 0), int(agg["d"] or 0)

        touched = [r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect()]
        if not touched:
            return MergeResult(None, [], 0, 0, time.time() - t0, "noop")

        current = table.read(buckets=touched)

        small = (n_upserts + n_deletes) <= broadcast_threshold_rows
        joined_batch = F.broadcast(batch) if small else batch
        strategy = "broadcast" if small else "sort-merge"
        if not small:
            # co-partition both sides on bucket+key so the sort-merge join
            # shuffles each side exactly once on the same distribution
            nparts = max(len(touched), 1)
            current = current.repartition(nparts, BUCKET_COL)
            joined_batch = batch.repartition(nparts, BUCKET_COL)

        cond = [current[k].eqNullSafe(joined_batch[k]) for k in key_cols]
        j = current.alias("t").join(joined_batch.alias("b"), cond, "full_outer")

        data_cols = [f.name for f in table.schema().fields if f.name not in key_cols]
        b_op = F.col("b.op")
        merged = j.where(b_op.isNull() | (b_op != "D")).select(
            *[F.coalesce(F.col(f"b.{k}"), F.col(f"t.{k}")).alias(k) for k in key_cols],
            *[
                F.when(b_op.isNotNull(), F.col(f"b.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in data_cols
            ],
            F.coalesce(F.col(f"b.{BUCKET_COL}"), F.col(f"t.{BUCKET_COL}")).alias(BUCKET_COL),
        )

        summary = {"upserts": n_upserts, "deletes": n_deletes}
        snap = table.replace_buckets(sorted(touched), merged, tag=tag, summary=summary)
        return MergeResult(snap, sorted(touched), n_upserts, n_deletes, time.time() - t0, strategy)
    finally:
        batch.unpersist()
