#!/usr/bin/env python
"""One writer process for the multi-process commit-race harness.

Launched N-way concurrently by tests/test_multiprocess_race.py (and usable
by hand) against ONE LakeTable path. Each writer runs its own JVM —
true process-level concurrency on the O_EXCL optimistic-commit protocol,
the thing thread-level tests can't prove (reference analog:
/root/reference/test/api/concurrent_decode_test.cpp runs real concurrent
decoders, not mocked ones).

Modes:
- append: N append commits of `rows` distinct rows each. Lost-update
  detector: the final table must hold every writer's every row.
- merge: N bucket-replacing merges on writer-disjoint keys that SHARE
  buckets across writers, so racing replace_buckets calls genuinely
  collide. ConcurrentModification is EXPECTED here — the writer re-reads
  and re-merges (the contract the engine's callers follow); the count of
  conflicts seen is reported as evidence the race actually happened.

Prints one JSON line: {"writer", "commits", "cm_conflicts", "rows_written"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--writer-id", type=int, required=True)
    ap.add_argument("--commits", type=int, default=5)
    ap.add_argument("--rows", type=int, default=20)
    ap.add_argument("--mode", choices=["append", "merge"], default="append")
    ap.add_argument(
        "--barrier",
        default=None,
        help="DIR:N start barrier — touch a ready-file, spin until N exist, "
        "then begin. Makes writer overlap deterministic: without it, JVM "
        "startup staggering under machine load can serialize the writers "
        "and the race never actually happens (flaky conflict assertions).",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nvimagecodec_spark.lakehouse.table import ConcurrentModification, LakeTable
    from nvimagecodec_spark.operators.lww import lww_dedupe
    from nvimagecodec_spark.operators.merge import merge_into

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"race-writer-{args.writer_id}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    table = LakeTable.load(spark, args.table)

    if args.barrier:
        bdir, n = args.barrier.rsplit(":", 1)
        os.makedirs(bdir, exist_ok=True)
        open(os.path.join(bdir, f"ready-{args.writer_id}"), "w").close()
        deadline = time.time() + 120
        while len([f for f in os.listdir(bdir) if f.startswith("ready-")]) < int(n):
            if time.time() > deadline:
                raise TimeoutError("barrier wait exceeded 120s")
            time.sleep(0.05)

    commits = 0
    cm_conflicts = 0
    rows_written = 0
    for i in range(args.commits):
        if args.mode == "append":
            df = spark.range(args.rows).select(
                F.concat(F.lit(f"w{args.writer_id}-c{i}-"), F.col("id").cast("string")).alias(
                    "conv_id"
                ),
                F.col("id").cast("int").alias("turn_idx"),
                F.lit(f"writer{args.writer_id}").alias("text"),
            )
            table.append(df)
            commits += 1
            rows_written += args.rows
        else:
            events = spark.range(args.rows).select(
                F.lit("U").alias("op"),
                # writer-disjoint keys, writer-SHARED buckets: every writer
                # touches conv keyed only by row index, so merges collide
                F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
                F.lit(args.writer_id).cast("int").alias("turn_idx"),
                (F.lit(i * 1000 + args.writer_id)).cast("long").alias("lsn"),
                F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("commit_ts"),
                F.lit(f"w{args.writer_id}").alias("src_file"),
                F.col("id").alias("src_offset"),
                F.to_json(
                    F.struct(F.concat(F.lit(f"v{i}-by-w{args.writer_id}")).alias("text"))
                ).alias("after"),
            )
            for attempt in range(30):
                try:
                    merge_into(table, lww_dedupe(events))
                    commits += 1
                    rows_written += args.rows
                    break
                except ConcurrentModification:
                    cm_conflicts += 1
                    table.refresh()
                    time.sleep(0.05 * (attempt % 5))
            else:
                raise SystemExit(f"writer {args.writer_id}: merge never converged")

    print(
        json.dumps(
            {
                "writer": args.writer_id,
                "commits": commits,
                "cm_conflicts": cm_conflicts,
                "rows_written": rows_written,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
