#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline metric (BASELINE.json): change-events/sec applied (binlog ->
lakehouse upsert). Two engine segments exercise the real apply path:

- ``cdc_bulk_apply``  — a change stream synthesized IN SPARK from the sf
  lineitem table (~600k events at sf0.1; key = (conv-<orderkey>,
  linenumber%4), op mix I/U/D, JSON after-images) is LWW-deduped and
  merged into a fresh LakeTable. Batch > broadcast threshold -> exercises
  the sort-merge (backfill) strategy.
- ``cdc_incr_apply`` — a 5% update slice with bumped LSNs merged on top:
  the steady-state broadcast strategy (table side never shuffles).

All other keys are the driver-contract queries from ``__spark_entry__``,
each forced end-to-end with a noop-format write (full computation, no
driver collect bottleneck).

Usage: python bench.py [--cpus N] [--sf-dir D] [--cdc-only] [--tag NAME]
Env:   SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SF_DIR (default
       /root/testdata/sf0.1). Progress goes to stderr; the single JSON
       result line goes to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"nvics-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-Xms8g")
        .getOrCreate()
    )


def force(df) -> None:
    """Full end-to-end execution without a driver-side collect."""
    df.write.format("noop").mode("overwrite").save()


# --------------------------------------------------------------- CDC apply

def synth_change_stream(spark, sf_dir: str):
    """Deterministic transcript-shaped change stream, synthesized IN SPARK
    (never on the driver) from the sf lineitem table. ~1 event/lineitem.

    Shape per BASELINE.json input_hint: key (conv_id, turn_idx), op I/U/D,
    monotone lsn, raw-JSON after image {role, text, tool, ts}.
    """
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    role = F.element_at(roles, (F.col("l_linenumber") % 4 + 1).cast("int"))
    text = F.concat(
        F.lit("turn text for order "),
        F.col("l_orderkey").cast("string"),
        F.lit(" part "),
        F.col("l_partkey").cast("string"),
        F.lit(" :: "),
        F.hex(F.xxhash64("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")),
    )
    after = F.to_json(
        F.struct(
            role.alias("role"),
            text.alias("text"),
            F.when(role == "tool", F.lit("search")).alias("tool"),
            F.date_format(
                F.col("l_shipdate").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"
            ).alias("ts"),
        )
    )
    return li.select(
        F.concat(F.lit("conv-"), F.col("l_orderkey").cast("string")).alias("conv_id"),
        (F.col("l_linenumber") % 4).cast("int").alias("turn_idx"),
        (F.col("l_orderkey") * 16 + F.col("l_linenumber")).cast("long").alias("lsn"),
        F.when((F.col("l_returnflag") == "R") & (F.col("l_linenumber") % 7 == 0), "D")
        .when(F.col("l_quantity") > 25, "U")
        .otherwise("I")
        .alias("op"),
        after.alias("after"),
        F.col("l_shipdate").cast("timestamp").alias("commit_ts"),
        F.lit("bench-lineitem").alias("src_file"),
        F.monotonically_increasing_id().alias("src_offset"),
    )


def bench_cdc_apply(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from nvimagecodec_spark.lakehouse.table import LakeTable
    from nvimagecodec_spark.operators.lww import lww_dedupe
    from nvimagecodec_spark.operators.merge import merge_into

    ch = synth_change_stream(spark, sf_dir)
    n_events = ch.count()

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="nvics-bench-")
    out: dict = {"cdc_events": n_events}
    try:
        # warmup epoch (1/16 slice into a throwaway table): compiles the
        # query shapes once, as every epoch of a long-running stream would
        # find them — steady-state throughput is what the metric means.
        warm = LakeTable.create(
            spark, os.path.join(tmp, "warm"), schema, ["conv_id", "turn_idx"], bucket_count=32
        )
        merge_into(warm, lww_dedupe(ch.where(F.col("lsn") % 16 == 0)))

        upd = (
            ch.where(F.col("lsn") % 20 == 0)
            .withColumn("lsn", F.col("lsn") + F.lit(10**12).cast("long"))
            .withColumn("op", F.when(F.col("op") == "D", "D").otherwise(F.lit("U")))
        )
        n_upd = upd.count()

        # two timed (bulk, incr) reps into fresh tables; report best of
        # each with all reps recorded — single-shot numbers still carried
        # residual JIT and made round-over-round deltas noise
        bulk_times, incr_times = [], []
        for r in range(2):
            table = LakeTable.create(
                spark, os.path.join(tmp, f"t{r}"), schema, ["conv_id", "turn_idx"], bucket_count=32
            )
            t0 = time.time()
            res = merge_into(table, lww_dedupe(ch))
            bulk_times.append(round(time.time() - t0, 3))
            t0 = time.time()
            res2 = merge_into(table, lww_dedupe(upd))
            incr_times.append(round(time.time() - t0, 3))
            shutil.rmtree(os.path.join(tmp, f"t{r}"), ignore_errors=True)
        bulk, incr = min(bulk_times), min(incr_times)
        out["cdc_bulk_apply"] = bulk
        out["cdc_bulk_apply_reps"] = bulk_times
        out["cdc_bulk_events_per_sec"] = round(n_events / bulk, 1)
        out["cdc_bulk_strategy"] = res.strategy
        log(f"cdc_bulk_apply: {n_events} events in {bulk:.2f}s "
            f"({n_events / bulk:,.0f} ev/s, {res.strategy}, reps={bulk_times})")
        out["cdc_incr_apply"] = incr
        out["cdc_incr_apply_reps"] = incr_times
        out["cdc_incr_events"] = n_upd
        out["cdc_incr_events_per_sec"] = round(n_upd / incr, 1)
        out["cdc_incr_strategy"] = res2.strategy
        log(f"cdc_incr_apply: {n_upd} events in {incr:.2f}s "
            f"({n_upd / incr:,.0f} ev/s, {res2.strategy}, reps={incr_times})")

        # merge-on-read incremental: same scattered-update batch, applied
        # as a delta layer (O(batch) write, base never read) — the CoW vs
        # MoR write-amplification comparison is the point; the reconciled
        # read is timed too so the read-side cost is never hidden.
        from nvimagecodec_spark.operators.merge import merge_into_delta

        mor_times, mor_read_times = [], []
        for r in range(2):
            table = LakeTable.create(
                spark, os.path.join(tmp, f"m{r}"), schema, ["conv_id", "turn_idx"], bucket_count=32
            )
            merge_into(table, lww_dedupe(ch))  # base (untimed)
            t0 = time.time()
            res3 = merge_into_delta(table, lww_dedupe(upd))
            mor_times.append(round(time.time() - t0, 3))
            t0 = time.time()
            table.read_logical().selectExpr("count(*)").collect()
            mor_read_times.append(round(time.time() - t0, 3))
            shutil.rmtree(os.path.join(tmp, f"m{r}"), ignore_errors=True)
        mor = min(mor_times)
        out["cdc_mor_apply"] = mor
        out["cdc_mor_apply_reps"] = mor_times
        out["cdc_mor_events_per_sec"] = round(n_upd / mor, 1)
        out["cdc_mor_read"] = min(mor_read_times)
        out["cdc_mor_strategy"] = res3.strategy
        log(f"cdc_mor_apply: {n_upd} events in {mor:.2f}s "
            f"({n_upd / mor:,.0f} ev/s, {res3.strategy}, reps={mor_times}; "
            f"reconciled read {min(mor_read_times):.2f}s)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ------------------------------------------------------------------- main

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--cdc-only", action="store_true", help="engine apply segments only")
    ap.add_argument("--skip", default="", help="comma-separated query names to skip")
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated query names to run exclusively (skips the CDC "
        "apply segments too unless they are named); for targeted iteration",
    )
    ap.add_argument(
        "--reps",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")),
        help="runs per entry query; best is reported (first run carries JIT)",
    )
    ap.add_argument(
        "--tag",
        default="last",
        help="suffix for the BENCH/detail_<tag>.json full-detail file",
    )
    args = ap.parse_args()

    sf = float(os.path.basename(args.sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict = {}
    extras: dict = {}

    only = {s for s in args.only.split(",") if s}
    t_all = time.time()
    if not only or {"cdc_bulk_apply", "cdc_incr_apply"} & only:
        cdc = bench_cdc_apply(spark, args.sf_dir)
        queries["cdc_bulk_apply"] = cdc["cdc_bulk_apply"]
        queries["cdc_incr_apply"] = cdc["cdc_incr_apply"]
        extras.update({k: v for k, v in cdc.items() if k not in queries})

    if not args.cdc_only:
        import __spark_entry__ as entry

        skip = {s for s in args.skip.split(",") if s}
        for name, fn in entry.queries().items():
            if name in skip or (only and name not in only):
                continue
            times = []
            try:
                for _ in range(max(args.reps, 1)):
                    t0 = time.time()
                    force(fn(spark, args.sf_dir))
                    times.append(round(time.time() - t0, 3))
                queries[name] = min(times)  # steady-state: first rep pays JIT
                extras.setdefault("rep_times", {})[name] = times
                log(f"{name}: {queries[name]}s (reps={times})")
            except Exception as e:  # keep the bench line intact on one failure
                queries[name] = None
                extras.setdefault("errors", {})[name] = str(e)[:200]
                log(f"{name}: FAILED {e}")

        # Honesty split (round-3 verdict #8): the emb_ivf_persisted entry
        # rebuilds the index every call, so its headline charges k-means
        # TRAINING to the query path. Build-once/query-many is the product
        # shape — time the halves separately. Detail carries the split;
        # the compact line gets the steady-state query number.
        if "emb_ivf_persisted" not in skip and queries.get("emb_ivf_persisted"):
            try:
                import tempfile

                from nvimagecodec_spark.operators.ivf_index import IvfIndex

                emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
                idx_dir = os.path.join(tempfile.mkdtemp(prefix="nvics-bench-ivf-"), "idx")
                t0 = time.time()
                idx = IvfIndex.build(emb, idx_dir, n_cells=8, seed=7)
                build_s = round(time.time() - t0, 3)
                qtimes = []
                for _ in range(max(args.reps, 1)):
                    t0 = time.time()
                    force(idx.topk(anchor=0, k=25, n_probe=2))
                    qtimes.append(round(time.time() - t0, 3))
                # split lives in extras ONLY: adding it to `queries` would
                # double-count the topk inside queries_total_best and break
                # that field's round-over-round comparability
                extras["ivf_persisted_split"] = {
                    "build_sec": build_s,
                    "query_sec_best": min(qtimes),
                    "query_reps": qtimes,
                }
                log(
                    f"emb_ivf_persisted split: build={build_s}s "
                    f"query_best={min(qtimes)}s (reps={qtimes})"
                )
            except Exception as e:
                extras.setdefault("errors", {})["ivf_persisted_split"] = str(e)[:200]

    total = round(time.time() - t_all, 3)
    result = {
        "metric": "total bench seconds (headline: change-events/sec applied, "
        "see cdc_bulk_events_per_sec / cdc_incr_events_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        # round-over-round comparable total: per-query steady-state (best of
        # reps) summed; `value` is wall clock and GROWS with --reps, so
        # compare THIS field (and the per-sec headlines) across rounds
        "queries_total_best": round(sum(v for v in queries.values() if v), 3),
        "sf": sf,
        "cpus": args.cpus,
        **extras,
    }
    # Full detail (per-rep times, error texts, everything) goes to a file;
    # the single stdout line stays COMPACT. Round 2's line outgrew the
    # driver's tail-capture buffer once 35 queries of rep_times joined it
    # and BENCH_r02.json came back "parsed": null — the stdout line is a
    # wire format with a length budget, not a dumping ground.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", f"detail_{args.tag}.json"
    )
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(result, f, indent=1)
    log(f"full detail -> {detail_path}")
    compact = {
        k: v
        for k, v in result.items()
        if k not in ("rep_times", "errors")
        and not k.endswith("_reps")
    }
    if "errors" in result:  # names only; texts live in the detail file
        compact["failed"] = sorted(result["errors"])
    compact["detail"] = os.path.relpath(detail_path, os.getcwd())
    # HARD length budget: the driver records only a ~2000-char tail of
    # stdout — r4's line outgrew it once the per-query map passed ~90
    # entries and came back "parsed": null. If the full line would bust
    # the budget, keep headline scalars + the slowest queries and point
    # at the detail file for the rest (counts stay so nothing is silent).
    line = json.dumps(compact)
    budget = 1900
    if len(line) > budget and isinstance(compact.get("queries"), dict):
        q = compact["queries"]
        timed = sorted(
            ((k, v) for k, v in q.items() if isinstance(v, (int, float))),
            key=lambda kv: kv[1],
            reverse=True,
        )
        compact["n_queries"] = len(q)
        for keep in (20, 12, 8, 4, 0):
            compact["queries"] = dict(timed[:keep])
            compact["queries_omitted"] = len(q) - keep
            line = json.dumps(compact)
            if len(line) <= budget:
                break
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
