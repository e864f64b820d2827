"""Combined chaos soak (ROADMAP r5 item): the three recovery tiers that
were only ever killed SEPARATELY — multi-route atomic fan-out (CdcRouter
+ TxnCatalog), catalog-registered derived views (agg view + text index),
and stream checkpoint resume — exercised TOGETHER under a concurrent
writer and repeated random mid-drain kills. Reference analog: the
iteration protocol's crash points all land between 'samples claimed' and
'promise resolved' (/root/reference/src/image_generic_codec.h:918-920,
src/processing_results.cpp:30-48) — here the analogous windows are
stage→publish→view-sync→pointer-flip, and every kill must leave the
catalog recoverable and the final state byte-identical to the oracle."""

import os
import random
import threading
import time

import pytest
from pyspark.sql import functions as F

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.lakehouse.txn import TxnCatalog
from nvimagecodec_spark.operators.agg_view import IncrementalAggView
from nvimagecodec_spark.operators.text_index import IncrementalTextIndex
from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas
from nvimagecodec_spark.sources.generator import (
    events_to_files,
    generate_change_events,
)
from nvimagecodec_spark.streaming.router import CdcRouter
from tests.test_apply_end_to_end import TARGET_SCHEMA


def _keys_and_text(df):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in df.select("conv_id", "turn_idx", "text").collect()
    }


def _terms_recompute(df):
    rows = (
        df.select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
            ).alias("term"),
            "conv_id",
            "turn_idx",
        )
        .where(F.col("term") != "")
        .distinct()
        .collect()
    )
    return {(r.term, r.conv_id, r.turn_idx) for r in rows}


@pytest.mark.slow
def test_chaos_router_catalog_views_random_kills(spark, tmp_dir):
    rng = random.Random(7)
    events = generate_change_events(n_events=2400, seed=77, with_schema_events=False)
    staged = os.path.join(tmp_dir, "staged")
    events_to_files(events, staged, files=8)
    stream_dir = os.path.join(tmp_dir, "stream")
    os.makedirs(stream_dir)

    te = LakeTable.create(
        spark, os.path.join(tmp_dir, "even"), TARGET_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=4,
    )
    to = LakeTable.create(
        spark, os.path.join(tmp_dir, "odd"), TARGET_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=4,
    )
    cat_path = os.path.join(tmp_dir, "cat")
    catalog = TxnCatalog.create(spark, cat_path, {"even": te, "odd": to})
    agg = IncrementalAggView.create(
        spark, os.path.join(tmp_dir, "agg"), te, group_cols=["role"],
        sum_cols=["turn_idx"],
    )
    catalog.register_view("agg", agg, "even")
    idx = IncrementalTextIndex.create(
        spark, os.path.join(tmp_dir, "idx"), to, text_col="text", bucket_count=4
    )
    catalog.register_view("idx", idx, "odd")

    files = sorted(os.listdir(staged))

    def writer():
        import shutil

        for f in files:
            shutil.copy(os.path.join(staged, f), os.path.join(stream_dir, f + ".tmp"))
            os.rename(
                os.path.join(stream_dir, f + ".tmp"), os.path.join(stream_dir, f)
            )
            time.sleep(rng.uniform(0.2, 1.0))

    t = threading.Thread(target=writer)
    t.start()

    ckpt = os.path.join(tmp_dir, "ckpt")

    def routes():
        return {
            "even": (LakeTable(spark, te.path), F.col("turn_idx") % 2 == 0),
            "odd": (LakeTable(spark, to.path), F.col("turn_idx") % 2 == 1),
        }

    # chaos rounds: drain with a random (often mid-flight) kill, then a
    # full catalog recovery before the next attempt — every round builds
    # fresh handles, as a restarted driver would
    for _ in range(4):
        cat = TxnCatalog.load(spark, cat_path, recover=True)
        router = CdcRouter(spark, routes(), source_id="chaos", checkpoint_dir=ckpt)
        router.run_stream(
            stream_dir,
            max_files_per_trigger=2,
            await_seconds=rng.uniform(1.5, 8.0),
            catalog=cat,
        )
    t.join()

    # final clean drain (full availableNow) on recovered state
    cat = TxnCatalog.load(spark, cat_path, recover=True)
    router = CdcRouter(spark, routes(), source_id="chaos", checkpoint_dir=ckpt)
    router.run_stream(stream_dir, max_files_per_trigger=2, catalog=cat)

    # 1) route tables == per-parity pandas oracle
    want = apply_events_pandas(events)
    for route, parity in (("even", 0), ("odd", 1)):
        w = want[want["turn_idx"] % 2 == parity]
        got = _keys_and_text(cat.read(route))
        assert got == {
            (c, int(ti)): tx
            for c, ti, tx in zip(w["conv_id"], w["turn_idx"], w["text"])
        }, f"route {route} diverged"

    # 2) catalog pins == table heads after the clean drain
    for route, tbl in (("even", te), ("odd", to)):
        tbl.refresh()
        assert cat.pinned_snapshot(route) == tbl.current_snapshot().snapshot_id

    # 3) registered views consistent with their catalog-pinned bases
    agg_got = {
        (r["role"],): (r["n_rows"], r["sum_turn_idx"])
        for r in cat.view("agg").totals().collect()
    }
    agg_want = {
        (r["role"],): (r["cnt"], r["s"])
        for r in cat.read("even")
        .groupBy("role")
        .agg(F.count("*").alias("cnt"), F.sum("turn_idx").alias("s"))
        .collect()
    }
    assert agg_got == agg_want
    idx_got = {
        (r["term"], r["conv_id"], r["turn_idx"])
        for r in cat.read("idx").select("term", "conv_id", "turn_idx").collect()
    }
    assert idx_got == _terms_recompute(cat.read("odd"))

    # 4) full replay on a fresh checkpoint is a pure no-op (exactly-once
    # tags latch every epoch across router + catalog + views)
    heads = {}
    for name, tbl in (("even", te), ("odd", to)):
        tbl.refresh()
        heads[name] = tbl.current_snapshot().snapshot_id
    cat2 = TxnCatalog.load(spark, cat_path, recover=True)
    router2 = CdcRouter(
        spark, routes(), source_id="chaos",
        checkpoint_dir=os.path.join(tmp_dir, "ckpt2"),
    )
    router2.run_stream(stream_dir, max_files_per_trigger=4, catalog=cat2)
    for name, tbl in (("even", te), ("odd", to)):
        tbl.refresh()
        assert tbl.current_snapshot().snapshot_id == heads[name], (
            f"replay moved {name}"
        )
