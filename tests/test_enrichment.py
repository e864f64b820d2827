"""Stream-dim enrichment (batch_transform hook): a broadcast dimension
join fills a table column the wire payload doesn't carry, inside every
epoch's merge — post-LWW (one dim probe per winning key), pre-commit
(enriched values land atomically with the epoch).

Reference analog: per-sample post-processing between decode and result
publication (/root/reference/src/image_generic_codec.h:687-708)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into, merge_into_delta
from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas
from nvimagecodec_spark.sources.changelog import ChangeStream
from nvimagecodec_spark.sources.generator import events_to_files, generate_change_events
from nvimagecodec_spark.streaming.engine import CdcEngine

ENRICHED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("team", T.StringType()),  # dim-only column
    ]
)


def _team_expr():
    # deterministic dim value derived from the key — recomputable in asserts
    return F.concat(F.lit("team-"), (F.crc32(F.col("conv_id")) % 4).cast("string"))


def test_engine_stream_enrichment_fills_dim_column(spark, tmp_dir):
    events = generate_change_events(n_events=2000, seed=42, with_schema_events=False)
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events, stream_dir, files=6)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), ENRICHED_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=8,
    )
    # a real dimension DataFrame, broadcast-joined inside each epoch
    convs = sorted(set(events["conv_id"]))
    dim = spark.createDataFrame(
        [(c,) for c in convs], "conv_id string"
    ).select("conv_id", _team_expr().alias("team_dim"))

    def enrich(batch):
        return (
            batch.join(F.broadcast(dim), "conv_id", "left")
            .withColumn("team", F.col("team_dim"))
            .drop("team_dim")
        )

    engine = CdcEngine(spark, table, source_id="enr", batch_transform=enrich)
    n = engine.run_stream(stream_dir, max_files_per_trigger=2)
    assert n >= 3

    got = table.read_logical()
    # every live row enriched with the dim value derived from ITS key
    bad = got.where(
        F.col("team").isNull() | (F.col("team") != _team_expr())
    ).count()
    assert bad == 0
    # enrichment must not change apply semantics: live keyset == oracle
    want = apply_events_pandas(events)
    got_keys = {(r["conv_id"], r["turn_idx"]) for r in got.collect()}
    want_keys = set(zip(want["conv_id"], want["turn_idx"]))
    assert got_keys == want_keys


def test_enrichment_delta_path_and_replay(spark, tmp_dir):
    """MoR path: enriched values land in delta layers too; a replayed
    epoch (same tag) stays a no-op."""
    events = generate_change_events(n_events=800, seed=7, with_schema_events=False)
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events, stream_dir, files=2)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), ENRICHED_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=4,
    )
    ch = ChangeStream(spark, stream_dir).events()
    deduped = lww_dedupe(ch)

    def enrich(batch):
        return batch.withColumn("team", _team_expr())

    merge_into(table, deduped.where(F.col("lsn") % 4 == 0),
               tag={"source_id": "s", "batch_id": 0}, batch_transform=enrich)
    merge_into_delta(table, deduped.where(F.col("lsn") % 4 != 0),
                     tag={"source_id": "s", "batch_id": 1}, batch_transform=enrich)
    got = table.read_logical()
    assert got.where(F.col("team").isNull()).count() == 0
    # replay with same tag: no-op
    res = merge_into_delta(table, deduped.where(F.col("lsn") % 4 != 0),
                           tag={"source_id": "s", "batch_id": 1},
                           batch_transform=enrich)
    assert res.strategy == "skipped-duplicate"


def test_enrichment_dropping_engine_column_fails_loud(spark, tmp_dir):
    events = generate_change_events(n_events=200, seed=9, with_schema_events=False)
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events, stream_dir, files=1)
    table = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), ENRICHED_SCHEMA,
        ["conv_id", "turn_idx"], bucket_count=4,
    )
    ch = ChangeStream(spark, stream_dir).events()

    def bad(batch):
        return batch.drop("_sys_deleted")

    with pytest.raises(ValueError, match="_sys_deleted"):
        merge_into(table, lww_dedupe(ch), batch_transform=bad)
