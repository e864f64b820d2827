"""Columnar-staged change stream: slice predicates must reach the parquet
reader (PushedFilters) and, when LSN-partitioned, prune whole directories
(PartitionFilters) — the scale path for repeated micro-batch consumption
(a text source re-parses the world per epoch).
"""

import json

import pytest

from nvimagecodec_spark.plans import partition_filters, pushed_filters
from nvimagecodec_spark.sources.changelog import ChangeStream, ParquetChangeStream


@pytest.fixture()
def text_stream(spark, tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    lines = []
    for lsn in range(1, 101):
        lines.append(
            json.dumps(
                {
                    "op": "I",
                    "lsn": lsn,
                    "commit_ts": "2025-01-01 00:00:00",
                    "conv_id": f"c{lsn % 7}",
                    "turn_idx": lsn % 3,
                    "after": {"text": f"t{lsn}"},
                }
            )
        )
    (d / "a.jsonl").write_text("\n".join(lines) + "\n")
    return ChangeStream(spark, str(d))


def test_materialize_roundtrip_and_engine_compat(spark, text_stream, tmp_path):
    pq = text_stream.materialize(str(tmp_path / "staged"))
    assert isinstance(pq, ParquetChangeStream)
    assert pq.events().count() == 100
    assert pq.max_lsn() == 100
    got = {r["lsn"] for r in pq.slice(start_lsn=10, end_lsn=20).collect()}
    assert got == set(range(11, 21))
    # text and parquet slices agree exactly
    want = {r["lsn"] for r in text_stream.slice(start_lsn=10, end_lsn=20).collect()}
    assert got == want


def test_slice_pushes_lsn_into_parquet_reader(spark, text_stream, tmp_path):
    pq = text_stream.materialize(str(tmp_path / "staged"))
    df = pq.slice(start_lsn=10, end_lsn=20)
    pf = pushed_filters(df)
    assert "lsn" in pf, f"lsn not pushed: {pf!r}"


def test_lsn_partitioning_prunes_directories(spark, text_stream, tmp_path):
    pq = text_stream.materialize(str(tmp_path / "staged"), lsn_partition_width=25)
    df = pq.slice(start_lsn=30, end_lsn=45)
    parts = partition_filters(df)
    assert "_lsn_part" in parts, f"no partition pruning: {parts!r}"
    got = {r["lsn"] for r in df.collect()}
    assert got == set(range(31, 46))
    # reload from disk: width survives via _stream_meta.json
    again = ParquetChangeStream(spark, str(tmp_path / "staged"))
    assert again.lsn_partition_width == 25
    assert {r["lsn"] for r in again.slice(start_lsn=90).collect()} == set(range(91, 101))


def test_incremental_engine_runs_on_parquet_stream(spark, text_stream, tmp_path):
    from pyspark.sql import types as T

    from nvimagecodec_spark.config import EngineConfig
    from nvimagecodec_spark.lakehouse.table import LakeTable
    from nvimagecodec_spark.streaming.engine import CdcEngine

    pq = text_stream.materialize(str(tmp_path / "staged"))
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ["conv_id", "turn_idx"], bucket_count=4
    )
    engine = CdcEngine(
        spark,
        table,
        source_id="pq",
        config=EngineConfig(target_batch_events=40, expire_every_epochs=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    epochs = engine.run_incremental(pq)
    assert epochs >= 2  # rate cap forces multiple LSN slices
    assert table.read_logical().count() == 21  # distinct (conv_id, turn_idx)
