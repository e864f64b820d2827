"""M1: one micro-batch of change events end-to-end vs the pandas oracle.

Mirrors the reference's golden replay test shape
(/root/reference/test/test_transcode.py:26-66): fixed input → engine →
final state equality against an independent applier.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into
from nvimagecodec_spark.operators.schema_events import apply_schema_events, split_schema_events
from nvimagecodec_spark.oracle.pandas_applier import apply_events_pandas
from nvimagecodec_spark.sources.changelog import ChangeStream
from nvimagecodec_spark.sources.generator import events_to_files, generate_change_events

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def canon_spark(df) -> pd.DataFrame:
    cols = sorted(df.columns)
    pdf = df.select(*cols).orderBy("conv_id", "turn_idx").toPandas()
    if "ts" in pdf:
        pdf["ts"] = pd.to_datetime(pdf["ts"]).dt.strftime("%Y-%m-%d %H:%M:%S")
    return pdf.reset_index(drop=True)


def canon_oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    if "ts" in pdf:
        pdf["ts"] = pd.to_datetime(pdf["ts"]).dt.strftime("%Y-%m-%d %H:%M:%S")
    if "rating" in pdf:
        pdf["rating"] = pdf["rating"].astype("object").where(pdf["rating"].notna(), None)
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def run_batch_apply(spark, tmp_dir, events_pdf, files=6, bucket_count=8):
    stream_dir = os.path.join(tmp_dir, "stream")
    events_to_files(events_pdf, stream_dir, files=files)
    table = LakeTable.create(
        spark,
        os.path.join(tmp_dir, "table"),
        TARGET_SCHEMA,
        ["conv_id", "turn_idx"],
        bucket_count=bucket_count,
    )
    events = ChangeStream(spark, stream_dir).events()
    data, schema_ev = split_schema_events(events)
    apply_schema_events(table, schema_ev)
    deduped = lww_dedupe(data)
    res = merge_into(table, deduped, tag={"source_id": "t", "batch_id": 0})
    return table, res


@pytest.mark.parametrize("with_schema", [False, True])
def test_batch_apply_matches_oracle(spark, tmp_dir, with_schema):
    events = generate_change_events(n_events=4000, seed=42, with_schema_events=with_schema)
    table, res = run_batch_apply(spark, tmp_dir, events)
    assert res.snapshot is not None

    got = canon_spark(table.read_logical())
    want = canon_oracle(apply_events_pandas(events))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{len(got)} vs {len(want)}"
    # per-turn text equality under stable (conv_id, turn_idx) ordering —
    # the BASELINE.json input_hint invariant — plus full-row equality
    pd.testing.assert_frame_equal(
        got.astype("object").where(got.notna(), None),
        want.astype("object").where(want.notna(), None),
        check_dtype=False,
    )


def test_replay_is_noop(spark, tmp_dir):
    events = generate_change_events(n_events=1000, seed=42, with_schema_events=False)
    table, res1 = run_batch_apply(spark, tmp_dir, events)
    snap_before = table.current_snapshot().snapshot_id
    # replay the same batch with the same tag → must be skipped
    stream = ChangeStream(spark, os.path.join(tmp_dir, "stream"))
    deduped = lww_dedupe(stream.events().where(F.col("op") != "S"))
    res2 = merge_into(table, deduped, tag={"source_id": "t", "batch_id": 0})
    assert res2.strategy == "skipped-duplicate"
    assert table.current_snapshot().snapshot_id == snap_before


def test_deletes_remove_rows(spark, tmp_dir):
    events = generate_change_events(n_events=2000, seed=7, with_schema_events=False)
    assert (events["op"] == "D").any()
    table, _ = run_batch_apply(spark, tmp_dir, events)
    want = apply_events_pandas(events)
    assert table.read_logical().count() == len(want)
