"""Named snapshot refs (tags): time travel by name + retention pinning."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows, lsn0=0):
    data = [
        (c, t, op, lsn0 + i, json.dumps({"text": txt}) if op != "D" else None)
        for i, (c, t, op, txt) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, op string, lsn long, after string"
    ).withColumns(
        {
            "commit_ts": F.lit("2026-01-01 00:00:00").cast("timestamp"),
            "src_file": F.lit("t"),
            "src_offset": F.col("lsn"),
        }
    )
    return lww_dedupe(df)


@pytest.fixture()
def table(spark, tmp_dir):
    t = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    merge_into(t, _batch(spark, [("a", 0, "I", "v1")]))
    return t


def test_tag_read_and_drop(spark, table):
    v1 = table.tag("baseline")
    merge_into(table, _batch(spark, [("a", 0, "U", "v2"), ("b", 0, "I", "new")], lsn0=100))
    assert table.refs() == {"baseline": v1}
    by_ref = {(r.conv_id, r.turn_idx): r.text for r in table.read_logical(ref="baseline").collect()}
    assert by_ref == {("a", 0): "v1"}
    head = {(r.conv_id, r.turn_idx): r.text for r in table.read_logical().collect()}
    assert head[("a", 0)] == "v2" and ("b", 0) in head
    with pytest.raises(ValueError, match="not both"):
        table.read(ref="baseline", snapshot_id=v1)
    with pytest.raises(KeyError):
        table.read_logical(ref="nope")
    table.drop_tag("baseline")
    assert table.refs() == {}
    with pytest.raises(KeyError):
        table.drop_tag("baseline")


def test_tag_pins_snapshot_through_expiry(spark, table):
    v1 = table.tag("audit-2026q1")
    for i in range(5):
        merge_into(table, _batch(spark, [("a", 0, "U", f"v{i+2}")], lsn0=100 + 10 * i))
    table.expire_snapshots(keep_last=2)
    # the tagged snapshot survived expiry and still reads
    kept_ids = {s.snapshot_id for s in table.history()}
    assert v1 in kept_ids
    assert [r.text for r in table.read_logical(ref="audit-2026q1").collect()] == ["v1"]
    # untagged: expiry drops it and by-id read fails afterwards
    table.drop_tag("audit-2026q1")
    table.expire_snapshots(keep_last=2)
    assert v1 not in {s.snapshot_id for s in table.history()}
    with pytest.raises(KeyError):
        table.snapshot(v1)


def test_tag_unknown_snapshot_rejected(spark, table):
    with pytest.raises(KeyError):
        table.tag("ghost", snapshot_id=9999)
