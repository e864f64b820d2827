"""Iceberg metadata export: the written tree must be walkable by an
independent decoder — metadata.json → manifest-list Avro → manifest Avro
→ parquet — and the walked state must equal read_logical() exactly.

The OCF reader used here (read_ocf) shares no code with the writer's
encode path (mirror-image decoder, separately implemented), so a length
mis-encode, a wrong union index, or a bad sync marker fails the walk.
"""

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.iceberg_export import (
    export_iceberg_metadata,
    read_ocf,
    write_ocf,
)
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into, merge_into_delta

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _batch(spark, n, lsn0=0, op="I"):
    return lww_dedupe(
        spark.range(n).select(
            F.concat(F.lit("c"), (F.col("id") % 37).cast("string")).alias("conv_id"),
            (F.col("id") % 5).cast("int").alias("turn_idx"),
            F.lit(op).alias("op"),
            F.to_json(
                F.struct(
                    F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
                    F.lit("2026-01-02 03:04:05").alias("ts"),
                )
            ).alias("after"),
            (F.col("id") + lsn0).alias("lsn"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("commit_ts"),
            F.lit("f").alias("src_file"),
            F.col("id").alias("src_offset"),
        )
    )


def _mk(spark, tmp_dir, buckets=4):
    t = LakeTable.create(
        spark,
        os.path.join(tmp_dir, f"ice-{uuid.uuid4().hex[:6]}"),
        SCHEMA,
        ["conv_id", "turn_idx"],
        bucket_count=buckets,
    )
    merge_into(t, _batch(spark, 120))
    merge_into(t, _batch(spark, 40, lsn0=1000))  # updates
    # some tombstones: delete turn 4 of a few convs
    dels = _batch(spark, 10, lsn0=5000, op="D")
    merge_into(t, dels)
    return t


def test_ocf_round_trip_all_types(tmp_dir):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "b", "type": "boolean"},
            {"name": "n", "type": ["null", "long"]},
            {"name": "bs", "type": "bytes"},
            {
                "name": "rec",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }
    records = [
        {
            "s": "héllo",
            "i": -7,
            "l": 2**61,
            "b": True,
            "n": None,
            "bs": b"\x00\xff",
            "rec": {"x": 42},
            "arr": ["a", "bb", ""],
            "m": {"k1": 1, "k2": -(2**40)},
        },
        {
            "s": "",
            "i": 0,
            "l": -1,
            "b": False,
            "n": 99,
            "bs": b"",
            "rec": {"x": -1},
            "arr": [],
            "m": {},
        },
    ]
    p = os.path.join(tmp_dir, "t.avro")
    write_ocf(p, schema, records)
    got_schema, got = read_ocf(p)
    assert got_schema == schema
    assert got == records
    # determinism: same write → identical bytes
    p2 = os.path.join(tmp_dir, "t.avro")
    write_ocf(p2, schema, records)
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_metadata_json_structure(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    t.tag("release-1")
    mpath = export_iceberg_metadata(t)
    md = json.load(open(mpath))
    assert md["format-version"] == 2
    assert md["table-uuid"] == t.meta["table_uuid"]
    assert md["current-snapshot-id"] == t.current_snapshot().snapshot_id
    schema = md["schemas"][md["current-schema-id"]]
    names = {f["name"] for f in schema["fields"]}
    assert {"conv_id", "turn_idx", "text", "ts", "_sys_deleted", "_bucket"} <= names
    ids = [f["id"] for f in schema["fields"]]
    assert len(ids) == len(set(ids))  # unique field ids
    # identity partition on the materialized _bucket column
    spec = md["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "identity" and spec["name"] == "_bucket"
    assert spec["source-id"] in ids
    # refs: main branch + the tag
    assert md["refs"]["main"]["snapshot-id"] == md["current-snapshot-id"]
    assert md["refs"]["release-1"]["type"] == "tag"
    # snapshot lineage is chained
    snaps = {s["snapshot-id"]: s for s in md["snapshots"]}
    for s in md["snapshots"]:
        if "parent-snapshot-id" in s and s["parent-snapshot-id"] in snaps:
            assert snaps[s["parent-snapshot-id"]]["sequence-number"] < s["sequence-number"]


def test_full_walk_equals_read_logical(spark, tmp_dir):
    """The interop proof: walk metadata.json → manifest list → manifests
    → parquet with the documented logical-view filter, compare to
    read_logical()."""
    t = _mk(spark, tmp_dir)
    mpath = export_iceberg_metadata(t)
    md = json.load(open(mpath))
    head = next(
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, manifests = read_ocf(head["manifest-list"])
    paths, buckets = [], set()
    total_rows = 0
    for m in manifests:
        _, entries = read_ocf(m["manifest_path"])
        assert len(entries) == m["added_files_count"]
        for e in entries:
            df_ = e["data_file"]
            assert df_["file_format"] == "PARQUET"
            assert os.path.isfile(df_["file_path"])
            assert df_["file_size_in_bytes"] == os.path.getsize(df_["file_path"])
            paths.append(df_["file_path"])
            buckets.add(df_["partition"]["_bucket"])
            total_rows += df_["record_count"]
    # partition value must match the in-file _bucket column
    walked = spark.read.parquet(*paths)
    in_file_buckets = {r["_bucket"] for r in walked.select("_bucket").distinct().collect()}
    assert in_file_buckets == buckets
    assert walked.count() == total_rows  # manifest row counts are real
    # documented logical filter reproduces read_logical exactly
    lf = md["properties"]["engine.logical-view-filter"]
    got = sorted(
        map(
            str,
            walked.where(F.expr(lf))
            .select("conv_id", "turn_idx", "text")
            .collect(),
        )
    )
    want = sorted(
        map(str, t.read_logical().select("conv_id", "turn_idx", "text").collect())
    )
    assert got == want and len(want) > 0


def test_export_covers_time_travel_snapshots(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    hist = t.history()
    mid = hist[-2]
    mpath = export_iceberg_metadata(t)
    md = json.load(open(mpath))
    snap = next(
        (s for s in md["snapshots"] if s["snapshot-id"] == mid.snapshot_id), None
    )
    assert snap is not None
    _, manifests = read_ocf(snap["manifest-list"])
    paths = []
    for m in manifests:
        _, entries = read_ocf(m["manifest_path"])
        paths += [e["data_file"]["file_path"] for e in entries]
    walked = (
        spark.read.parquet(*paths)
        .where(F.expr(md["properties"]["engine.logical-view-filter"]))
        .select("conv_id", "turn_idx", "text")
    )
    want = t.read_logical(snapshot_id=mid.snapshot_id).select(
        "conv_id", "turn_idx", "text"
    )
    assert sorted(map(str, walked.collect())) == sorted(map(str, want.collect()))


def test_export_refuses_live_deltas(spark, tmp_dir):
    t = _mk(spark, tmp_dir)
    merge_into_delta(t, _batch(spark, 5, lsn0=9000))
    with pytest.raises(ValueError, match="delta"):
        export_iceberg_metadata(t)
    t.compact_deltas()
    assert export_iceberg_metadata(t, snapshots=1)
