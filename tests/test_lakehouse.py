import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import BUCKET_COL, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.IntegerType()),
    ]
)


def _mk(spark, tmp_dir, rows, buckets=4):
    t = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=buckets
    )
    if rows:
        t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_create_append_read(spark, tmp_dir):
    rows = [(f"c{i}", j, f"t{i}-{j}", i * j) for i in range(5) for j in range(3)]
    t = _mk(spark, tmp_dir, rows)
    got = t.read_logical().orderBy("conv_id", "turn_idx").collect()
    assert len(got) == 15
    assert got[0]["text"] == "t0-0"


def test_bucket_pruning_reads_only_touched_files(spark, tmp_dir):
    rows = [(f"c{i}", 0, "x", i) for i in range(50)]
    t = _mk(spark, tmp_dir, rows, buckets=8)
    all_buckets = {f["bucket"] for f in t.current_snapshot().files}
    assert len(all_buckets) > 1
    one = sorted(all_buckets)[0]
    df = t.read(buckets=[one])
    assert df.select(BUCKET_COL).distinct().collect() == [(one,)]
    # manifest pruning: the scan's file list only contains bucket files
    files_in_plan = df.inputFiles()
    assert all(f"_pb={one}" in f for f in files_in_plan)


def test_time_travel_and_overwrite(spark, tmp_dir):
    t = _mk(spark, tmp_dir, [("a", 1, "v1", 0)])
    s1 = t.current_snapshot().snapshot_id
    t.overwrite(spark.createDataFrame([("a", 1, "v2", 1)], SCHEMA))
    assert t.read_logical().collect()[0]["text"] == "v2"
    assert t.read_logical(snapshot_id=s1).collect()[0]["text"] == "v1"


def test_commit_tags_idempotence(spark, tmp_dir):
    t = _mk(spark, tmp_dir, [])
    tag = {"source_id": "s1", "batch_id": 7}
    assert not t.has_commit_tag("s1", 7)
    t.append(spark.createDataFrame([("a", 1, "x", 0)], SCHEMA), tag=tag)
    assert t.has_commit_tag("s1", 7)
    assert not t.has_commit_tag("s1", 8)
    assert not t.has_commit_tag("s2", 7)


def test_schema_evolution_read_old_files(spark, tmp_dir):
    t = _mk(spark, tmp_dir, [("a", 1, "hello", 5)])
    t.add_column("rating", "int")
    t.rename_column("text", "body")
    t.widen_column("score", "long")
    # old file readable: rating null-filled, text surfaced as body, score widened
    row = t.read_logical().collect()[0]
    assert row["body"] == "hello"
    assert row["rating"] is None
    assert row["score"] == 5
    assert dict(t.read_logical().dtypes)["score"] == "bigint"
    # new write under evolved schema; old + new files coexist
    t.append(
        spark.createDataFrame(
            [("b", 2, "world", 6, 4)],
            T.StructType(
                [
                    T.StructField("conv_id", T.StringType()),
                    T.StructField("turn_idx", T.IntegerType()),
                    T.StructField("body", T.StringType()),
                    T.StructField("score", T.LongType()),
                    T.StructField("rating", T.IntegerType()),
                ]
            ),
        )
    )
    got = {r["conv_id"]: r for r in t.read_logical().collect()}
    assert got["b"]["rating"] == 4 and got["b"]["body"] == "world"
    assert got["a"]["rating"] is None


def test_expire_snapshots(spark, tmp_dir):
    t = _mk(spark, tmp_dir, [("a", 1, "x", 0)])
    for i in range(5):
        t.overwrite(spark.createDataFrame([("a", 1, f"v{i}", i)], SCHEMA))
    removed = t.expire_snapshots(keep_last=2)
    assert removed > 0
    assert t.read_logical().collect()[0]["text"] == "v4"
