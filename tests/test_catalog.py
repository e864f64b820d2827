"""SQL catalog bridge (catalog.py): LakeTables queryable by name."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark import catalog
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


def test_register_query_and_refresh(spark, tmp_dir):
    t = LakeTable.create(
        spark, os.path.join(tmp_dir, "conv"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    merge_into(t, _batch(spark, [("a", 0, "I", "one"), ("b", 0, "I", "two")]))
    catalog.register(spark, "conv", t)
    got = spark.sql("SELECT count(*) AS n FROM conv").first()["n"]
    assert got == 2
    # the view pins registration-time state; refresh re-pins
    merge_into(t, _batch(spark, [("c", 0, "I", "three")], lsn0=100))
    assert spark.sql("SELECT count(*) AS n FROM conv").first()["n"] == 2
    catalog.refresh(spark, "conv", t)
    assert spark.sql("SELECT count(*) AS n FROM conv").first()["n"] == 3
    # joins across registered views work like any SQL
    catalog.register(spark, "conv_v1", t, snapshot_id=t.history()[1].snapshot_id)
    n = spark.sql(
        "SELECT count(*) AS n FROM conv LEFT ANTI JOIN conv_v1 USING (conv_id, turn_idx)"
    ).first()["n"]
    assert n == 1  # only the row added after v1
    spark.catalog.dropTempView("conv")
    spark.catalog.dropTempView("conv_v1")


def test_register_all_mounts_directory(spark, tmp_dir):
    for name in ["alpha", "beta"]:
        t = LakeTable.create(
            spark, os.path.join(tmp_dir, name), SCHEMA, ["conv_id", "turn_idx"]
        )
        merge_into(t, _batch(spark, [(name, 0, "I", name)]))
    os.makedirs(os.path.join(tmp_dir, "not_a_table"))
    mounted = catalog.register_all(spark, tmp_dir)
    assert sorted(mounted) == ["alpha", "beta"]
    assert spark.sql("SELECT text FROM alpha").first()["text"] == "alpha"
    assert spark.sql("SELECT text FROM beta").first()["text"] == "beta"
    for v in mounted:
        spark.catalog.dropTempView(v)
