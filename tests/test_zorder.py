"""Z-order clustering (compact/optimize zorder_by=): Morton-interleave
layout rewrite so per-file [min,max] prunes on EVERY clustered column.

Pinned here:
- interleave_bits is an exact Morton code on known inputs;
- after compact(zorder_by=["x","y"]), range_filters on x AND on y each
  skip files (inputFiles drops), with results identical to a full-scan
  filter — while the key-sorted baseline layout cannot skip on y;
- zorder_by validates column names and records stats for the clustered
  columns even when "write.stat-cols" doesn't list them.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.lakehouse.zorder import interleave_bits, zvalue_expr
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(3, 5)], "a long, b long")
    # morton(3, 5): a bits on even positions, b bits on odd:
    # a=011, b=101 -> bit0(a)=1,bit0(b)=1 -> 0b11; bit1(a)=1,bit1(b)=0 -> +0b0100
    # bit2(a)=0,bit2(b)=1 -> +0b100000 => 0b100111 = 39
    got = df.select(
        interleave_bits([F.col("a"), F.col("b")], bits=3).alias("z")
    ).first()["z"]
    assert got == 39
    # single column: identity
    got1 = df.select(interleave_bits([F.col("a")], bits=8).alias("z")).first()["z"]
    assert got1 == 3


def _grid_table(spark, tmp_dir, n=40, extra_props=None):
    """n x n grid of (x, y) points — independent dimensions, the worst
    case for single-key sorting."""
    props = {"write.max-records-per-file": "100"}
    props.update(extra_props or {})
    t = LakeTable.create(
        spark,
        os.path.join(tmp_dir, "t"),
        SCHEMA,
        ["id"],
        bucket_count=1,  # isolate the FILE-level story from bucket hashing
        properties=props,
    )
    rows = []
    i = 0
    for x in range(n):
        for y in range(n):
            rows.append((i, "I", i + 1, json.dumps({"x": x, "y": y})))
            i += 1
    ch = spark.createDataFrame(
        rows, "id long, op string, lsn long, after string"
    ).withColumns(
        {
            "commit_ts": F.lit("2026-01-01 00:00:00").cast("timestamp"),
            "src_file": F.lit("test"),
            "src_offset": F.col("lsn"),
        }
    )
    merge_into(t, lww_dedupe(ch, key_cols=["id"]))
    return t


def _files_read(t, col, lo, hi):
    df = t.read_logical(range_filters={col: (lo, hi)})
    return len(df.inputFiles()), df


def test_zorder_prunes_on_both_dims(spark, tmp_dir):
    t = _grid_table(spark, tmp_dir)
    snap = t.compact(zorder_by=["x", "y"])
    assert snap is not None and snap.summary["zorder_by"] == ["x", "y"]
    total_files = len({f["path"] for f in t.current_snapshot().files})
    assert total_files >= 8  # max-records-per-file split the bucket

    for col in ("x", "y"):
        n_files, df = _files_read(t, col, 0, 4)
        full = t.read_logical().where((F.col(col) >= 0) & (F.col(col) <= 4))
        assert n_files < total_files, f"no pruning on {col}"
        got = sorted(r["id"] for r in df.collect())
        want = sorted(r["id"] for r in full.collect())
        assert got == want


def test_keysorted_baseline_cannot_prune_second_dim(spark, tmp_dir):
    """Contrast case: the same grid compacted WITHOUT zorder (key-sorted
    by id, which tracks x) prunes on x but reads every file for a y
    predicate — the gap z-ordering exists to close."""
    t = _grid_table(
        spark, os.path.join(tmp_dir, "base"),
        extra_props={"write.stat-cols": "x,y"},
    )
    t.compact(max_files_per_bucket=0)
    total_files = len({f["path"] for f in t.current_snapshot().files})
    assert total_files >= 8
    n_files_y, _ = _files_read(t, "y", 0, 4)
    assert n_files_y == total_files  # id-sorted files all span full y range
    n_files_x, _ = _files_read(t, "x", 0, 4)
    assert n_files_x < total_files


def test_zorder_unknown_column_fails_loud(spark, tmp_dir):
    t = _grid_table(spark, os.path.join(tmp_dir, "bad"), n=5)
    with pytest.raises(ValueError, match="unknown column"):
        t.compact(zorder_by=["x", "nope"])


def test_zvalue_constant_and_null_columns(spark):
    df = spark.createDataFrame(
        [(1, 7, None), (2, 7, None)], "id long, c long, n string"
    )
    z = df.select(zvalue_expr(df, ["c", "n"]).alias("z")).collect()
    assert [r["z"] for r in z] == [0, 0]
