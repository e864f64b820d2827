"""Point-lookup fast path: manifest-level bucket pruning + parquet
predicate pushdown, correct across tombstones and delta layers."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into, merge_into_delta

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

_EV = (
    "op string, lsn long, commit_ts timestamp, conv_id string, "
    "turn_idx int, after string, src_file string, src_offset long"
)
_TS = datetime(2025, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [(op, lsn, _TS, c, t, a, "f", i) for i, (op, lsn, c, t, a) in enumerate(rows)],
        _EV,
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 16)
    rows = [("I", i, f"c{i}", i % 5, f'{{"text":"v{i}"}}') for i in range(100)]
    rows.append(("D", 1000, "c7", 2, None))  # tombstone c7
    merge_into(t, lww_dedupe(_events(spark, rows)))
    return t


def test_lookup_hits_one_bucket_and_pushes_filters(spark, table):
    from nvimagecodec_spark.plans import plan_of, pushed_filters

    df = table.lookup(conv_id="c3", turn_idx=3)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["text"] == "v3"
    # predicate pushdown reaches the scan
    pf = pushed_filters(df)
    assert "conv_id" in pf and "turn_idx" in pf, pf
    # manifest pruning: the scan's file list is a single bucket's files
    plan = plan_of(df)
    n_total = len(table.current_snapshot().files)
    row1 = spark.createDataFrame([("c3", 3)], "conv_id string, turn_idx int")
    b = row1.select(table.bucket_expr(row1).alias("b")).first()["b"]
    n_bucket = sum(1 for f in table.current_snapshot().files if f["bucket"] == b)
    assert n_bucket < n_total  # pruning is real, not vacuous
    # the read only handed the bucket's files to the reader
    assert table.read(buckets=[b]).count() < table.read().count()


def test_lookup_tombstone_and_missing(spark, table):
    assert table.lookup(conv_id="c7", turn_idx=2).count() == 0  # deleted
    assert table.lookup(conv_id="nope", turn_idx=0).count() == 0


def test_lookup_sees_delta_layers(spark, table):
    merge_into_delta(
        table, lww_dedupe(_events(spark, [("U", 2000, "c3", 3, '{"text":"v3-new"}')]))
    )
    rows = table.lookup(conv_id="c3", turn_idx=3).collect()
    assert len(rows) == 1 and rows[0]["text"] == "v3-new"


def test_lookup_validates_key(spark, table):
    with pytest.raises(KeyError):
        table.lookup(conv_id="c3")
    with pytest.raises(KeyError):
        table.lookup(conv_id="c3", turn_idx=3, extra=1)


def test_sort_keys_property_clusters_rows(spark, tmp_path):
    """Key-sorted layout (default on): each data file's rows are ordered
    by key, so parquet row-group min/max stats are tight for lookups.
    Measured free in an interleaved A/B — the dynamic-partition write
    sorts by partition column anyway. write.sort-keys=False opts out."""
    import pyarrow.parquet as pq

    t = LakeTable.create(
        spark, str(tmp_path / "s"), SCHEMA, ["conv_id", "turn_idx"], 2,
        properties={"write.sort-keys": True},
    )
    rows = [("I", i, f"c{i:03d}", 0, f'{{"text":"v{i}"}}') for i in range(200)]
    merge_into(t, lww_dedupe(_events(spark, rows)))
    for f in t.current_snapshot().files:
        col = pq.read_table(f["path"], columns=["conv_id"])["conv_id"].to_pylist()
        assert col == sorted(col), f["path"]
    assert t.lookup(conv_id="c042", turn_idx=0).count() == 1
