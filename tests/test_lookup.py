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


def test_manifest_key_stats_recorded(spark, table):
    """Every data file's manifest entry carries [min,max] for both key
    columns (footer stats; key-sorted layout makes them tight)."""
    for f in table.current_snapshot().files:
        st = f.get("stats")
        assert st and "conv_id" in st and "turn_idx" in st, f
        lo, hi = st["conv_id"]
        assert isinstance(lo, str) and lo <= hi


def test_lookup_skips_files_inside_bucket(spark, tmp_path):
    """The round-3 point: a multi-file bucket with disjoint per-file key
    ranges (what compaction + maxRecordsPerFile produces at scale) must
    hand the scan exactly ONE file for a point lookup."""
    from nvimagecodec_spark.lakehouse.table import prune_files_by_key

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 1)
    # two appends -> two files in bucket 0 with disjoint conv_id ranges
    merge_into(t, lww_dedupe(_events(
        spark, [("I", i, f"a{i:03d}", 0, f'{{"text":"a{i}"}}') for i in range(50)])))
    merge_into_delta(t, lww_dedupe(_events(
        spark, [("I", 100 + i, f"z{i:03d}", 0, f'{{"text":"z{i}"}}') for i in range(50)])))
    files = t.current_snapshot().files
    assert len(files) == 2 and all(f["bucket"] == 0 for f in files)

    kept = prune_files_by_key(files, {"conv_id": "a007", "turn_idx": 0})
    assert len(kept) == 1 and kept[0]["stats"]["conv_id"][0].startswith("a")
    kept_z = prune_files_by_key(files, {"conv_id": "z007", "turn_idx": 0})
    assert len(kept_z) == 1 and kept_z[0]["stats"]["conv_id"][0].startswith("z")

    # end-to-end: lookups stay correct THROUGH the pruned read — including
    # the MoR reconcile path (the z-file is a delta layer) and misses
    assert t.lookup(conv_id="a007", turn_idx=0).collect()[0]["text"] == "a7"
    assert t.lookup(conv_id="z007", turn_idx=0).collect()[0]["text"] == "z7"
    assert t.lookup(conv_id="m500", turn_idx=0).count() == 0

    # a tombstone in a pruned-in delta file still suppresses the base row
    merge_into_delta(t, lww_dedupe(_events(spark, [("D", 999, "a007", 0, None)])))
    assert t.lookup(conv_id="a007", turn_idx=0).count() == 0


def test_stats_survive_manifest_roundtrip(spark, table, tmp_path):
    """Stats are persisted through the content-addressed manifests, not
    just the in-memory snapshot — a fresh handle sees them."""
    t2 = LakeTable.load(spark, table.path)
    for f in t2.current_snapshot().files:
        assert f.get("stats"), f


def test_bloom_skips_overlapping_delta_layers(spark, tmp_path):
    """Min/max ranges cannot skip MoR delta layers — every trickle batch
    spans the keyspace, so layer ranges all overlap. The per-file key
    bloom must prune layers that don't contain the key, while never
    producing a false negative (tombstones included)."""
    from nvimagecodec_spark.lakehouse.table import (
        bloom_might_contain,
        canonical_key,
        prune_files_by_key,
    )

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 1)
    merge_into(t, lww_dedupe(_events(
        spark, [("I", i, f"c{i:03d}", 0, f'{{"text":"base{i}"}}') for i in range(100)])))
    # two delta layers with fully OVERLAPPING ranges but disjoint members
    merge_into_delta(t, lww_dedupe(_events(spark, [
        ("U", 1001, "c001", 0, '{"text":"d1-a"}'),
        ("U", 1002, "c099", 0, '{"text":"d1-b"}'),
    ])))
    merge_into_delta(t, lww_dedupe(_events(spark, [
        ("U", 2001, "c000", 0, '{"text":"d2-a"}'),
        ("U", 2002, "c098", 0, '{"text":"d2-b"}'),
    ])))
    files = t.current_snapshot().files
    assert len(files) == 3
    # blooms on the delta layers only; the CoW base relies on its sorted
    # ranges (and commit-time bloom builds stay off the bulk hot path)
    assert all(f.get("bloom") for f in files if f.get("kind") == "delta")
    assert all("bloom" not in f for f in files if f.get("kind") != "delta")
    # ranges overlap: range pruning alone keeps all 3 for c001
    no_bloom = [{k: v for k, v in f.items() if k != "bloom"} for f in files]
    assert len(prune_files_by_key(no_bloom, {"conv_id": "c001", "turn_idx": 0})) == 3
    # bloom prunes the layer that can't contain the key
    ks = canonical_key(["c001", 0])
    kept = prune_files_by_key(files, {"conv_id": "c001", "turn_idx": 0}, ks)
    assert len(kept) == 2  # base + delta1; delta2 skipped
    deltas_kept = [f for f in kept if f.get("kind") == "delta"]
    assert len(deltas_kept) == 1
    assert bloom_might_contain(deltas_kept[0]["bloom"], ks)

    # end-to-end through the pruned read: winners, misses, tombstones
    assert t.lookup(conv_id="c001", turn_idx=0).collect()[0]["text"] == "d1-a"
    assert t.lookup(conv_id="c098", turn_idx=0).collect()[0]["text"] == "d2-b"
    assert t.lookup(conv_id="c050", turn_idx=0).collect()[0]["text"] == "base50"
    assert t.lookup(conv_id="zzz", turn_idx=0).count() == 0
    merge_into_delta(t, lww_dedupe(_events(spark, [("D", 3001, "c001", 0, None)])))
    assert t.lookup(conv_id="c001", turn_idx=0).count() == 0


def test_bloom_respects_opt_out_and_size_gate(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 1,
        properties={"write.key-bloom": False},
    )
    merge_into(t, lww_dedupe(_events(
        spark, [("I", i, f"c{i}", 0, '{"text":"v"}') for i in range(10)])))
    merge_into_delta(t, lww_dedupe(_events(
        spark, [("U", 100, "c1", 0, '{"text":"v2"}')])))
    assert all("bloom" not in f for f in t.current_snapshot().files)
    # pruning with a key string but no blooms keeps everything (no false negatives)
    from nvimagecodec_spark.lakehouse.table import canonical_key, prune_files_by_key

    kept = prune_files_by_key(
        t.current_snapshot().files, {"conv_id": "c1", "turn_idx": 0},
        canonical_key(["c1", 0]),
    )
    assert len(kept) == len(t.current_snapshot().files)


def test_bloom_size_gate(spark, tmp_path, monkeypatch):
    """Delta files ABOVE the row threshold get no bloom (ranges are the
    right tool there); files at/below it do."""
    import nvimagecodec_spark.lakehouse.table as tbl

    monkeypatch.setattr(tbl, "_BLOOM_MAX_ROWS", 3)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], 1)
    merge_into(t, lww_dedupe(_events(
        spark, [("I", i, f"c{i}", 0, '{"text":"v"}') for i in range(5)])))
    merge_into_delta(t, lww_dedupe(_events(  # 5 rows > 3 -> no bloom
        spark, [("U", 100 + i, f"c{i}", 0, '{"text":"w"}') for i in range(5)])))
    merge_into_delta(t, lww_dedupe(_events(  # 2 rows <= 3 -> bloom
        spark, [("U", 200, "c0", 0, '{"text":"x"}')])))
    by_rows = {f["rows"]: f for f in t.current_snapshot().files if f.get("kind") == "delta"}
    assert "bloom" not in by_rows[5]
    assert by_rows[1].get("bloom")
    assert t.lookup(conv_id="c0", turn_idx=0).collect()[0]["text"] == "x"
