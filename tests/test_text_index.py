"""Incrementally-maintained inverted text index (operators/text_index.py).

The invariant under test: after any sequence of base-table epochs
(inserts, text-changing updates, deletes) and index syncs, the posting
table equals a FULL recompute of (term, doc-key) postings from the
base's current logical state — while each sync only touches changed
docs and the index stays a one-bucket read per term (bucket_cols
subset bucketing, LakeTable.create(bucket_cols=["term"])).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into
from nvimagecodec_spark.operators.text_index import IncrementalTextIndex

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows, lsn0):
    """[(conv, turn, op, text)] → deduped change batch for merge_into."""
    data = [
        (c, t, op, lsn0 + i, json.dumps({"text": txt}) if op != "D" else None)
        for i, (c, t, op, txt) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, op string, lsn long, after string"
    ).withColumns(
        {
            "commit_ts": F.lit("2026-01-01 00:00:00").cast("timestamp"),
            "src_file": F.lit("test"),
            "src_offset": F.col("lsn"),
        }
    )
    return lww_dedupe(df)


def _truth(base):
    """Full recompute: distinct (term, conv_id, turn_idx) over live docs."""
    live = base.read_logical()
    terms = F.array_distinct(
        F.filter(
            F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+"),
            lambda t: t != "",
        )
    )
    rows = (
        live.select("conv_id", "turn_idx", F.explode(terms).alias("term"))
        .select("term", "conv_id", "turn_idx")
        .collect()
    )
    return {(r.term, r.conv_id, r.turn_idx) for r in rows}


def _state(idx):
    rows = idx.table.read_logical().collect()
    return {(r.term, r.conv_id, r.turn_idx) for r in rows}


@pytest.fixture()
def base_and_idx(spark, tmp_dir):
    base = LakeTable.create(
        spark,
        os.path.join(tmp_dir, "base"),
        SCHEMA,
        ["conv_id", "turn_idx"],
        bucket_count=4,
    )
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "I", "the quick brown fox"),
                ("a", 1, "I", "jumps over the lazy dog"),
                ("b", 0, "I", "pack my box with five dozen jugs"),
                ("c", 0, "I", None),  # null text → zero postings
            ],
            lsn0=0,
        ),
    )
    idx = IncrementalTextIndex.create(
        spark, os.path.join(tmp_dir, "idx"), base, text_col="text", bucket_count=8
    )
    return base, idx


def test_bucket_cols_must_be_key_subset(spark, tmp_dir):
    with pytest.raises(ValueError, match="subset of key_cols"):
        LakeTable.create(
            spark,
            os.path.join(tmp_dir, "bad"),
            SCHEMA,
            ["conv_id", "turn_idx"],
            bucket_cols=["text"],
        )


def test_bucket_cols_defaults_to_key_cols(spark, tmp_dir):
    t = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"]
    )
    assert t.bucket_cols == ["conv_id", "turn_idx"]
    # legacy metadata without the field reads as full-key bucketing
    del t.meta["bucket_cols"]
    assert t.bucket_cols == ["conv_id", "turn_idx"]


def test_initial_sync_matches_full_recompute(base_and_idx):
    base, idx = base_and_idx
    idx.sync(base)
    assert _state(idx) == _truth(base)
    # the null-text doc contributed nothing
    assert not any(k[1] == "c" for k in _state(idx))


def test_incremental_update_delete_and_rebirth(spark, base_and_idx):
    base, idx = base_and_idx
    idx.sync(base)
    # epoch 2: update a/0 (drops 'quick brown', adds 'red'), delete a/1,
    # doc c/0 gains text (null → terms), new doc d/0
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "U", "the red fox"),
                ("a", 1, "D", None),
                ("c", 0, "U", "hello world"),
                ("d", 0, "I", "world peace"),
            ],
            lsn0=100,
        ),
    )
    r = idx.sync(base)
    assert r.strategy != "noop"
    truth = _truth(base)
    assert _state(idx) == truth
    # old-only terms of the updated doc are gone, deleted doc fully retracted
    assert ("quick", "a", 0) not in truth
    assert not any(k[1] == "a" and k[2] == 1 for k in truth)
    # epoch 3: update doc text → null (all postings must retract)
    merge_into(base, _batch(spark, [("c", 0, "U", None)], lsn0=200))
    idx.sync(base)
    assert _state(idx) == _truth(base)
    assert not any(k[1] == "c" for k in _state(idx))


def test_resync_same_head_is_noop_and_replay_safe(base_and_idx):
    base, idx = base_and_idx
    idx.sync(base)
    before = _state(idx)
    r = idx.sync(base)
    assert r.strategy == "noop"
    assert _state(idx) == before
    # replaying the same target id through the tag gate is also a no-op
    r2 = idx.sync(base, to_id=base.current_snapshot().snapshot_id)
    assert r2.strategy in ("noop", "skipped-duplicate")
    assert _state(idx) == before


def test_sync_target_older_than_cursor_raises(spark, base_and_idx):
    base, idx = base_and_idx
    idx.sync(base)
    cursor = idx.last_synced_base_snapshot()
    merge_into(base, _batch(spark, [("z", 0, "I", "late arrival")], lsn0=300))
    with pytest.raises(ValueError, match="older than last synced"):
        idx.sync(base, to_id=cursor - 1)


def test_term_lookup_is_one_bucket_and_correct(spark, base_and_idx):
    base, idx = base_and_idx
    idx.sync(base)
    # postings('the') — docs a/0 and a/1 contain 'the'
    got = {(r.conv_id, r.turn_idx) for r in idx.postings("the").collect()}
    assert got == {("a", 0), ("a", 1)}
    # subset bucketing puts EVERY posting of a term in one bucket: the
    # pruned one-bucket read equals the unpruned read for that term
    probe = spark.createDataFrame([("the",)], "term string")
    b = probe.select(idx.table.bucket_expr(probe).alias("b")).first()["b"]
    pruned = {
        (r.conv_id, r.turn_idx)
        for r in idx.table.read_logical(buckets=[b])
        .where(F.col("term") == "the")
        .collect()
    }
    assert pruned == got
    # and the index genuinely spreads across buckets (pruning non-trivial):
    # the postings read scans strictly fewer files than the full index
    all_files = {f["path"] for f in idx.table.current_snapshot().files}
    bucket_files = {
        f["path"] for f in idx.table.current_snapshot().files if f["bucket"] == b
    }
    assert len(bucket_files) < len(all_files)


def test_doc_frequency(base_and_idx):
    base, idx = base_and_idx
    idx.sync(base)
    df = {r.term: r.df for r in idx.doc_frequency().collect()}
    assert df["the"] == 2
    assert df["fox"] == 1
    truth = _truth(base)
    for term, n in df.items():
        assert n == sum(1 for k in truth if k[0] == term)


def test_bootstrap_after_create_snapshot_expired(spark, tmp_dir):
    base = LakeTable.create(
        spark,
        os.path.join(tmp_dir, "base"),
        SCHEMA,
        ["conv_id", "turn_idx"],
        bucket_count=4,
    )
    merge_into(base, _batch(spark, [("a", 0, "I", "first epoch words")], lsn0=0))
    merge_into(base, _batch(spark, [("b", 0, "I", "second epoch words")], lsn0=10))
    merge_into(base, _batch(spark, [("c", 0, "I", "third epoch words")], lsn0=20))
    base.expire_snapshots(keep_last=2)
    assert base.history()[0].operation != "create"
    idx = IncrementalTextIndex.create(
        spark, os.path.join(tmp_dir, "idx"), base, text_col="text"
    )
    idx.sync(base)
    # rows older than the oldest retained snapshot are still indexed
    assert _state(idx) == _truth(base)
    assert any(k[1] == "a" for k in _state(idx))


def test_create_rejects_missing_text_col(spark, tmp_dir):
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "base"), SCHEMA, ["conv_id", "turn_idx"]
    )
    with pytest.raises(ValueError, match="no column"):
        IncrementalTextIndex.create(
            spark, os.path.join(tmp_dir, "idx"), base, text_col="body"
        )
