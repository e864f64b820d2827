"""CDC-fed incremental near-dup signature index.

The invariant under test: after any sequence of base-table epochs
(inserts, updates, deletes) and index syncs, the index state equals a
FULL recompute of signatures from the base's current logical state —
while each sync only touches changed keys (exactly-once, order-aware,
bucket-pruned, inherited from merge_into).
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nvimagecodec_spark.functions.hashing import md5_hash32
from nvimagecodec_spark.lakehouse.table import LakeTable
from nvimagecodec_spark.operators.incremental_dedup import IncrementalDedupIndex
from nvimagecodec_spark.operators.lww import lww_dedupe
from nvimagecodec_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

N_HASHES = 4
SHINGLE_N = 2


def _batch(spark, rows, lsn0):
    """[(conv, turn, op, text)] → deduped change batch for merge_into."""
    data = [
        (c, t, op, lsn0 + i, f'{{"text": {_js(txt)}}}' if op != "D" else None)
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


def _js(s):
    import json

    return json.dumps(s)


def _full_recompute(idx, base):
    """Reference: signatures recomputed from the base's CURRENT state."""
    live = base.read_logical()
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    sh_expr = F.expr(
        f"transform(sequence(0, size(_toks) - {SHINGLE_N}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {SHINGLE_N})))"
    )
    sh = (
        live.select("conv_id", "turn_idx", toks.alias("_toks"))
        .where(F.size("_toks") >= SHINGLE_N)
        .select(
            "conv_id", "turn_idx", F.explode(F.array_distinct(sh_expr)).alias("shingle")
        )
    )
    sigs = sh.groupBy("conv_id", "turn_idx").agg(
        *[
            F.min(md5_hash32(F.col("shingle"), seed=s)).alias(f"mh{s}")
            for s in range(N_HASHES)
        ],
        F.count(F.lit(1)).cast("int").alias("n_shingles"),
    )
    return (
        live.select("conv_id", "turn_idx")
        .join(sigs, ["conv_id", "turn_idx"], "left")
        .withColumn("n_shingles", F.coalesce("n_shingles", F.lit(0)))
    )


def _rows(df):
    cols = ["conv_id", "turn_idx"] + [f"mh{i}" for i in range(N_HASHES)] + ["n_shingles"]
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.fixture()
def base_and_idx(spark, tmp_dir):
    base = LakeTable.create(
        spark, os.path.join(tmp_dir, "t"), SCHEMA, ["conv_id", "turn_idx"], bucket_count=4
    )
    idx = IncrementalDedupIndex.create(
        spark,
        os.path.join(tmp_dir, "idx"),
        base,
        n_hashes=N_HASHES,
        shingle_n=SHINGLE_N,
    )
    return base, idx


def test_initial_sync_builds_full_index(spark, base_and_idx):
    base, idx = base_and_idx
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "I", "the quick brown fox jumps"),
                ("a", 1, "I", "the quick brown fox leaps"),
                ("b", 0, "I", "completely different words here"),
                ("c", 0, "I", "tiny"),  # below shingle width → null sigs
            ],
            lsn0=10,
        ),
    )
    res = idx.sync(base)
    assert res.strategy not in ("noop", "skipped-duplicate")
    assert _rows(idx.signatures()) == _rows(_full_recompute(idx, base))
    short = idx.signatures().where("conv_id = 'c'").collect()[0]
    assert short["n_shingles"] == 0 and short["mh0"] is None


def test_update_delete_resyncs_only_changes(spark, base_and_idx):
    base, idx = base_and_idx
    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "I", "alpha beta gamma delta"),
                ("b", 0, "I", "epsilon zeta eta theta"),
                ("c", 0, "I", "iota kappa lambda mu"),
            ],
            lsn0=10,
        ),
    )
    idx.sync(base)
    before = {(r["conv_id"], r["turn_idx"]): r["mh0"] for r in idx.signatures().collect()}

    merge_into(
        base,
        _batch(
            spark,
            [
                ("a", 0, "U", "alpha beta gamma REPLACED"),
                ("b", 0, "D", None),
            ],
            lsn0=100,
        ),
    )
    res = idx.sync(base)
    got = _rows(idx.signatures())
    assert got == _rows(_full_recompute(idx, base))
    after = {(r["conv_id"], r["turn_idx"]): r["mh0"] for r in idx.signatures().collect()}
    assert ("b", 0) not in after  # deleted key's signature tombstoned
    assert after[("c", 0)] == before[("c", 0)]  # untouched key unchanged
    assert res.deletes == 1 and res.upserts == 1


def test_sync_is_exactly_once_and_cursor_advances(spark, base_and_idx):
    base, idx = base_and_idx
    merge_into(base, _batch(spark, [("a", 0, "I", "one two three four")], 10))
    head = base.current_snapshot().snapshot_id
    r1 = idx.sync(base)
    assert r1.snapshot is not None
    assert idx.last_synced_base_snapshot() == head
    # replaying the same sync is a tagged no-op; no state change
    snap = idx.table.current_snapshot().snapshot_id
    r2 = idx.sync(base, to_id=head)
    assert r2.strategy in ("noop", "skipped-duplicate")
    assert idx.table.current_snapshot().snapshot_id == snap
    # syncing backwards is refused
    merge_into(base, _batch(spark, [("a", 1, "I", "five six seven eight")], 20))
    idx.sync(base)
    with pytest.raises(ValueError):
        idx.sync(base, to_id=head)


def test_shrunk_text_overwrites_stale_signature(spark, base_and_idx):
    base, idx = base_and_idx
    merge_into(base, _batch(spark, [("a", 0, "I", "long enough for shingles")], 10))
    idx.sync(base)
    assert idx.signatures().collect()[0]["n_shingles"] > 0
    merge_into(base, _batch(spark, [("a", 0, "U", "short")], 100))
    idx.sync(base)
    row = idx.signatures().collect()[0]
    assert row["n_shingles"] == 0 and row["mh0"] is None


def test_pairs_finds_planted_near_dups(spark, base_and_idx):
    base, idx = base_and_idx
    merge_into(
        base,
        _batch(
            spark,
            [
                ("x", 0, "I", "the quick brown fox jumps over the lazy dog"),
                ("y", 0, "I", "the quick brown fox jumps over the lazy dog today"),
                ("z", 0, "I", "unrelated content about completely other topics entirely"),
            ],
            lsn0=10,
        ),
    )
    idx.sync(base)
    pairs = idx.pairs(rows_per_band=2).collect()
    keys = {tuple(sorted((r["doc_a"], r["doc_b"]))) for r in pairs}
    assert ("x|0", "y|0") in keys
    assert all("z|0" not in k for k in keys)


def test_reopen_from_path_restores_config(spark, base_and_idx, tmp_dir):
    base, idx = base_and_idx
    merge_into(base, _batch(spark, [("a", 0, "I", "persisted config check words")], 10))
    idx.sync(base)
    reopened = IncrementalDedupIndex(spark, os.path.join(tmp_dir, "idx"))
    assert reopened.n_hashes == N_HASHES
    assert reopened.shingle_n == SHINGLE_N
    assert reopened.text_col == "text"
    assert reopened.last_synced_base_snapshot() == idx.last_synced_base_snapshot()
    assert _rows(reopened.signatures()) == _rows(idx.signatures())


def test_first_sync_after_create_snapshot_expired(spark, base_and_idx):
    """A new index on an OLD table whose create snapshot was expired must
    bootstrap from the full state — diffing from the oldest retained
    snapshot would silently miss rows older than it."""
    base, idx = base_and_idx
    for i in range(4):
        merge_into(base, _batch(spark, [("a", i, "I", f"epoch {i} words here now")], 10 * (i + 1)))
    base.expire_snapshots(keep_last=2)
    assert base.history()[0].operation != "create"
    idx.sync(base)
    assert _rows(idx.signatures()) == _rows(_full_recompute(idx, base))
    assert idx.signatures().count() == 4
