"""Persisted IVF index: build-once/query-many, cell-partition pruning in
the candidate scan, recall vs brute force (reference analog: pre_init
processor reuse, /root/reference/src/image_generic_codec.h:463-469)."""

import os

import pytest

from nvimagecodec_spark.operators.ivf_index import IvfIndex
from nvimagecodec_spark.operators.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    return IvfIndex.build(emb, path, n_cells=8, seed=7)


def test_build_layout_and_reload(spark, index):
    # generation layout: CURRENT pointer + immutable gen-NNNNNN directory
    with open(os.path.join(index.path, "CURRENT")) as f:
        assert f.read().strip() == index.gen
    assert os.path.exists(os.path.join(index.gen_path, "meta.json"))
    cells = os.listdir(os.path.join(index.gen_path, "assignments"))
    assert sum(1 for c in cells if c.startswith("cell=")) == 8
    again = IvfIndex.load(spark, index.path)
    assert again.meta["n_cells"] == 8
    assert len(again.centroids()) == 8


def test_candidate_scan_is_partition_pruned(spark, index):
    """The probed-cells scan must prune at the PARTITION level — the plan
    carries a PartitionFilters entry on `cell`, and the scan reads only
    the probed directories' files."""
    cand = index.candidates([1, 3])
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1]
    # distinct cells actually materialized == the probed ones
    got = {r["cell"] for r in cand.select("cell").distinct().collect()}
    assert got <= {1, 3}
    # and the file-level read is a strict subset of the index
    sel = cand.count()
    total = index.candidates(list(range(8))).count()
    assert 0 < sel < total


def test_query_reuses_index_no_retrain(spark, index):
    """Two queries against one handle: centroids hit the cached copy, and
    results are deterministic."""
    a = [r["vec_id"] for r in index.topk(anchor=0, k=5, n_probe=3).collect()]
    b = [r["vec_id"] for r in index.topk(anchor=0, k=5, n_probe=3).collect()]
    assert a == b and len(a) == 5


def test_recall_vs_brute_force(spark, index):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = [r["vec_id"] for r in cosine_topk(emb, anchor_id=0, k=10).collect()]
    approx = [r["vec_id"] for r in index.topk(anchor=0, k=10, n_probe=3).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"recall {recall}: exact={exact} approx={approx}"


def test_upsert_without_retrain(spark, tmp_path):
    """Incremental adds: new vectors land in their nearest cell's
    partition, become queryable, and never disturb existing rows."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IvfIndex.build(emb, str(tmp_path / "idx"), n_cells=8, seed=7)
    before = idx.candidates(list(range(8))).count()
    q_before = idx.assignment_quality()

    # planted copies of vec 0..9 shifted +0.05, new ids
    new = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"),
        "label",
        # keep array<float> so the appended files match the index schema
        F.transform("embedding", lambda x: (x.cast("double") + F.lit(0.05)).cast("float")).alias(
            "embedding"
        ),
    )
    added = idx.upsert(new)
    assert added == 10
    after = idx.candidates(list(range(8))).count()
    assert after == before + 10

    # a near-identical planted copy must now appear in anchor-0's top-k
    top = [r["vec_id"] for r in idx.topk(anchor=0, k=3, n_probe=3).collect()]
    assert 5_000_000 in top, top
    # quality signal stays finite and sane
    q_after = idx.assignment_quality()
    assert -1.0 <= q_after <= 1.0 and abs(q_after - q_before) < 0.2


def test_maybe_rebuild_on_drift(spark, tmp_path):
    """Scheduled-retrain policy: upserts that drift the corpus trigger a
    rebuild once quality crosses the threshold; the swap leaves a fully
    queryable index and quality recovers."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IvfIndex.build(emb, str(tmp_path / "idx"), n_cells=8, seed=7)
    q0 = idx.assignment_quality()

    # below current quality -> no-op
    assert idx.maybe_rebuild(min_quality=q0 - 0.05) is False

    # drift: a far-away synthetic cluster the trained centroids never saw
    drifted = emb.where(F.col("vec_id") < 200).select(
        (F.col("vec_id") + 9_000_000).alias("vec_id"),
        "label",
        F.transform(
            "embedding", lambda x: (x.cast("double") * -3.0 + F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    idx.upsert(drifted)
    q_drifted = idx.assignment_quality()
    assert q_drifted < q0

    total_before = idx.candidates(list(range(8))).count()
    gen_before = idx.gen
    # threshold above the drifted quality -> rebuild runs; grace=0 reaps
    # the retired generation immediately (no other readers in this test)
    assert idx.maybe_rebuild(min_quality=q_drifted + 1e-6, retire_grace_seconds=0) is True
    # pointer flipped to a new generation, retired one reaped
    assert idx.gen != gen_before
    assert not os.path.exists(os.path.join(idx.path, gen_before))
    assert not os.path.exists(idx.gen_path + ".tmp")
    # no rows lost, layout intact, handle refreshed, quality recovered
    assert idx.candidates(list(range(8))).count() == total_before
    assert len(idx.centroids()) == 8
    assert idx.assignment_quality() > q_drifted
    top = [r["vec_id"] for r in idx.topk(anchor=0, k=5, n_probe=3).collect()]
    assert len(top) == 5


def test_init_reaps_aged_orphan_generations(spark, tmp_path):
    """A crash after publishing gen-N leaves the retired gen-(N-1) (and a
    crashed build leaves a gen-*.tmp) on disk forever — __init__ on a
    whole index reaps AGED non-current generations and tmp leftovers. A
    RECENT sibling may be a concurrent rebuild's in-flight build or a
    retired snapshot still serving lazy frames, and must survive."""
    import shutil

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    path = str(tmp_path / "idx")
    first = IvfIndex.build(emb, path, n_cells=2, seed=7)
    # second generation becomes CURRENT; the first is now retired
    assert first.maybe_rebuild(min_quality=2.0) is True
    retired = os.path.join(path, "gen-000001")
    assert os.path.exists(retired)  # grace default keeps it for lazy frames
    # a recent-looking in-flight build next to it
    recent_tmp = os.path.join(path, "gen-000003.tmp")
    shutil.copytree(retired, recent_tmp)
    # age the WHOLE retired tree: the reaper gates on the newest mtime
    # found anywhere under the candidate (advisor-caught: nested parquet
    # writes don't refresh the top dir, so a top-dir-only gate could reap
    # a long-running rebuild mid-flight)
    old_age = __import__("time").time() - 48 * 3600
    for root, dirs, files in os.walk(retired):
        for name in [""] + files:
            os.utime(os.path.join(root, name) if name else root, (old_age, old_age))

    idx = IvfIndex.load(spark, path)
    assert not os.path.exists(retired)  # aged leak reaped
    assert os.path.exists(recent_tmp)  # in-flight-looking sibling untouched
    shutil.rmtree(recent_tmp, ignore_errors=True)
    assert len(idx.topk(anchor=int(emb.select("vec_id").first()[0]), k=3, n_probe=2).collect()) == 3


def test_reader_never_sees_missing_index_across_flips(spark, tmp_path):
    """Round-3 verdict #3, restated for the generation design: publication
    is ONE atomic pointer replace, so there is no path-not-found window at
    all. A flipper thread alternates CURRENT between two complete
    generations in a tight loop while fresh handles load and read — no
    retries, no failures (reference analog: result visibility synchronized
    before publish + concurrent access tests,
    /root/reference/test/api/concurrent_decode_test.cpp)."""
    import threading

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(80)
    path = str(tmp_path / "idx")
    idx0 = IvfIndex.build(emb, path, n_cells=2, seed=7)
    # a second complete generation to flip against (grace keeps gen 1)
    assert idx0.maybe_rebuild(min_quality=2.0) is True
    gens = ["gen-000001", "gen-000002"]
    anchor = emb.select(F.min("vec_id")).first()[0]

    stop = threading.Event()

    def flipper():
        i = 0
        while not stop.is_set():
            IvfIndex._flip_pointer(path, gens[i % 2])
            i += 1

    th = threading.Thread(target=flipper, daemon=True)
    th.start()
    try:
        for _ in range(15):
            idx = IvfIndex.load(spark, path)
            assert len(idx.centroids()) == 2
            vec = idx.anchor_vector(int(anchor))
            assert len(vec) > 0
    finally:
        stop.set()
        th.join(timeout=10)


def test_lazy_topk_frame_survives_concurrent_rebuild(spark, tmp_path):
    """Round-4 review finding: a topk() frame planned BEFORE a rebuild
    pins Spark's file index to the old files; the round-3 rename dance
    moved those paths away, so collecting the frame after the swap failed
    mid-job. Generations fix this structurally — the retired generation
    outlives the flip by the grace period, so the pre-flip frame collects
    cleanly against its snapshot."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    path = str(tmp_path / "idx")
    idx = IvfIndex.build(emb, path, n_cells=2, seed=7)
    anchor = int(emb.select("vec_id").first()[0])

    lazy = idx.topk(anchor=anchor, k=3, n_probe=2)  # planned pre-flip
    assert idx.maybe_rebuild(min_quality=2.0) is True  # flips CURRENT
    rows = lazy.collect()  # executes against the retired snapshot
    assert len(rows) == 3
    # and a frame from the refreshed handle reads the new generation
    assert len(idx.topk(anchor=anchor, k=3, n_probe=2).collect()) == 3


def test_reader_concurrent_with_real_rebuild(spark, tmp_path):
    """A real maybe_rebuild (k-means retrain + swap) runs while a reader
    loops over the retried read entry points — no reader ever fails, and
    the post-swap index answers queries."""
    import threading

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    path = str(tmp_path / "idx")
    writer_idx = IvfIndex.build(emb, path, n_cells=2, seed=7)

    reader_errs: list[BaseException] = []
    done = threading.Event()

    def reader():
        while not done.is_set():
            try:
                idx = IvfIndex.load(spark, path)
                q = idx.assignment_quality()  # full-scan retried entry point
                assert -1.0 <= q <= 1.0
            except BaseException as e:  # noqa: BLE001 — the assertion IS the test
                reader_errs.append(e)
                return

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    try:
        # min_quality above any possible cosine mean forces the rebuild
        assert writer_idx.maybe_rebuild(min_quality=2.0) is True
    finally:
        done.set()
        th.join(timeout=60)
    assert not reader_errs, reader_errs
    top = writer_idx.topk(anchor=int(emb.select("vec_id").first()[0]), k=3, n_probe=2).collect()
    assert len(top) == 3


def test_upsert_plan_never_shuffles_on_vector_column(spark, tmp_path):
    """Round-3 advice #8: the winning-cell argmax must group/shuffle on
    the ID only — round 2 grouped on every column including the
    array<double> vector, shuffling each vector n_cells times with
    float-array equality as the grouping semantics."""
    import re

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IvfIndex.build(emb, str(tmp_path / "idx"), n_cells=4, seed=7)
    new = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 9_000_000).alias("vec_id"), "label", "embedding"
    )
    # reproduce upsert's assignment plan and audit its exchanges
    cent_df = spark.createDataFrame(idx.centroids(), "cell int, centroid array<double>")
    from nvimagecodec_spark.functions.vectors import cosine

    assigned = (
        new.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent_df))
        .select("vec_id", "cell", cosine(F.col("embedding"), F.col("centroid")).alias("_sim"))
        .groupBy("vec_id")
        .agg(F.max_by("cell", "_sim").alias("cell"))
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    for part in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in part, part

    # end-to-end: planted vector lands in the right cell and is queryable
    assert idx.upsert(new) == 5
    top = [r["vec_id"] for r in idx.topk(anchor=0, k=3, n_probe=4).collect()]
    assert 9_000_000 in top, top
