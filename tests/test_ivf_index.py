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
    assert os.path.exists(os.path.join(index.path, "meta.json"))
    cells = os.listdir(os.path.join(index.path, "assignments"))
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
