"""k-means IVF ANN: learned-centroid probing must recover most of the
brute-force top-k (recall check, not exact equality — ANN by design)."""

from nvimagecodec_spark.operators.similarity import cosine_topk, ivf_topk_kmeans


def test_ivf_kmeans_recall_vs_brute_force(spark):
    sf_dir = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = [r["vec_id"] for r in cosine_topk(emb, anchor_id=0, k=10).collect()]
    approx_rows = ivf_topk_kmeans(
        emb, anchor_id=0, k=10, n_cells=8, n_probe=3, seed=7
    ).collect()
    approx = [r["vec_id"] for r in approx_rows]
    assert len(approx) == 10
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"recall {recall}: exact={exact} approx={approx}"
    # scores must be true cosine values (descending)
    sims = [r["cos_sim"] for r in approx_rows]
    assert sims == sorted(sims, reverse=True)


def test_ivf_kmeans_deterministic(spark):
    sf_dir = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = [r["vec_id"] for r in ivf_topk_kmeans(emb, anchor_id=0, k=5, seed=7).collect()]
    b = [r["vec_id"] for r in ivf_topk_kmeans(emb, anchor_id=0, k=5, seed=7).collect()]
    assert a == b  # seeded k-means -> same index -> same answers
