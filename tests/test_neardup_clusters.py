"""Connected components over near-dup pair graphs (neardup_clusters):
transitive closure semantics the sf0.01 oracle fixture can't fully
exercise (its only size-3 cluster is a complete triangle), plus the
pointer-jumping convergence guarantee on a worst-case path graph."""

import pytest

from nvimagecodec_spark.operators.dedup import neardup_clusters


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_transitive_chain_collapses_to_one_cluster(spark):
    """A~B, B~C, C~D with NO direct A~C/A~D/B~D pairs must still land in
    one cluster labeled by the component min — the pair detector only
    guarantees a spanning set, never a clique."""
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    out = neardup_clusters(pairs, docs=_docs(spark, range(1, 13)))
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"], r["cluster_size"]) for r in out.collect()}
    for d in (1, 2, 3, 4):
        assert got[d] == (1, d == 1, 4)
    for d in (10, 11):
        assert got[d] == (10, d == 10, 2)
    # untouched docs are singleton canonicals
    for d in (5, 6, 7, 8, 9, 12):
        assert got[d] == (d, True, 1)


def test_pair_order_and_duplicates_do_not_matter(spark):
    """(a,b) vs (b,a) and repeated emissions (same pair from several LSH
    bands) must not change the labeling."""
    pairs = _pairs(spark, [(2, 1), (1, 2), (2, 3), (2, 3), (3, 2)])
    out = neardup_clusters(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_pointer_jumping_beats_diameter(spark):
    """A 64-node PATH graph (diameter 63): plain min-label propagation
    needs 63 rounds; pointer jumping doubles label reach per round, so a
    10-round budget only converges because the acceleration works."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(63)])
    out = neardup_clusters(pairs, max_rounds=10)
    rows = out.collect()
    assert len(rows) == 64
    assert {r["cluster_id"] for r in rows} == {0}
    assert sum(1 for r in rows if r["is_canonical"]) == 1
    assert all(r["cluster_size"] == 64 for r in rows)


def test_unconverged_raises_not_partial(spark):
    """Hitting the round budget must raise, never return partial labels
    (a half-propagated labeling silently under-merges duplicates)."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(40)])
    with pytest.raises(RuntimeError, match="converge"):
        neardup_clusters(pairs, max_rounds=2)
