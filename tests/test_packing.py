"""Greedy sequence packing: recurrence edges the sf0.01 oracle fixture
may not hit (oversized docs, exact-fit boundaries), shard isolation."""

import pytest

from nvimagecodec_spark.operators.packing import pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(rows, "shard long, doc_id long, n_tokens long")


def _packed(spark, rows, budget):
    out = pack_sequences(_df(spark, rows), budget=budget).collect()
    return {r["doc_id"]: (r["bin"], r["bin_fill"]) for r in out}


def test_greedy_recurrence_and_exact_fit(spark):
    # budget 10: [4, 6] fills bin 0 EXACTLY (fill+s > budget is strict),
    # then 5 opens bin 1, 5 fills it, 1 opens bin 2
    got = _packed(
        spark,
        [(0, 1, 4), (0, 2, 6), (0, 3, 5), (0, 4, 5), (0, 5, 1)],
        budget=10,
    )
    assert got == {1: (0, 4), 2: (0, 10), 3: (1, 5), 4: (1, 10), 5: (2, 1)}


def test_oversized_doc_gets_own_bin_never_dropped(spark):
    got = _packed(spark, [(0, 1, 3), (0, 2, 99), (0, 3, 3)], budget=10)
    assert got == {1: (0, 3), 2: (1, 99), 3: (2, 3)}
    # oversized FIRST doc also keeps bin 0 to itself
    got = _packed(spark, [(0, 1, 99), (0, 2, 3)], budget=10)
    assert got == {1: (0, 99), 2: (1, 3)}


def test_shards_pack_independently(spark):
    rows = [(s, s * 100 + i, 6) for s in range(3) for i in range(4)]
    out = pack_sequences(_df(spark, rows), budget=10).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["doc_id"], r["bin"]))
    for s, docs in by_shard.items():
        # 4 docs of 6 tokens @ budget 10 -> one bin each... no: 6+6>10,
        # so each doc opens its own bin: bins 0..3 in doc-id order
        assert sorted(docs) == [(s * 100 + i, i) for i in range(4)]


def test_budget_must_be_positive(spark):
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(_df(spark, [(0, 1, 1)]), budget=0)
