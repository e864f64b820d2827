"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The scale contracts:

- **exact_dedup**: one hash-groupBy — map-side combinable, single shuffle
  of (hash → min id), never materializes full duplicate groups.
- **minhash_signatures**: one pass over exploded shingles, the H per-seed
  minima computed as H parallel partial-aggregated mins (no crossJoin, no
  per-row Python). Signatures are tiny (H longs/doc).
- **lsh candidate pairs**: banding turns O(n²) similarity search into
  groupBy(band value) — only docs agreeing on a full band ever meet,
  which is the published MinHash-LSH recipe (Broder; MMDS ch.3).
- **ngram_jaccard_pairs**: exact verify step — run on LSH candidates at
  scale; the all-pairs form here is for small corpora / the oracle.

Hashes are md5-derived (functions/hashing.py) so the DuckDB oracle can
reproduce every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nvimagecodec_spark.functions.compat import round4
from nvimagecodec_spark.functions.hashing import md5_hash32, normalize_text


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: normalized-content hash → keeper id + group size."""
    h = F.md5(normalize_text(F.col(text_col)))
    return (
        docs.groupBy(h.alias("content_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct n-word shingles per document: (id, shingle)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    sh = F.expr(
        f"transform(sequence(0, size(_toks) - {n}), i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
    )
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc: columns mh0..mh{H-1} (portable md5 hashes)."""
    sh = shingles(docs, n=shingle_n, text_col=text_col, id_col=id_col)
    aggs = [
        F.min(md5_hash32(F.col("shingle"), seed=s)).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ≥1 full band.

    Output: (doc_a, doc_b, n_bands) with doc_a < doc_b.
    """
    parts = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        parts.append(
            signatures.select(
                F.col(id_col).alias("doc"),
                F.lit(b).alias("band"),
                F.concat_ws(":", *[F.col(c).cast("string") for c in cols]).alias("bkey"),
            )
        )
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    ``candidates`` (doc_a, doc_b) restricts the work to an LSH candidate
    set — the scale path; without it this is all-pairs-sharing-a-shingle
    (fine for oracle-sized corpora; still never a cartesian product).
    """
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is not None:
        # Gate BEFORE the shingle join: shared-shingle counts are computed
        # ONLY for candidate pairs (round 1 computed the full all-pairs
        # join and filtered afterwards — no scale win at all). Two equi-
        # joins: shingles -> candidate pair -> other side's shingles; at
        # 10^10 docs the candidate set shuffles on doc id, never on pairs.
        cand = candidates.select("doc_a", "doc_b")
        shared = (
            sh.alias("a")
            .join(cand, F.col(f"a.{id_col}") == F.col("doc_a"))
            .join(
                sh.alias("b"),
                (F.col(f"b.{id_col}") == F.col("doc_b"))
                & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        shared = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            round4(F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_shared", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash over whitespace tokens (portable md5-based bit hashes).

    Per bit i, sum +1/-1 over token hashes; bit set if the sum is
    positive. Pure conditional aggregation — map-side combinable, one
    shuffle, reproducible in the SQL oracle via the same arithmetic.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = docs.select(F.col(id_col), F.explode(toks).alias("tok"))
    h = md5_hash32(F.col("tok"), seed=99)
    bit_sums = [
        F.sum(
            F.when((F.floor(h / F.lit(float(2**i))) % 2) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(bits)
    ]
    sums = exploded.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"_b{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else (sig + term)
    return sums.select(F.col(id_col), sig.alias("simhash"))


def neardup_clusters(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components over a near-dup pair graph → cluster labels.

    Pair detectors (LSH banding, gated Jaccard, SimHash radius) emit
    PAIRS; a dedupe pipeline needs CLUSTERS — transitively-connected
    groups with one canonical keeper each (A~B and B~C must collapse to
    one group even when A~C was never emitted). Output: one row per doc
    in ``docs`` (or per doc appearing in ``pairs`` if ``docs`` is None)
    with ``cluster_id`` = the smallest doc id in its component,
    ``is_canonical`` = this doc IS that keeper, and ``cluster_size``.

    Algorithm: min-label propagation with POINTER JUMPING. Each round
    runs (1) a neighbor-min step — every node takes the smallest label
    among itself and its neighbors (one |E|-sized equi-join + map-side-
    combinable min agg) — and (2) a pointer-jump step — every node then
    takes its label's label (one |V|-sized self-join), which doubles the
    distance a label travels per round. Convergence is therefore
    O(log(diameter)) rounds, not O(diameter); LSH near-dup components
    are shallow (near-cliques per band bucket), so 3-4 rounds is
    typical. Each round ends in ``localCheckpoint`` — the iterative plan
    would otherwise grow without bound and re-execute from the source
    every round (the standard Spark iterative-algorithm contract, same
    reason GraphX materializes each superstep). The per-round
    convergence check is one bounded count, not a collect of labels.

    100-TB shape: every step shuffles on ids only (longs), never on
    text/payloads; |E| from banded LSH is O(n·dups) not O(n²); rounds
    are logarithmic. Raises RuntimeError if ``max_rounds`` is hit
    without convergence rather than returning partial labels.

    Reference analog: batched sample grouping before per-batch dispatch
    (/root/reference/src/image_generic_codec.h:687-708) — group
    membership is resolved once, downstream operators consume groups.
    """
    sym = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    edges = sym.localCheckpoint()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )

    for _ in range(max_rounds):
        # (1) neighbor min: smallest label visible across one hop
        nbr = (
            edges.join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("dlabel")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("nlabel"))
        )
        stepped = labels.join(
            nbr.select(F.col("src").alias("node"), "nlabel"), "node", "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                "label"
            ),
        )
        # (2) pointer jump: follow my label's label (doubles reach/round)
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("node").alias("pnode"), F.col("label").alias("plabel")
                ).alias("p"),
                F.col("x.label") == F.col("p.pnode"),
                "left",
            )
            .select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.label"), F.coalesce(F.col("p.plabel"), F.col("x.label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_rounds} rounds"
        )

    out = labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))
    if docs is not None:
        # singletons: docs untouched by any pair form their own cluster
        out = (
            docs.select(id_col)
            .join(out, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
            )
        )
    sizes = out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return out.join(sizes, "cluster_id").select(
        F.col(id_col),
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
        "cluster_size",
    )
