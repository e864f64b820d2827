"""Persisted IVF (inverted-file) ANN index — build once, query many.

Round 1's ``ivf_topk_kmeans`` retrained k-means on every query; the
reference instantiates processors once and reuses them (``pre_init``,
/root/reference/src/image_generic_codec.h:463-469). Here the index is a
real on-disk artifact:

- ``assignments/``: every vector written ONCE, parquet **partitioned by
  cell** — a probe reads only the probed cells' directories (partition
  pruning in the scan, asserted in tests), so a 2-of-256-cell probe scans
  ~1/128th of a 10^10-vector corpus.
- ``centroids/``: n_cells rows (tiny). Loaded to the driver once per
  handle and reused across queries — choosing probe cells is an O(cells)
  dot-product loop, not a Spark job.
- ``meta.json``: build parameters, for reproducibility checks.

All heavy math stays JVM-side (pyspark.ml k-means, column-expression
cosine); the only driver-side work is the centroid probe.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nvimagecodec_spark.functions.vectors import cosine


def _newest_mtime(path: str) -> float:
    """Newest mtime anywhere under `path` (advisor-caught: a rebuild writes
    parquet into nested assignments/cell=*/ subdirs, which does NOT refresh
    the top directory's mtime — age-gating on the top dir alone could reap
    a >24h-running rebuild mid-flight and fail its final rename)."""
    newest = 0.0
    for root, _dirs, files in os.walk(path):
        try:
            newest = max(newest, os.path.getmtime(root))
        except OSError:
            pass
        for fn in files:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(root, fn)))
            except OSError:
                pass
    return newest


class IvfIndex:
    """Handle to a persisted IVF index (see module docstring)."""

    # reader-side retry budget for the brief path-not-found window between
    # maybe_rebuild's two renames (see _with_swap_retry). Backoff doubles
    # per attempt: FIXED intervals can phase-lock with a periodic swapper
    # (observed in the race test) — growing ones cannot.
    SWAP_RETRY_ATTEMPTS = 6
    SWAP_RETRY_SLEEP = 0.05  # first backoff; doubles each attempt (~1.6s total)

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        # crash recovery for maybe_rebuild's two-rename swap: a crash
        # between the renames leaves the complete OLD index at .retired
        # (or the complete NEW one at .rebuild) and nothing at self.path —
        # restore rather than fail the load. A CONCURRENT swapper mid-window
        # looks identical for a few ms, so probe for the index re-appearing
        # before concluding it crashed (same retry budget as reads).
        if not os.path.exists(os.path.join(self.path, "meta.json")):
            import time

            healed = False
            for attempt in range(self.SWAP_RETRY_ATTEMPTS):
                if attempt:
                    time.sleep(self.SWAP_RETRY_SLEEP * (2 ** (attempt - 1)))
                if os.path.exists(os.path.join(self.path, "meta.json")):
                    healed = True  # a live swapper finished its second rename
                    break
            if not healed:
                for cand in (self.path + ".rebuild", self.path + ".retired"):
                    if os.path.exists(os.path.join(cand, "meta.json")):
                        try:
                            os.rename(cand, self.path)
                        except OSError:
                            # a racing healer/swapper beat us; fall through to
                            # the meta.json open below, which retries too
                            pass
                        break
        else:
            # the index at self.path is whole — an OLD sibling is a
            # leftover of a crash AFTER the swap completed (e.g. between
            # the second rename and the rmtree of the retired copy) and
            # would leak a full index copy forever. Age-gated like
            # remove_orphans: a RECENT sibling may be a concurrent
            # maybe_rebuild's in-flight build (its .rebuild exists while
            # the main index is still whole) — never touched.
            import shutil
            import time

            cutoff = time.time() - 24 * 3600
            for cand in (self.path + ".rebuild", self.path + ".retired"):
                # age = NEWEST mtime anywhere under the tree, not the top
                # dir's: nested parquet writes don't refresh the top dir,
                # so a long-running rebuild would look stale while its
                # leaf files are seconds old (advisor-caught)
                if os.path.exists(cand) and _newest_mtime(cand) < cutoff:
                    shutil.rmtree(cand, ignore_errors=True)
        self.meta = self._with_swap_retry(
            lambda: json.load(open(os.path.join(self.path, "meta.json")))
        )
        self._centroids: list[tuple[int, list[float]]] | None = None

    def _with_swap_retry(self, fn):
        """Run ``fn``, retrying across maybe_rebuild's swap window.

        The two-rename swap leaves a few-ms gap where ``self.path`` holds
        nothing (and a slightly longer one where a scan pinned to retired
        files fails mid-job). Reference analog: result visibility is
        synchronized across streams before publishing
        (/root/reference/src/image_generic_codec.h:605-638) and exercised
        concurrently (/root/reference/test/api/concurrent_decode_test.cpp);
        a filesystem index can't block publication, so readers absorb the
        window with a bounded retry instead.
        """
        import time

        last: Exception | None = None
        for attempt in range(self.SWAP_RETRY_ATTEMPTS):
            if attempt:
                time.sleep(self.SWAP_RETRY_SLEEP * (2 ** (attempt - 1)))
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — classify, re-raise if unrelated
                msg = str(e)
                transient = isinstance(e, (FileNotFoundError, OSError)) or any(
                    s in msg
                    for s in (
                        "PATH_NOT_FOUND",
                        "FileNotFoundException",
                        "does not exist",
                        # a listing that races the rename can also surface as
                        # an empty-directory schema-inference failure
                        "UNABLE_TO_INFER_SCHEMA",
                    )
                )
                if not transient:
                    raise
                last = e
        raise last  # pragma: no cover — loop always raises or returns

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        path: str,
        n_cells: int = 16,
        seed: int = 7,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        path = os.path.abspath(path)
        feats = embeddings.withColumn("_features", array_to_vector(F.col(vec_col)))
        model = KMeans(
            k=n_cells, seed=seed, featuresCol="_features", predictionCol="cell"
        ).fit(feats)
        assigned = model.transform(feats).drop("_features")
        # one shuffle clusters rows by cell so each partition directory is
        # a few well-formed files, and the layout IS the pruning index
        (
            assigned.repartition(n_cells, F.col("cell"))
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(os.path.join(path, "assignments"))
        )
        spark = embeddings.sparkSession
        cent_rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        spark.createDataFrame(cent_rows, "cell int, centroid array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        meta = {
            "n_cells": n_cells,
            "seed": seed,
            "id_col": id_col,
            "vec_col": vec_col,
            "dim": len(cent_rows[0][1]) if cent_rows else 0,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(spark, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfIndex":
        return cls(spark, path)

    # ------------------------------------------------------------------ query
    def centroids(self) -> list[tuple[int, list[float]]]:
        if self._centroids is None:
            rows = self._with_swap_retry(
                lambda: self.spark.read.parquet(
                    os.path.join(self.path, "centroids")
                ).collect()
            )
            self._centroids = sorted((r["cell"], list(r["centroid"])) for r in rows)
        return self._centroids

    def probe_cells(self, anchor: list[float], n_probe: int) -> list[int]:
        """Nearest-centroid cells by cosine — driver-side O(cells * dim)."""
        anorm = math.sqrt(sum(x * x for x in anchor)) or 1.0
        scored = []
        for cell, c in self.centroids():
            cnorm = math.sqrt(sum(x * x for x in c)) or 1.0
            dot = sum(a * b for a, b in zip(anchor, c))
            scored.append((-dot / (anorm * cnorm), cell))
        return [cell for _, cell in sorted(scored)[:n_probe]]

    def candidates(self, cells: list[int]) -> DataFrame:
        """Cell-pruned scan: only the probed cells' partition directories
        are read (PartitionFilters on `cell` — asserted in tests). The
        parquet open (file listing + schema) is swap-retried; the returned
        frame is lazy, so callers executing across a mid-job swap go
        through a retried entry point (topk/assignment_quality) instead."""
        df = self._with_swap_retry(
            lambda: self.spark.read.parquet(os.path.join(self.path, "assignments"))
        )
        return df.where(F.col("cell").isin([int(c) for c in cells]))

    def anchor_vector(self, anchor_id: int) -> list[float]:
        vec_col, id_col = self.meta["vec_col"], self.meta["id_col"]
        row = self._with_swap_retry(
            lambda: self.spark.read.parquet(os.path.join(self.path, "assignments"))
            .where(F.col(id_col) == anchor_id)
            .select(vec_col)
            .first()
        )
        if row is None:
            raise KeyError(f"no vector with {id_col}={anchor_id}")
        return [float(x) for x in row[0]]

    # ------------------------------------------------------------- maintain
    def upsert(self, embeddings: DataFrame) -> int:
        """Incrementally add vectors to the index WITHOUT retraining:
        each new vector is assigned to its nearest existing centroid
        (one narrow crossJoin against the broadcast centroid table +
        max_by — no Python rows, no k-means) and appended to that cell's
        partition directory. Returns the number of vectors added.

        Centroids drift as data drifts; `assignment_quality()` exposes
        the mean vector→centroid similarity so callers can schedule a
        rebuild when it degrades (the reference's processor-reuse model:
        cheap incremental use of a once-built artifact,
        /root/reference/src/image_generic_codec.h:463-469).
        """
        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        cent_rows = self.centroids()
        cent_df = self.spark.createDataFrame(
            cent_rows, "cell int, centroid array<double>"
        )
        # Winning cell per vector WITHOUT grouping on the vector column:
        # the cross-join rows carry only (id, sim, cell) — the narrow
        # argmax groups/shuffles on the id, and the full vectors join back
        # by id afterwards. Grouping on an array<double> key (the round-2
        # shape) shuffled every vector n_cells times and made equality of
        # float arrays the grouping semantics — fragile and wasteful.
        assigned = (
            embeddings.select(id_col, vec_col)
            .crossJoin(F.broadcast(cent_df))
            .select(
                F.col(id_col),
                F.col("cell"),
                cosine(F.col(vec_col), F.col("centroid")).alias("_sim"),
            )
            .groupBy(id_col)
            .agg(F.max_by("cell", "_sim").alias("cell"))
        )
        out = embeddings.join(assigned, id_col)
        n = out.count()
        (
            out.repartition(self.meta["n_cells"], F.col("cell"))
            .write.partitionBy("cell")
            .mode("append")
            .parquet(os.path.join(self.path, "assignments"))
        )
        return n

    def assignment_quality(self) -> float:
        """Mean cosine(vector, its cell centroid) over the whole index —
        the rebuild-scheduling signal (drops as upserted data drifts)."""
        vec_col = self.meta["vec_col"]
        cent_df = self.spark.createDataFrame(
            self.centroids(), "cell int, centroid array<double>"
        )
        row = self._with_swap_retry(
            lambda: self.spark.read.parquet(os.path.join(self.path, "assignments"))
            .join(F.broadcast(cent_df), "cell")
            .select(cosine(F.col(vec_col), F.col("centroid")).alias("_sim"))
            .agg(F.avg("_sim"))
            .first()
        )
        return float(row[0])

    def maybe_rebuild(self, min_quality: float, seed: int | None = None) -> bool:
        """Drift-triggered retrain (the scheduled-rebuild half of index
        maintenance; ``upsert`` is the cheap incremental half): when
        ``assignment_quality()`` has degraded below ``min_quality``,
        retrain k-means over the full current vector set into a sibling
        directory, then swap it in with a rename dance. ``self.path``
        never holds a HALF-written index; there is, however, a brief
        window between the two renames where it holds nothing — every
        eager read entry point (``centroids``/``candidates``/
        ``anchor_vector``/``assignment_quality``/``load``) absorbs it
        with a bounded retry (``_with_swap_retry``, race-tested in
        tests/test_ivf_index.py), and a crash inside the window is healed
        on the next ``load``/``__init__`` (the complete old or new index
        is restored from the ``.retired``/``.rebuild`` sibling). Returns
        True iff a rebuild ran; this handle refreshes itself, other
        handles should re-``load``.

        The quality check is one broadcast-join aggregate; callers can
        run this after every N upserts as a cheap scheduling policy.
        """
        if self.assignment_quality() >= min_quality:
            return False
        import shutil

        vectors = self.spark.read.parquet(
            os.path.join(self.path, "assignments")
        ).drop("cell")
        new_path, old_path = self.path + ".rebuild", self.path + ".retired"
        shutil.rmtree(new_path, ignore_errors=True)
        shutil.rmtree(old_path, ignore_errors=True)
        IvfIndex.build(
            vectors,
            new_path,
            n_cells=self.meta["n_cells"],
            seed=self.meta["seed"] if seed is None else seed,
            id_col=self.meta["id_col"],
            vec_col=self.meta["vec_col"],
        )
        os.rename(self.path, old_path)
        os.rename(new_path, self.path)
        shutil.rmtree(old_path, ignore_errors=True)
        with open(os.path.join(self.path, "meta.json")) as f:
            self.meta = json.load(f)
        self._centroids = None
        return True

    def topk(
        self, anchor: list[float] | int, k: int = 10, n_probe: int = 2
    ) -> DataFrame:
        """ANN top-k by cosine: probe -> cell-pruned exact search."""
        if isinstance(anchor, int):
            anchor_vec = self.anchor_vector(anchor)
            exclude_id: int | None = anchor
        else:
            anchor_vec, exclude_id = list(anchor), None
        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        cells = self.probe_cells(anchor_vec, n_probe)
        cand = self.candidates(cells)
        if exclude_id is not None:
            cand = cand.where(F.col(id_col) != exclude_id)
        anchor_col = F.array(*[F.lit(float(x)) for x in anchor_vec])
        scored = cand.select(
            F.col(id_col),
            F.col("cell"),
            F.round(cosine(F.col(vec_col), anchor_col), 4).alias("cos_sim"),
        )
        return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
