"""Approximate nearest-neighbor search over an embedding column.

Two tiers (the task's similarity-search ladder):

* :func:`brute_force_top_k` — exact cosine top-k via JVM array expressions
  (``zip_with`` + ``aggregate``); the correctness baseline, O(n) per query.
* :class:`IVFIndex` — inverted-file ANN: k-means-style centroids
  (deterministic seeded init, fixed Lloyd iterations), vectors assigned to
  their nearest centroid list, queries probe only the ``n_probe`` nearest
  lists. The Spark shape: centroids are a broadcast-sized driver array,
  assignment is one job over the corpus, a query is a pruned scan of the
  probed lists. ``n_probe = n_lists`` degrades to exact search (tested).

Scale: at 10^9+ vectors the assignment job shuffles (vec_id, list_id)
pairs only; the vectors stay partitioned by list for locality
(``repartition(n_lists, "list_id")`` on write) so a query's probed-list
scan is partition-pruned.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(vec_col: str, probe: list[float]):
    """Cosine(vec_col, literal probe) as a pure JVM column expression."""
    p = F.array(*[F.lit(float(x)) for x in probe])
    return _dot(F.col(vec_col), p) / (_norm(F.col(vec_col)) * _norm(p))


def brute_force_top_k(embeddings: DataFrame, probe: list[float], k: int = 10,
                      key: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (key, cosine), ties broken by key ascending."""
    e = embeddings.select(key, F.col(vec_col).cast("array<double>")
                          .alias("v"))
    return (e.select(key, cosine_col("v", probe).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(key)).limit(k))


class IVFIndex:
    """Inverted-file ANN index. Deterministic: seeded centroid init (the
    ``n_lists`` rows with smallest ``xxhash64(key, seed)``), fixed Lloyd
    iteration count, ties in assignment broken by list id."""

    def __init__(self, spark: SparkSession, centroids: np.ndarray,
                 assignments: DataFrame, key: str, vec_col: str):
        self.spark = spark
        self.centroids = centroids            # (n_lists, dim) float64
        self.assignments = assignments        # (key, list_id, v)
        self.key = key
        self.vec_col = vec_col

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, spark: SparkSession, embeddings: DataFrame,
              n_lists: int = 16, n_iters: int = 3, seed: int = 42,
              key: str = "vec_id", vec_col: str = "embedding") -> "IVFIndex":
        e = (embeddings
             .select(key, F.col(vec_col).cast("array<double>").alias("v"))
             .cache())
        # deterministic init: smallest seeded hash of the key
        init = (e.withColumn("h", F.xxhash64(F.col(key), F.lit(seed)))
                .orderBy("h").limit(n_lists).select("v").collect())
        centroids = np.array([r["v"] for r in init], dtype=np.float64)

        for _ in range(n_iters):
            assigned = cls._assign(e, centroids)
            rows = (assigned.groupBy("list_id")
                    .agg(*[F.avg(F.element_at("v", i + 1)).alias(f"c{i}")
                           for i in range(centroids.shape[1])])
                    .collect())
            nxt = centroids.copy()  # empty lists keep their old centroid
            for r in rows:
                nxt[int(r["list_id"])] = [
                    r[f"c{i}"] for i in range(centroids.shape[1])]
            centroids = nxt

        assignments = cls._assign(e, centroids) \
            .repartition(max(len(centroids), 1), "list_id")
        return cls(spark, centroids, assignments, key, vec_col)

    # ------------------------------------------------------------------
    @staticmethod
    def _assign(e: DataFrame, centroids: np.ndarray) -> DataFrame:
        """argmin_j ||v - c_j||² via the expanded form -2·v·c_j + |c_j|²
        (|v|² is constant per row). Centroid literals are broadcast-sized
        column expressions — no UDF, whole-stage codegen applies."""
        scores = []
        for j, c in enumerate(centroids):
            cl = F.array(*[F.lit(float(x)) for x in c])
            d = -2.0 * _dot(F.col("v"), cl) + float(np.dot(c, c))
            scores.append(F.struct(d.alias("d"),
                                   F.lit(j).cast("int").alias("j")))
        best = F.array_min(F.array(*scores))
        return e.withColumn("list_id", best["j"])

    # ------------------------------------------------------------------
    def search(self, probe: list[float], k: int = 10,
               n_probe: int = 4) -> DataFrame:
        """Top-k within the n_probe nearest lists: (key, cosine)."""
        p = np.asarray(probe, dtype=np.float64)
        d2 = ((self.centroids - p) ** 2).sum(axis=1)
        probe_lists = [int(j) for j in np.argsort(d2, kind="stable")
                       [:n_probe]]
        cand = self.assignments.filter(F.col("list_id").isin(probe_lists))
        return (cand.select(self.key, cosine_col("v", probe).alias("cosine"))
                .orderBy(F.desc("cosine"), F.asc(self.key)).limit(k))

    def recall_at_k(self, embeddings: DataFrame, probe: list[float],
                    k: int = 10, n_probe: int = 4) -> float:
        exact = {r[self.key] for r in brute_force_top_k(
            embeddings, probe, k, self.key, self.vec_col).collect()}
        approx = {r[self.key] for r in self.search(probe, k,
                                                   n_probe).collect()}
        return len(exact & approx) / max(len(exact), 1)
