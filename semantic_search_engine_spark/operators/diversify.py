"""Result diversification — the post-retrieval step between ranking and
serving (or between retrieval and training-batch assembly): a top-N
pool that is all near-duplicates of one answer wastes its slots.

Two forms, matched to where they run:

- ``mmr_rerank``: Maximal Marginal Relevance (Carbonell & Goldstein
  1998) — greedy select argmax of ``lambda * relevance - (1-lambda) *
  max cosine to already-selected``. Greedy selection is inherently
  sequential, so it runs DRIVER-SIDE over the retrieved candidate pool
  — which is bounded by construction (a WAND/ANN top-N, N in the
  hundreds). Like ``term_vectors`` (X75), ``max_candidates`` refuses
  unbounded use instead of pretending to distribute an O(N*k) chain of
  data-dependent decisions; diversifying a BIG set is the other
  operator below.
- ``cluster_diverse_top_k``: the distributed form — round-robin across
  clusters (an IVF list id, a host, a language: any grouping column),
  i.e. every cluster's best result ranks before any cluster's second.
  Two window functions, no collects, works on 10^9-row candidate sets;
  it is the generalization of field collapsing (X48: collapse =
  round-robin truncated to rank 1).
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["mmr_rerank", "cluster_diverse_top_k"]


def mmr_rerank(candidates: DataFrame, k: int = 10,
               lambda_: float = 0.5, id_col: str = "doc_id",
               score_col: str = "score", emb_col: str = "embedding",
               max_candidates: int = 1000) -> list[tuple]:
    """Greedy MMR over a retrieved candidate pool: returns
    [(id, mmr_score, original_score), ...], length min(k, N), in
    selection order. ``lambda_=1`` reproduces the relevance order;
    ``lambda_=0`` is pure diversity. Rows with NULL embeddings are
    dropped (they cannot participate in the diversity term). Ties break
    on (score DESC, id ASC) — deterministic.
    """
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    rows = (candidates
            .filter(F.col(emb_col).isNotNull())
            .select(id_col, score_col, emb_col)
            .orderBy(F.desc(score_col), F.asc(id_col))
            .limit(max_candidates + 1).collect())
    if len(rows) > max_candidates:
        raise ValueError(
            f"mmr_rerank is a post-retrieval operator: got more than "
            f"max_candidates={max_candidates} candidates; retrieve a "
            f"bounded pool first (or use cluster_diverse_top_k for "
            f"set-scale diversification)")
    if not rows:
        return []
    ids = [r[id_col] for r in rows]
    rel = np.array([float(r[score_col]) for r in rows])
    emb = np.array([list(r[emb_col]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0.0] = 1.0          # zero vectors: cosine 0 to all
    unit = emb / norms[:, None]

    selected: list[int] = []
    out: list[tuple] = []
    max_sim = np.full(len(rows), -np.inf)
    remaining = set(range(len(rows)))
    for _ in range(min(k, len(rows))):
        best_i, best_key = None, None
        # candidates iterate in (score DESC, id ASC) order, so with a
        # strict > update the first-seen (highest-relevance, smallest
        # id) candidate wins MMR ties — deterministic
        for i in sorted(remaining):
            div = 0.0 if not selected else max(max_sim[i], 0.0)
            mmr = lambda_ * rel[i] - (1.0 - lambda_) * div
            if best_key is None or mmr > best_key:
                best_i, best_key = i, mmr
        selected.append(best_i)
        remaining.discard(best_i)
        out.append((ids[best_i], float(best_key), float(rel[best_i])))
        sims = unit @ unit[best_i]
        max_sim = np.maximum(max_sim, sims)
    return out


def cluster_diverse_top_k(candidates: DataFrame, k: int,
                          by: str, score_col: str = "score",
                          id_col: str = "doc_id",
                          per_cluster_cap: int | None = None
                          ) -> DataFrame:
    """Distributed diversity: interleave clusters round-robin — rank
    rows within each ``by`` group by (score DESC, id ASC), then take
    the global top-k ordered by (within-cluster rank ASC, score DESC,
    id ASC). Every non-empty cluster places its best before any
    cluster places its second. ``per_cluster_cap`` optionally bounds
    how many rows one cluster may contribute (cap=1 == field collapse).
    NULL cluster keys form their own cluster (they are still results).
    Pure window functions — no driver round-trips, scale-safe."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (Window.partitionBy(by)
         .orderBy(F.desc(score_col), F.asc(id_col)))
    ranked = candidates.withColumn("_cr", F.row_number().over(w))
    if per_cluster_cap is not None:
        ranked = ranked.filter(F.col("_cr") <= per_cluster_cap)
    return (ranked
            .orderBy(F.asc("_cr"), F.desc(score_col), F.asc(id_col))
            .limit(k)
            .withColumnRenamed("_cr", "cluster_rank"))
