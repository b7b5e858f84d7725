"""Hybrid lexical+semantic retrieval: hashed document embeddings + RRF.

The reference is a *semantic* search service — its ranking signal is an
embedding cosine over pgvector (``ProductRepository.java:66-93``, probe
vector from ``ml-model/app.py:59-90``) while this engine's flagship path
is BM25. Production search stacks run BOTH and fuse them; this module
closes that loop with public, sandbox-honest building blocks:

* **Hashed embeddings** (the "hashing trick", Weinberger et al., ICML'09;
  scikit-learn's ``HashingVectorizer`` is the canonical implementation):
  each term hashes to one of ``dim`` slots with a ±1 sign bit, weighted by
  sublinear tf ``1 + ln(tf)``. No trained model, no vocabulary table, no
  network — deterministic and computable in one Arrow batch per partition.
  A real deployment swaps :func:`make_hashed_embedding_udf` for a model
  UDF (the reference's ``model.encode``) and NOTHING downstream changes:
  the table layout, the cosine path and the fusion are model-agnostic.
* **Reciprocal-rank fusion** (Cormack, Clarke & Buettcher, SIGIR'09):
  ``score(d) = Σ_paths w_path / (rrf_k + rank_path(d))``. Rank-only
  arithmetic — no score normalization across incomparable scales — and
  float-exact to reproduce (each doc receives ≤ one contribution per
  path, and IEEE addition of two terms is order-insensitive).

Scale notes (docs/SCALE.md): the embedding stage is one map-side pass
over ``doc_features`` (no shuffle — ``tf_map`` is already per-doc),
written partitioned by the same ``partition_id`` buckets, so the
semantic scan co-locates with every other per-doc table. The brute
cosine path reads exactly two columns (doc_id, emb) — at 10^12 docs the
scale path is an IVF over the same table (``operators/ann.IVFIndex``
accepts it verbatim via ``vec_id=doc_id``), probing ``n_probe/n_lists``
of the corpus; fusion cost is O(k_each) regardless.
"""

from __future__ import annotations

import math
import zlib
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: salt prepended for the sign hash so slot and sign are independent bits
_SIGN_SALT = b"\x01"


def term_slot_sign(term: str, dim: int) -> tuple[int, float]:
    """(slot, ±1.0) for one term — crc32 is stable across platforms and
    Python versions (zlib is part of the spec), unlike ``hash()``."""
    raw = term.encode("utf-8")
    slot = zlib.crc32(raw) % dim
    sign = 1.0 if zlib.crc32(_SIGN_SALT + raw) & 1 == 0 else -1.0
    return slot, sign


def embed_tf_map(tf_map: dict[str, int] | None, dim: int,
                 memo: dict | None = None) -> np.ndarray:
    """One document's raw (unnormalized) hashed embedding, float64.

    Accumulation runs in sorted-term order so the float result is
    independent of map iteration order — the Spark build and the Python
    oracle produce bit-identical vectors. Normalization is deliberately
    skipped: cosine is scale-invariant, and storing the raw fold keeps
    the float32 rounding step the ONLY lossy point.
    """
    v = np.zeros(dim, dtype=np.float64)
    if not tf_map:
        return v
    for term in sorted(tf_map):
        hit = memo.get(term) if memo is not None else None
        if hit is None:
            hit = term_slot_sign(term, dim)
            if memo is not None:
                memo[term] = hit
        slot, sign = hit
        v[slot] += sign * (1.0 + math.log(float(tf_map[term])))
    return v


def make_hashed_embedding_udf(dim: int):
    """tf_map -> array<float> pandas UDF (Arrow-batched; the per-batch
    term memo makes the hash cost ~O(unique terms), not O(occurrences))."""

    @pandas_udf("array<float>")
    def hashed_embedding(tf_maps: pd.Series) -> pd.Series:
        memo: dict[str, tuple[int, float]] = {}
        return pd.Series(
            [embed_tf_map(m, dim, memo).astype(np.float32)
             for m in tf_maps])

    return hashed_embedding


def embed_query_tokens(tokens: Iterable[str], dim: int) -> list[float]:
    """Query-side probe vector (float64 — only DOCUMENT vectors round to
    float32 at rest; the probe enters the plan as double literals)."""
    from collections import Counter

    return list(embed_tf_map(dict(Counter(tokens)), dim))


def rrf_fused_df(ranked: list[tuple[DataFrame, str, float]], k: int,
                 rrf_k: float = 60.0) -> DataFrame:
    """Fuse already-ranked paths. ``ranked``: (df, order_col, weight)
    triples where ``df`` is (doc_id, <order_col>) pre-limited to its
    path's k_each — tiny inputs, so the single-partition rank windows
    here are O(k_each), not a scale concern. Docs absent from a path
    contribute nothing for it (standard RRF)."""
    from pyspark.sql.window import Window

    parts = []
    for df, order_col, weight in ranked:
        if weight == 0.0:
            continue
        w = Window.orderBy(F.desc(order_col), F.asc("doc_id"))
        parts.append(
            df.select("doc_id", F.row_number().over(w).alias("rank"))
            .select("doc_id",
                    (F.lit(float(weight))
                     / (F.lit(float(rrf_k)) + F.col("rank")))
                    .alias("contrib"),
                    F.col("rank").alias("r"),
                    F.lit(order_col).alias("path")))
    if not parts:
        raise ValueError("rrf_fused_df needs at least one weighted path")
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (allp.groupBy("doc_id")
            .agg(F.sum("contrib").alias("rrf_score"),
                 F.min(F.when(F.col("path") == "score", F.col("r")))
                 .alias("lex_rank"),
                 F.min(F.when(F.col("path") == "cosine", F.col("r")))
                 .alias("sem_rank"))
            .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
            .limit(k))
