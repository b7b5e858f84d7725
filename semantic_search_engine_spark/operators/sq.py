"""Scalar quantization (int8) for embedding search — the quantization
Elasticsearch ships as its dense-vector DEFAULT (``int8_hnsw``: 4x
memory reduction, asymmetric distance, optional exact rescoring) and
FAISS calls ``SQ8``. Complements the PQ/IVFADC family (X54/X55): SQ is
the low-distortion / low-complexity end of the quantization spectrum —
per-DIMENSION linear codes instead of per-SUBSPACE codebooks, no
training beyond min/max statistics.

Design:
- ``fit``: per-dimension min/max over the corpus — ONE aggregation
  (`max(v[i])`/`min(v[i])` per dimension, map-side combined; dim
  columns fold into two array rows to the driver). No iterative
  training, no randomness: deterministic from the data.
- ``encode``: `code[i] = round((v[i] - min_i) / (max_i - min_i) * 255) - 128`
  clamped to [-128, 127] — a pure `transform` expression; codes are
  ``array<tinyint>`` (1 byte/dim vs 4: the 4x ES advertises).
- ``search``: ASYMMETRIC distance (the query stays float — ES/FAISS's
  ADC analogue for SQ): reconstruct each dimension on the fly inside
  the JVM expression (`min_i + (code+128)/255 * span_i`) and dot with
  the float probe; exact float rerank of the top ``rerank`` rows
  (ES's ``rescore_vector`` oversample) recovers brute-force order.

Scale notes (10^12 x dim-64 float32 = 256 TB of raw vectors):
- SQ8 cuts the scan to 64 TB and the reconstruct+dot stays inside
  whole-stage codegen — no Python, no shuffle; combine with the IVF
  list pruning (X19) for the scan-fraction lever (quantization and
  partition pruning are orthogonal).
- fit's min/max agg is one pass; at trillion scale fit on a sample —
  clamping makes out-of-range values saturate, not explode (tested).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SQCodebook", "fit_sq", "encode_sq", "sq_top_k"]


@dataclass(frozen=True)
class SQCodebook:
    mins: tuple[float, ...]
    maxs: tuple[float, ...]

    @property
    def dim(self) -> int:
        return len(self.mins)

    def spans(self) -> list[float]:
        # zero-span dims (constant column) encode to 0 and reconstruct
        # to the constant: span 1 avoids div-by-zero, code is always 0
        return [mx - mn if mx > mn else 1.0
                for mn, mx in zip(self.mins, self.maxs)]


def fit_sq(embeddings: DataFrame, vec_col: str = "embedding",
           dim: int | None = None) -> SQCodebook:
    """Per-dimension min/max in ONE aggregation; see module docstring."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    aggs = []
    for i in range(dim):
        v = F.col(vec_col)[i].cast("double")
        aggs += [F.min(v).alias(f"mn{i}"), F.max(v).alias(f"mx{i}")]
    row = embeddings.agg(*aggs).collect()[0]
    return SQCodebook(mins=tuple(float(row[f"mn{i}"]) for i in range(dim)),
                      maxs=tuple(float(row[f"mx{i}"]) for i in range(dim)))


def encode_sq(embeddings: DataFrame, book: SQCodebook,
              vec_col: str = "embedding",
              out_col: str = "code") -> DataFrame:
    """Add ``out_col`` = array<tinyint> codes (clamped — out-of-range
    values saturate, so a codebook fit on a sample stays safe)."""
    mins = F.array(*[F.lit(m) for m in book.mins])
    spans = F.array(*[F.lit(s) for s in book.spans()])
    idx = F.sequence(F.lit(0), F.lit(book.dim - 1))
    code = F.transform(idx, lambda i: F.least(
        F.lit(127), F.greatest(F.lit(-128), (F.round(
            (F.col(vec_col)[i].cast("double") - F.element_at(mins, i + 1))
            / F.element_at(spans, i + 1) * F.lit(255.0))
            - F.lit(128)).cast("int"))).cast("tinyint"))
    return embeddings.withColumn(out_col, code)


def sq_top_k(codes: DataFrame, book: SQCodebook, probe: list[float],
             k: int = 10, rerank: int = 0, key: str = "vec_id",
             code_col: str = "code", vec_col: str = "embedding",
             metric: str = "dot") -> DataFrame:
    """Top-k by asymmetric quantized similarity; with ``rerank`` >= k,
    the top ``rerank`` quantized candidates re-score with exact float
    cosine/dot (requires ``vec_col`` present) and the final order is
    the reranked one — ES's oversample-then-rescore shape.

    ``metric``: "dot" (quantized reconstruct-dot) or "cosine"
    (reconstruct-dot normalized by the reconstructed row norm)."""
    if metric not in ("dot", "cosine"):
        raise ValueError("metric must be 'dot' or 'cosine'")
    if len(probe) != book.dim:
        raise ValueError(f"probe dim {len(probe)} != codebook {book.dim}")
    mins = F.array(*[F.lit(m) for m in book.mins])
    spans = F.array(*[F.lit(s) for s in book.spans()])
    p = F.array(*[F.lit(float(x)) for x in probe])
    idx = F.sequence(F.lit(0), F.lit(book.dim - 1))
    recon = F.transform(idx, lambda i: F.element_at(mins, i + 1)
                        + (F.col(code_col)[i].cast("double") + F.lit(128.0))
                        / F.lit(255.0) * F.element_at(spans, i + 1))
    dot = F.aggregate(F.zip_with(recon, p, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    if metric == "cosine":
        rnorm = F.sqrt(F.aggregate(
            F.zip_with(recon, recon, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x))
        pnorm = math.sqrt(sum(x * x for x in probe)) or 1.0
        score = dot / (rnorm * F.lit(pnorm))
    else:
        score = dot
    scored = codes.withColumn("_q", score)
    if rerank and rerank >= k:
        from .ann import cosine_col
        cand = (scored.orderBy(F.desc("_q"), F.asc(key)).limit(rerank)
                .withColumn("_v", F.col(vec_col).cast("array<double>")))
        exact = (cosine_col("_v", probe) if metric == "cosine" else
                 F.aggregate(F.zip_with(
                     F.col("_v"),
                     F.array(*[F.lit(float(x)) for x in probe]),
                     lambda x, y: x * y), F.lit(0.0),
                     lambda acc, x: acc + x))
        return (cand.select(key, exact.alias("score"))
                .orderBy(F.desc("score"), F.asc(key)).limit(k))
    return (scored.select(key, F.col("_q").alias("score"))
            .orderBy(F.desc("score"), F.asc(key)).limit(k))
