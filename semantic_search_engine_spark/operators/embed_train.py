"""Corpus-trained word/document embeddings: PPMI + truncated SVD (X109).

The reference's ranking signal is a *trained* dense embedding
(``ml-model/app.py:59-90`` encodes with a sentence-transformer;
``data-pipeline/data_ingestion.py:179-218`` featurizes the corpus). This
sandbox has no model weights, but embeddings can be TRAINED from the
corpus itself with a fully public, deterministic method: build the
word-word PPMI matrix over sliding-window co-occurrences and factorize it
with truncated SVD (Levy & Goldberg, "Neural Word Embedding as Implicit
Matrix Factorization", NeurIPS 2014 — SGNS is implicitly this
factorization; Levy, Goldberg & Dagan, TACL 2015 for the PPMI-SVD
recipe). The result plugs into the existing embedding lifecycle: a
trained-embedding UDF with the same ``tf_map -> array<float>`` contract
as the hashing featurizer (operators/hybrid.py), so ``build_embeddings``,
the cosine path, IVF/PQ indexing, and hybrid RRF fusion all work
unchanged — the model-agnostic promise made there, now demonstrated with
a model trained by the engine itself.

Distribution (the 100-TB story):
* **Co-occurrence counting** is the heavy stage and is one Arrow-batched
  ``mapInPandas`` pass over ``doc_features.text`` with IN-BATCH partial
  aggregation (each batch emits its local (a,b)->count dict, so the
  shuffle carries at most |batch vocab|² rows per batch, typically far
  less) followed by one ``groupBy(a,b).sum`` — the same
  map-side-combine shape as every counting stage in this engine. The
  vocabulary is capped up front (``top_vocab`` terms by collection
  frequency from the already-built term_stats table — no extra corpus
  pass), which bounds the pair space to V².
* **PPMI** is pure JVM arithmetic: marginals come from the pair table
  itself (one groupBy + a broadcast join), so probabilities are exactly
  consistent with the counted events.
* **Factorization**: the PPMI matrix is V×V with V capped (default
  20k ⇒ 3.2 GB dense float64 worst case, and the positive-PMI matrix is
  sparse in practice); it is collected ONCE to the driver and decomposed
  with deterministic LAPACK SVD. ``max_vocab`` refuses silently-unscalable
  use (the same refusal discipline as prefix expansion X34): at web-scale
  vocabularies the public scale path is randomized block power iteration
  with Spark matmuls over the (a, b, ppmi) edge table — the driver then
  holds V×dim, never V×V. Documented, not needed at sandbox scale.

Determinism: token order, vocab cut (cf DESC, term ASC), LAPACK SVD, and
a per-column sign convention (largest-|component| entry positive) make
retraining bit-reproducible; ties in singular values are broken by the
deterministic input ordering.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..textproc import tokenize

COOC_SCHEMA = "a string, b string, cnt long"


def cooccurrence_counts(feats: DataFrame, vocab: list[str],
                        window: int = 5,
                        max_token_len: int = 64, min_token_len: int = 2,
                        analyzer: str = "simple") -> DataFrame:
    """Unordered sliding-window co-occurrence counts over ``text``.

    Emits folded pairs ``(a <= b, cnt)``: one event per (position i,
    position j) with 0 < j-i <= window and both terms in ``vocab``.
    Self-pairs (same term at two positions) count like any other. The
    per-batch dict aggregation keeps the shuffle bounded by the batch's
    distinct pair count, not its token count.

    Window semantics (ADVICE r3, documented choice): tokens are filtered
    to ``vocab`` BEFORE the window applies, so offsets index the
    vocab-filtered stream — two in-vocab terms separated by any number of
    out-of-vocab tokens still co-occur if within ``window`` SURVIVING
    positions. This is the word2vec convention (subsampled/OOV tokens
    vanish before windowing) and changes pair counts versus windowing
    over raw positions; choose ``vocab`` accordingly.
    """
    vset = frozenset(vocab)
    win = int(window)

    def count_batches(batches):
        for pdf in batches:
            c: Counter = Counter()
            for text in pdf["text"]:
                toks = [t for t in tokenize(text, max_token_len,
                                            min_token_len, analyzer)
                        if t in vset]
                n = len(toks)
                for i in range(n):
                    ti = toks[i]
                    for j in range(i + 1, min(i + win + 1, n)):
                        tj = toks[j]
                        c[(ti, tj) if ti <= tj else (tj, ti)] += 1
            if c:
                yield pd.DataFrame(
                    {"a": [p[0] for p in c],
                     "b": [p[1] for p in c],
                     "cnt": list(c.values())})

    return (feats.select("text").mapInPandas(count_batches,
                                             schema=COOC_SCHEMA)
            .groupBy("a", "b").agg(F.sum("cnt").alias("cnt")))


def ppmi_edges(cooc: DataFrame) -> DataFrame:
    """Positive PMI over the ORDERED event space derived from the folded
    pair counts (Levy & Goldberg's #(w,c) table: every unordered event
    contributes one (a,b) and one (b,a); a self-pair contributes two
    (a,a)). Marginals and the total come from the same table, so
    p(a,b), p(a), p(b) are exactly consistent. Returns (a, b, ppmi) with
    ppmi > 0 only — the zeros ARE the sparsity of the matrix.
    """
    ordered = (cooc.filter(F.col("a") != F.col("b"))
               .select("a", "b", "cnt")
               .unionByName(cooc.filter(F.col("a") != F.col("b"))
                            .select(F.col("b").alias("a"),
                                    F.col("a").alias("b"), "cnt"))
               .unionByName(cooc.filter(F.col("a") == F.col("b"))
                            .select("a", "b",
                                    (F.col("cnt") * 2).alias("cnt"))))
    marg = ordered.groupBy("a").agg(F.sum("cnt").alias("c_a"))
    total = ordered.agg(F.sum("cnt")).collect()[0][0]
    if total is None:  # no co-occurrences at all (tiny corpus / window)
        return ordered.select("a", "b", F.lit(0.0).alias("ppmi")).limit(0)
    out = (ordered
           .join(F.broadcast(marg), "a")
           .join(F.broadcast(marg.select(F.col("a").alias("b"),
                                         F.col("c_a").alias("c_b"))), "b")
           .select("a", "b",
                   F.log((F.col("cnt").cast("double") * F.lit(float(total)))
                         / (F.col("c_a").cast("double")
                            * F.col("c_b").cast("double"))).alias("pmi")))
    return (out.filter(F.col("pmi") > 0.0)
            .select("a", "b", F.col("pmi").alias("ppmi")))


def top_vocab_from_term_stats(term_stats: DataFrame, top_vocab: int
                              ) -> list[str]:
    """Deterministic vocabulary cut: top terms by collection frequency
    (cf DESC, term ASC) from the already-built term_stats table — the
    vocab costs a |terms|-row scan, never a corpus pass."""
    rows = (term_stats.select("term", "cf")
            .orderBy(F.desc("cf"), F.asc("term"))
            .limit(int(top_vocab)).collect())
    return [r["term"] for r in rows]


def train_svd_word_vectors(ppmi: DataFrame, dim: int,
                           max_vocab: int = 20_000
                           ) -> dict[str, np.ndarray]:
    """Factorize the PPMI edge table: W = U_d · sqrt(S_d) (Levy/Goldberg/
    Dagan's symmetric weighting). Collects the edges once; refuses above
    ``max_vocab`` — the driver-side V×V decomposition is a deliberate
    bound, and the web-scale path (distributed randomized SVD over the
    edge table) is documented in the module docstring.
    """
    edges = ppmi.select("a", "b", "ppmi").collect()
    terms = sorted({r["a"] for r in edges} | {r["b"] for r in edges})
    v = len(terms)
    if v == 0:
        return {}
    if v > max_vocab:
        raise ValueError(
            f"PPMI vocabulary {v} exceeds max_vocab={max_vocab}: the "
            "driver-side SVD is bounded by design — raise max_vocab "
            "deliberately or use a distributed factorization")
    idx = {t: i for i, t in enumerate(terms)}
    m = np.zeros((v, v), dtype=np.float64)
    for r in edges:
        m[idx[r["a"]], idx[r["b"]]] = r["ppmi"]
    d = min(int(dim), v)
    u, s, _ = np.linalg.svd(m, full_matrices=False)  # LAPACK: deterministic
    w = u[:, :d] * np.sqrt(s[:d])
    # sign convention: each column's largest-|component| entry positive
    for j in range(d):
        i = int(np.argmax(np.abs(w[:, j])))
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    if d < dim:  # degenerate tiny vocab: zero-pad to the requested dim
        w = np.hstack([w, np.zeros((v, dim - d))])
    return {t: w[idx[t]].copy() for t in terms}


def word_vectors_df(spark: SparkSession, wv: dict[str, np.ndarray]
                    ) -> DataFrame:
    """(term, vector array<float>) table form — persistable through the
    TableStore like any other artifact."""
    rows = [(t, [float(x) for x in v]) for t, v in sorted(wv.items())]
    return spark.createDataFrame(rows, "term string, vector array<float>")


def embed_tf_map_trained(tf_map: dict[str, int] | None,
                         wv: dict[str, np.ndarray], dim: int) -> np.ndarray:
    """One document's trained embedding: sublinear-tf-weighted sum of its
    terms' word vectors, accumulated in sorted-term order (bit-stable
    across map iteration orders — same discipline as the hashed
    featurizer). Out-of-vocabulary terms contribute nothing."""
    v = np.zeros(dim, dtype=np.float64)
    if not tf_map:
        return v
    for term in sorted(tf_map):
        tv = wv.get(term)
        if tv is not None:
            v += (1.0 + math.log(float(tf_map[term]))) * tv
    return v


def make_trained_embedding_udf(wv: dict[str, np.ndarray], dim: int):
    """tf_map -> array<float> pandas UDF with the SAME contract as
    ``hybrid.make_hashed_embedding_udf`` — the drop-in ``build_embeddings``
    swap the hybrid module's docstring promises. The word-vector dict
    rides the closure (Spark broadcasts it with the task binary; V·dim
    floats — the scale knob is ``top_vocab``)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def trained_embedding(tf_maps: pd.Series) -> pd.Series:
        return pd.Series(
            [embed_tf_map_trained(m, wv, dim).astype(np.float32)
             for m in tf_maps])

    return trained_embedding


def embed_query_trained(tokens: list[str], wv: dict[str, np.ndarray],
                        dim: int) -> list[float]:
    """Query-side probe under the trained model (float64, like the hashed
    probe — only document vectors round to float32 at rest)."""
    return list(embed_tf_map_trained(dict(Counter(tokens)), wv, dim))
