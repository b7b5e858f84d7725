"""Hard-negative mining for retrieval-model training data (X117).

The training-data half of the reference's ranking stack: its bi-encoder
(``ml-model/app.py:59-90``) and any cross-encoder second stage (X116)
are trained on (query, positive, negative) triples, and the published
recipe — DPR (Karpukhin '20), sentence-transformers' MS-MARCO training,
RocketQA — mines the NEGATIVES from the retriever itself: the
top-ranked documents the current system returns that are NOT judged
relevant are exactly the confusable examples the next model must learn
to push down. This module turns the engine's own ranked output plus a
judgment table into that dataset, as pure DataFrame algebra.

Inputs follow :mod:`.rank_eval`'s conventions exactly, so one batch
ranking job (``QueryEngine.batch_wand_top_k_df`` — a million queries in
one job, X13) feeds BOTH evaluation and mining:

``results``   — (query_id, doc_id, rank) 1-based, or (query_id, doc_id,
                score) with rank derived per query by (score DESC,
                doc_id ASC), the engine's own tie-break.
``judgments`` — (query_id, doc_id, grade); ``grade >= rel_threshold``
                is relevant. Docs absent from judgments are UNRATED —
                by default they are fair game as negatives (the DPR
                setting: sparse judgments, retrieved-but-unjudged is
                assumed negative), but ``skip_unjudged_top`` can hold
                out the very top ranks where unjudged docs are most
                likely false negatives (the RocketQA denoising
                observation).

Scale notes (10^9 queries × depth-k results)
--------------------------------------------
ONE shuffle keyed by ``query_id`` pays for everything, exactly as in
rank_eval: the rank window, the judgment anti/semi joins (co-partitioned
on query_id), the per-query negative cap, and the final positives join
all reuse that partitioning. query_id is high-cardinality and uniform —
no salt needed; every group is ≤ depth rows. The triples join fans out
to |positives| × n_neg rows per query — bounded by construction, and the
fan-out happens AFTER both sides are reduced (≤ n_neg negatives, judged
positives only), never on the raw ranked output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hard_negatives", "rekey_judgments", "training_triples"]


def rekey_judgments(spark, judgments: DataFrame, queries: list[str],
                    max_token_len: int = 64,
                    min_token_len: int = 1) -> DataFrame:
    """Map judgments keyed by a HASHED normalized-query id — the X118
    impression-log convention (``xxhash64`` of the analyzer-grid text,
    the same normalization :mod:`.querylog` pools counts by) — onto the
    POSITIONAL query_ids that :func:`training_triples` /
    ``QueryEngine.mine_training_triples`` use (position in the query
    list). One broadcast join of the N query strings hashed with the
    identical JVM expression; judgments for queries outside the list
    drop (inner join — they have no position to mine against).
    Returns (query_id, doc_id, grade) in the positional keyspace."""
    from pyspark.sql import functions as F  # noqa: F811 (module alias)

    from .querylog import _norm_expr

    qdf = spark.createDataFrame(list(enumerate(queries)),
                                "pos int, q string")
    qdf = qdf.select(
        "pos",
        F.xxhash64(_norm_expr("q", max_token_len,
                              min_token_len)).alias("query_id"))
    return (judgments.join(F.broadcast(qdf), "query_id")
            .select(F.col("pos").alias("query_id"), "doc_id", "grade"))


def _with_rank(results: DataFrame) -> DataFrame:
    """rank_eval's shared :func:`~.rank_eval.derive_rank` plus the
    miner's column contract (score carried through, NULL when the
    caller provided ranks only)."""
    from .rank_eval import derive_rank

    results = derive_rank(results)
    if "score" not in results.columns:
        results = results.withColumn("score", F.lit(None).cast("double"))
    return results.select("query_id", "doc_id",
                          F.col("rank").cast("int").alias("rank"),
                          F.col("score").cast("double").alias("score"))


def hard_negatives(results: DataFrame, judgments: DataFrame,
                   n_neg: int = 5, rel_threshold: int = 1,
                   skip_unjudged_top: int = 0) -> DataFrame:
    """Top-ranked retrieved docs that are NOT judged relevant, capped at
    ``n_neg`` per query in rank order.

    ``skip_unjudged_top``: ranks 1..s are excluded for UNJUDGED docs
    (docs explicitly judged non-relevant stay eligible at any rank) —
    the denoising heuristic for sparse judgment sets, where a top-1
    unjudged hit is more likely an unlabeled positive than a hard
    negative. Returns (query_id, neg_doc_id, neg_rank, neg_score),
    ``neg_rank`` being the retrieval rank the negative held.
    """
    res = _with_rank(results)
    jud = judgments.select("query_id", "doc_id",
                           F.col("grade").cast("double").alias("grade"))
    joined = (res.join(jud, ["query_id", "doc_id"], "left")
              .withColumn("judged", F.col("grade").isNotNull())
              .withColumn("rel",
                          F.coalesce(F.col("grade"), F.lit(0.0))
                          >= F.lit(float(rel_threshold))))
    neg = joined.filter(~F.col("rel"))
    if skip_unjudged_top > 0:
        neg = neg.filter(F.col("judged")
                         | (F.col("rank") > F.lit(int(skip_unjudged_top))))
    # cap per query in rank order — reuses the query_id partitioning the
    # rank window already established
    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    return (neg.withColumn("_n", F.row_number().over(w))
            .filter(F.col("_n") <= int(n_neg))
            .select("query_id",
                    F.col("doc_id").alias("neg_doc_id"),
                    F.col("rank").alias("neg_rank"),
                    F.col("score").alias("neg_score")))


def training_triples(results: DataFrame, judgments: DataFrame,
                     n_neg: int = 5, rel_threshold: int = 1,
                     skip_unjudged_top: int = 0) -> DataFrame:
    """(query_id, pos_doc_id, neg_doc_id, neg_rank, neg_score) — every
    judged positive of a query paired with each of its ≤ n_neg mined
    hard negatives (the DPR / sentence-transformers triple layout;
    in-batch negatives are a training-loop concern, not a data one).
    Queries with no judged positive, or no non-relevant retrieved doc,
    produce no rows — the inner join states that, not a filter."""
    pos = (judgments
           .filter(F.col("grade").cast("double")
                   >= F.lit(float(rel_threshold)))
           .select("query_id", F.col("doc_id").alias("pos_doc_id")))
    neg = hard_negatives(results, judgments, n_neg=n_neg,
                         rel_threshold=rel_threshold,
                         skip_unjudged_top=skip_unjudged_top)
    # both sides keyed (and already partitioned) by query_id; fan-out is
    # |positives| × n_neg per query, after both reductions
    return pos.join(neg, "query_id").select(
        "query_id", "pos_doc_id", "neg_doc_id", "neg_rank", "neg_score")
