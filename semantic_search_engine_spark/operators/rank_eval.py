"""Distributed retrieval-quality evaluation (Elasticsearch ``_rank_eval``
parity — its API docs list precision@k, recall@k, MRR, DCG/nDCG and ERR;
the reference repo evaluates retrieval quality only by eyeball,
``docs/SETUP.md:228-231``, so this is the missing measurement half of a
search engine: given a ranked result set and graded relevance judgments,
score every query and macro-average).

This is the shape an offline training-data pipeline actually needs: rank
a MILLION queries in one batch job (plans/query.py ``batch`` engine, X13)
and score them all in a second job — per-query metrics as pure JVM window
+ aggregation expressions, no per-row Python, no driver-side loops.

Inputs
------
``results``   — (query_id, doc_id, rank) one row per retrieved doc, rank
                1-based; or (query_id, doc_id, score) and ``rank`` is
                derived per query by (score DESC, doc_id ASC) — the
                engine's own tie-break order (plans/query.py).
``judgments`` — (query_id, doc_id, grade) graded relevance, grade ``>=
                rel_threshold`` counts as binary-relevant. Retrieved docs
                with no judgment row are UNRATED and score grade 0
                (Elasticsearch's default for unrated docs).

Metrics (all @k, per query, then macro-averaged by ``summarize``)
-----------------------------------------------------------------
- ``precision`` = relevant-in-top-k / k
- ``recall``    = relevant-in-top-k / total-relevant (n_rel)
- ``mrr``       = 1 / rank of the first relevant hit (0 if none in top k)
- ``ap``        = mean over relevant ranks r<=k of precision@r, divided
                  by min(n_rel, k)  (MAP's per-query term, TREC form)
- ``ndcg``      = DCG@k / IDCG@k with the exponential gain
                  (2^grade - 1) / log2(rank + 1); IDCG from the query's
                  own judgments sorted by grade DESC
- ``err``       = Expected Reciprocal Rank (Chapelle '09):
                  sum_r (1/r) * R_r * prod_{i<r} (1 - R_i), with
                  R = (2^grade - 1) / 2^max_grade. The sequential product
                  is a window-cumulative sum of log1p(-R) — still pure
                  expressions (R < 1 always since grade <= max_grade).

Scale notes (10^9 queries x depth-k results)
--------------------------------------------
- ONE shuffle keyed by ``query_id`` pays for everything: the
  rank-derivation window, the judgment join (also keyed by query_id —
  co-partitioned, no second exchange), the cumulative windows and the
  final groupBy all reuse that partitioning. query_id is high-cardinality
  and uniform — no skew salt needed (each group is <= depth rows).
- IDCG comes from a window over the JUDGMENTS side (row_number by grade
  DESC per query) — judgments are O(queries x judged-depth), same
  partitioning, never a driver collect.
- ``summarize`` is one map-side-combined aggregation to a single row.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["derive_rank", "rank_eval", "summarize"]

_LOG2 = 0.6931471805599453  # ln(2); Spark's log() is natural log


def _gain(col):
    return F.pow(F.lit(2.0), col) - F.lit(1.0)


def _dcg_at_k(grade_col, rank_col, k: int):
    """Summable per-row DCG term, zero past k / for NULL grades."""
    term = _gain(grade_col) / (F.log(rank_col + F.lit(1.0)) / F.lit(_LOG2))
    return F.sum(F.when((rank_col <= k) & grade_col.isNotNull(), term)
                 .otherwise(F.lit(0.0)))


def derive_rank(results: DataFrame) -> DataFrame:
    """THE rank-derivation rule, shared by evaluation (rank_eval), the
    hard-negative miner (X117) and IPS policy evaluation (X118): keep a
    provided ``rank`` column; else require ``score`` and rank per query
    by (score DESC, doc_id ASC) — the engine's own tie-break
    (plans/query.py). One definition so the consumers cannot drift."""
    if "rank" not in results.columns:
        if "score" not in results.columns:
            raise ValueError("results needs a 'rank' or 'score' column")
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc())
        results = results.withColumn("rank", F.row_number().over(w))
    return results


def rank_eval(results: DataFrame, judgments: DataFrame, k: int = 10,
              max_grade: int = 4, rel_threshold: int = 1) -> DataFrame:
    """Per-query retrieval metrics @k; see module docstring.

    Returns one row per query_id present in ``results``:
    (query_id, n_retrieved, n_rel, precision, recall, mrr, ap, ndcg,
    err). Queries with no relevant judgments score 0 on every metric
    (recall included — defined as 0/0 -> 0, Elasticsearch's choice).
    """
    res = derive_rank(results).select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("rank"))
    jud = judgments.select(
        "query_id", "doc_id",
        F.least(F.col("grade").cast("double"), F.lit(float(max_grade)))
        .alias("grade"))

    # per-query totals + ideal DCG from the judgments side (same
    # query_id partitioning as everything else)
    jw = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc())
    ideal = (jud.withColumn("irank", F.row_number().over(jw))
             .groupBy("query_id")
             .agg(_dcg_at_k(F.col("grade"), F.col("irank"), k)
                  .alias("idcg"),
                  F.sum((F.col("grade") >= rel_threshold).cast("int"))
                  .alias("n_rel")))

    g = (res.join(jud, ["query_id", "doc_id"], "left")
         .withColumn("grade", F.coalesce("grade", F.lit(0.0)))
         .withColumn("rel", (F.col("grade") >= rel_threshold).cast("int")))

    # cumulative windows in rank order (reuse the query_id partitioning)
    rw = (Window.partitionBy("query_id").orderBy("rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev = (Window.partitionBy("query_id").orderBy("rank")
            .rowsBetween(Window.unboundedPreceding, -1))
    r_prob = _gain(F.col("grade")) / F.lit(float(2 ** max_grade))
    g = (g.withColumn("cum_rel", F.sum("rel").over(rw))
          .withColumn("log_skip",
                      F.coalesce(F.sum(F.log1p(-r_prob)).over(prev),
                                 F.lit(0.0)))
          .withColumn("err_term",
                      r_prob * F.exp(F.col("log_skip")) / F.col("rank")))

    in_k = F.col("rank") <= k
    per_q = g.groupBy("query_id").agg(
        F.count("*").alias("n_retrieved"),
        F.sum(F.when(in_k, F.col("rel")).otherwise(0)).alias("rel_at_k"),
        F.min(F.when(in_k & (F.col("rel") == 1), F.col("rank")))
        .alias("first_rel_rank"),
        F.sum(F.when(in_k & (F.col("rel") == 1),
                     F.col("cum_rel") / F.col("rank"))
              .otherwise(F.lit(0.0))).alias("ap_sum"),
        _dcg_at_k(F.col("grade"), F.col("rank"), k).alias("dcg"),
        F.sum(F.when(in_k, F.col("err_term")).otherwise(F.lit(0.0)))
        .alias("err"),
    )

    out = (per_q.join(ideal, "query_id", "left")
           .withColumn("n_rel", F.coalesce("n_rel", F.lit(0)))
           .withColumn("idcg", F.coalesce("idcg", F.lit(0.0))))
    zero_if_no_rel = F.col("n_rel") > 0
    return out.select(
        "query_id", "n_retrieved", "n_rel",
        (F.col("rel_at_k") / F.lit(float(k))).alias("precision"),
        F.when(zero_if_no_rel, F.col("rel_at_k") / F.col("n_rel"))
        .otherwise(F.lit(0.0)).alias("recall"),
        F.coalesce(F.lit(1.0) / F.col("first_rel_rank"), F.lit(0.0))
        .alias("mrr"),
        F.when(zero_if_no_rel,
               F.col("ap_sum") / F.least(F.col("n_rel"), F.lit(k)))
        .otherwise(F.lit(0.0)).alias("ap"),
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(F.lit(0.0)).alias("ndcg"),
        "err",
    )


def summarize(per_query: DataFrame) -> DataFrame:
    """Macro-average of :func:`rank_eval`'s output — one row:
    (n_queries, precision, recall, mrr, map, ndcg, err). MAP is the mean
    of per-query AP (the TREC definition)."""
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("mrr").alias("mrr"),
        F.avg("ap").alias("map"),
        F.avg("ndcg").alias("ndcg"),
        F.avg("err").alias("err"),
    )
