"""BM25 hyperparameter sweep — relevance tuning as one distributed job
(the offline loop Elasticsearch documents around `_rank_eval`: try
(k1, b) settings, score each against judgments, pick the winner; the
reference hard-codes Postgres ts_rank and cannot tune at all).

The sweep composes two things this engine already has: the EXACT BM25
contribution form of the serving path (`plans/query.py scores_df`:
``idf * tf / (tf + k1*(1-b + b*dl/avgdl))`` — pinned: the grid point
equal to the engine config reproduces the engine's ranking) and the
X66 rank-evaluation harness for the metric side.

Plan shape — the expensive work is grid-INDEPENDENT and paid once:
- ONE doc_features scan explodes the stored per-doc tf_map filtered to
  the union of query terms (`map_filter` + explode: no re-tokenize, no
  postings decode needed offline) → (doc, term, tf, dl);
- df/idf ride a pruned term_stats `term IN` scan;
- every grid point is just ANOTHER COLUMN over those rows — N_grid
  score columns in one whole-stage-codegen pass, one groupBy;
- per grid point, a rank window + the X66 metrics over ≤ |queries|·k
  rows. The scan cost is amortized over the whole grid (the reason to
  sweep in Spark rather than re-running a serving engine N_grid times).

At 10^12 docs: query-term tf rows are the postings of the query terms
(~Σ df), the same volume one exhaustive scoring pass reads; caching
`scored` amortizes it across the grid. Queries are the batch-retrieval
shape (X13) — thousands of judged queries, not one.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..textproc import tokenize
from .rank_eval import rank_eval, summarize

__all__ = ["sweep_bm25"]


def sweep_bm25(store, queries: list[tuple[int, str]],
               judgments: DataFrame,
               grid: list[tuple[float, float]], k: int = 10,
               field: str = "text", max_token_len: int = 64,
               min_token_len: int = 1, analyzer: str = "simple",
               max_grade: int = 4) -> list[dict]:
    """Score every (k1, b) grid point; returns one dict per point
    (k1, b, n_queries, precision, recall, mrr, map, ndcg, err),
    best-nDCG first. ``queries`` = [(query_id, text)]; ``judgments`` =
    (query_id, doc_id, grade)."""
    if not grid or not queries:
        raise ValueError("grid and queries must be non-empty")
    sfx = "" if field == "text" else f"_{field}"
    per_q = {qid: sorted(set(tokenize(q, max_token_len, min_token_len,
                                      analyzer)))
             for qid, q in queries}
    all_terms = sorted(set().union(*per_q.values()))
    if not all_terms:
        raise ValueError("no query tokenizes to any term")
    spark = judgments.sparkSession

    row = store.read(f"corpus_stats{sfx}").collect()[0]
    n_docs, avgdl = int(row["n_docs"]), float(row["avg_doc_len"])

    df_rows = (store.read(f"term_stats{sfx}")
               .filter(F.col("term").isin(all_terms))
               .select("term", "df").collect())
    idf = {r["term"]: math.log(1.0 + (n_docs - r["df"] + 0.5)
                               / (r["df"] + 0.5)) for r in df_rows}
    qdf = spark.createDataFrame(
        [(qid, t, idf[t]) for qid, ts in per_q.items()
         for t in ts if t in idf],
        "query_id long, term string, idf double")

    feats = (store.read(f"doc_features{sfx}")
             .select("doc_id", F.col("doc_len").alias("dl"),
                     F.explode(F.map_filter(
                         "tf_map", lambda t, _v: t.isin(all_terms)))
                     .alias("term", "tf")))
    base = feats.join(F.broadcast(qdf), "term")
    cols = []
    for gi, (k1, b) in enumerate(grid):
        contrib = (F.col("idf") * (F.col("tf")
                   / (F.col("tf") + F.lit(float(k1))
                      * (F.lit(1.0 - float(b))
                         + F.lit(float(b)) * F.col("dl")
                         / F.lit(avgdl)))))
        cols.append(F.sum(contrib).alias(f"s{gi}"))
    scored = (base.groupBy("query_id", "doc_id").agg(*cols)).cache()
    try:
        out = []
        for gi, (k1, b) in enumerate(grid):
            w = Window.partitionBy("query_id").orderBy(
                F.col(f"s{gi}").desc(), F.col("doc_id").asc())
            results = (scored
                       .withColumn("rank", F.row_number().over(w))
                       .filter(F.col("rank") <= k)
                       .select("query_id", "doc_id", "rank"))
            m = summarize(rank_eval(results, judgments, k=k,
                                    max_grade=max_grade)).collect()[0]
            out.append({"k1": float(k1), "b": float(b),
                        **{c: m[c] for c in
                           ("n_queries", "precision", "recall", "mrr",
                            "map", "ndcg", "err")}})
        out.sort(key=lambda d: (-d["ndcg"], d["k1"], d["b"]))
        return out
    finally:
        scored.unpersist()
