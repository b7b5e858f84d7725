"""Rank-evaluation harness (SURVEY.md §2.3 X66): per-query precision /
recall / MRR / AP / nDCG / ERR @k, pinned against an independent pure-
Python oracle implementing the textbook definitions (Chapelle '09 for
ERR, TREC for AP, exponential-gain nDCG)."""
from __future__ import annotations

import math
import random

import pytest

from semantic_search_engine_spark.operators.rank_eval import (
    rank_eval,
    summarize,
)

K = 10
MAX_GRADE = 4


def _oracle(ranked: list[tuple[int, float]], n_rel_total: int,
            grades_all: list[float], k: int = K) -> dict:
    """ranked = [(rank-ordered grades...)]; grades_all = every judgment
    grade for the query (for IDCG / n_rel)."""
    grades = [min(g, MAX_GRADE) for _, g in ranked]
    rel = [1 if g >= 1 else 0 for g in grades]
    topk = rel[:k]
    n_rel = n_rel_total
    precision = sum(topk) / k
    recall = (sum(topk) / n_rel) if n_rel else 0.0
    mrr = 0.0
    for i, r in enumerate(topk):
        if r:
            mrr = 1.0 / (i + 1)
            break
    ap_sum, cum = 0.0, 0
    for i, r in enumerate(rel):
        cum += r
        if r and i < k:
            ap_sum += cum / (i + 1)
    ap = ap_sum / min(n_rel, k) if n_rel else 0.0
    dcg = sum((2 ** g - 1) / math.log2(i + 2)
              for i, g in enumerate(grades[:k]))
    ideal = sorted((min(g, MAX_GRADE) for g in grades_all), reverse=True)
    idcg = sum((2 ** g - 1) / math.log2(i + 2)
               for i, g in enumerate(ideal[:k]))
    ndcg = dcg / idcg if idcg > 0 else 0.0
    err, skip = 0.0, 1.0
    for i, g in enumerate(grades[:k]):
        r_prob = (2 ** g - 1) / (2 ** MAX_GRADE)
        err += skip * r_prob / (i + 1)
        skip *= (1 - r_prob)
    return {"precision": precision, "recall": recall, "mrr": mrr,
            "ap": ap, "ndcg": ndcg, "err": err}


@pytest.fixture(scope="module")
def fixture(spark):
    """60 queries with varied shapes: graded/binary judgments, unjudged
    retrieved docs, n_rel above and below k, one query with zero
    judgments, grades above max_grade (must cap)."""
    rng = random.Random(42)
    results, judgments = [], []
    expected = {}
    for q in range(60):
        depth = rng.randint(1, 25)
        docs = rng.sample(range(1000), depth)
        # judged pool: some retrieved docs + some never-retrieved docs
        jud = {}
        if q != 7:  # query 7: zero judgments at all
            for d in docs:
                if rng.random() < 0.6:
                    jud[d] = float(rng.randint(0, 6))  # 5,6 test capping
            for d in rng.sample(range(1000, 1100), rng.randint(0, 15)):
                jud[d] = float(rng.randint(1, MAX_GRADE))
        for rank, d in enumerate(docs, start=1):
            results.append((q, d, rank))
        for d, g in jud.items():
            judgments.append((q, d, g))
        ranked = [(r, jud.get(d, 0.0)) for r, d in enumerate(docs, 1)]
        n_rel = sum(1 for g in jud.values() if min(g, MAX_GRADE) >= 1)
        expected[q] = _oracle(ranked, n_rel, list(jud.values()))
    res_df = spark.createDataFrame(results, "query_id int, doc_id int, rank int")
    jud_df = spark.createDataFrame(judgments, "query_id int, doc_id int, grade double")
    return res_df, jud_df, expected


def test_per_query_metrics_match_oracle(spark, fixture):
    res_df, jud_df, expected = fixture
    got = {r["query_id"]: r.asDict()
           for r in rank_eval(res_df, jud_df, k=K, max_grade=MAX_GRADE)
           .collect()}
    assert set(got) == set(expected)
    for q, exp in expected.items():
        for m, v in exp.items():
            assert got[q][m] == pytest.approx(v, abs=1e-9), (q, m)


def test_summary_is_macro_average(spark, fixture):
    res_df, jud_df, expected = fixture
    per_q = rank_eval(res_df, jud_df, k=K, max_grade=MAX_GRADE)
    row = summarize(per_q).collect()[0]
    n = len(expected)
    assert row["n_queries"] == n
    for m, col in [("precision", "precision"), ("recall", "recall"),
                   ("mrr", "mrr"), ("ap", "map"), ("ndcg", "ndcg"),
                   ("err", "err")]:
        want = sum(e[m] for e in expected.values()) / n
        assert row[col] == pytest.approx(want, abs=1e-9)


def test_rank_derived_from_score_matches_explicit(spark, fixture):
    res_df, jud_df, expected = fixture
    # score = -rank reproduces the same order; ties impossible here
    scored = res_df.selectExpr("query_id", "doc_id",
                               "cast(-rank as double) as score")
    a = rank_eval(res_df, jud_df, k=K).collect()
    b = rank_eval(scored, jud_df, k=K).collect()
    key = lambda r: r["query_id"]  # noqa: E731
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert ra == rb


def test_score_ties_break_on_doc_id(spark):
    res = spark.createDataFrame(
        [(1, 30, 1.0), (1, 10, 1.0), (1, 20, 1.0)],
        "query_id int, doc_id int, score double")
    jud = spark.createDataFrame([(1, 10, 2.0)],
                                "query_id int, doc_id int, grade double")
    (row,) = rank_eval(res, jud, k=K).collect()
    # doc 10 wins the tie -> rank 1 -> mrr 1.0
    assert row["mrr"] == pytest.approx(1.0)


def test_no_judgments_scores_zero(spark, fixture):
    res_df, jud_df, expected = fixture
    got = {r["query_id"]: r for r in rank_eval(res_df, jud_df, k=K).collect()}
    row = got[7]
    assert row["n_rel"] == 0
    for m in ["precision", "recall", "mrr", "ap", "ndcg", "err"]:
        assert row[m] == 0.0


def test_missing_rank_and_score_raises(spark):
    df = spark.createDataFrame([(1, 2)], "query_id int, doc_id int")
    with pytest.raises(ValueError, match="rank.*score"):
        rank_eval(df, df)
