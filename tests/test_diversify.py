"""Result diversification (X84): driver-side MMR pinned against a direct
Python oracle, and the distributed cluster round-robin form."""
from __future__ import annotations

import math

import numpy as np
import pytest

from semantic_search_engine_spark.operators.diversify import (
    cluster_diverse_top_k,
    mmr_rerank,
)


def _py_mmr(rows, k, lam):
    """rows: [(id, score, emb)] pre-sorted by (score desc, id asc)."""
    unit = []
    for _i, _s, e in rows:
        v = np.array(e, dtype=np.float64)
        n = np.linalg.norm(v)
        unit.append(v / n if n else v)
    sel, out = [], []
    remaining = list(range(len(rows)))
    for _ in range(min(k, len(rows))):
        best, bkey = None, None
        for i in remaining:
            div = max((float(unit[i] @ unit[j]) for j in sel),
                      default=0.0)
            div = max(div, 0.0) if sel else 0.0
            mmr = lam * rows[i][1] - (1 - lam) * div
            if bkey is None or mmr > bkey:
                best, bkey = i, mmr
        sel.append(best)
        remaining.remove(best)
        out.append((rows[best][0], bkey, rows[best][1]))
    return out


# two tight clusters + one outlier; scores favor cluster A
ROWS = [
    (1, 10.0, [1.0, 0.0, 0.0]),
    (2, 9.9, [0.99, 0.1, 0.0]),     # near-dup of 1
    (3, 9.8, [0.98, 0.15, 0.05]),   # near-dup of 1
    (4, 7.0, [0.0, 1.0, 0.0]),      # cluster B
    (5, 6.9, [0.05, 0.99, 0.0]),    # near-dup of 4
    (6, 3.0, [0.0, 0.0, 1.0]),      # outlier
    (7, 2.0, None),                 # NULL embedding: dropped
]


@pytest.fixture(scope="module")
def cand(spark):
    return spark.createDataFrame(
        [(i, s, e) for i, s, e in ROWS],
        "doc_id long, score double, embedding array<double>")


@pytest.mark.parametrize("lam", [0.0, 0.3, 0.5, 0.7, 1.0])
def test_mmr_matches_python_oracle(cand, lam):
    got = mmr_rerank(cand, k=5, lambda_=lam)
    want = _py_mmr([r for r in ROWS if r[2] is not None], 5, lam)
    assert [i for i, _m, _s in got] == [i for i, _m, _s in want], lam
    for (gi, gm, gs), (wi, wm, ws) in zip(got, want):
        assert gm == pytest.approx(wm, abs=1e-12)
        assert gs == pytest.approx(ws, abs=1e-12)


def test_mmr_lambda_one_is_relevance_order(cand):
    got = [i for i, _m, _s in mmr_rerank(cand, k=6, lambda_=1.0)]
    assert got == [1, 2, 3, 4, 5, 6]


def test_mmr_diversifies_at_half_lambda(spark):
    # MMR is score-scale sensitive (the diversity term is a cosine in
    # [-1, 1]) — with scores normalized to [0, 1], lambda=0.5 prefers
    # one pick per cluster over near-dups of the best
    df = spark.createDataFrame(
        [(i, s / 10.0, e) for i, s, e in ROWS if e is not None],
        "doc_id long, score double, embedding array<double>")
    got = [i for i, _m, _s in mmr_rerank(df, k=3, lambda_=0.5)]
    assert got[0] == 1
    assert set(got) == {1, 4, 6}


def test_mmr_bounds_and_edges(cand, spark):
    assert mmr_rerank(cand, k=100)  # k > N: returns all non-null rows
    assert len(mmr_rerank(cand, k=100)) == 6
    empty = spark.createDataFrame(
        [], "doc_id long, score double, embedding array<double>")
    assert mmr_rerank(empty, k=5) == []
    with pytest.raises(ValueError):
        mmr_rerank(cand, k=3, lambda_=1.5)
    with pytest.raises(ValueError):
        mmr_rerank(cand, k=3, max_candidates=2)


def test_zero_vector_is_neutral(spark):
    df = spark.createDataFrame(
        [(1, 5.0, [0.0, 0.0]), (2, 4.0, [1.0, 0.0])],
        "doc_id long, score double, embedding array<double>")
    got = mmr_rerank(df, k=2, lambda_=0.5)
    assert [i for i, _m, _s in got] == [1, 2]
    assert not any(math.isnan(m) for _i, m, _s in got)


# ------------------------------------------------------------ distributed

CLUSTERED = [
    (1, 10.0, "a"), (2, 9.0, "a"), (3, 8.0, "a"),
    (4, 7.0, "b"), (5, 6.0, "b"),
    (6, 1.0, "c"),
    (7, 0.5, None),
]


@pytest.fixture(scope="module")
def clustered(spark):
    return spark.createDataFrame(
        CLUSTERED, "doc_id long, score double, host string")


def test_round_robin_interleave(clustered):
    got = [(r["doc_id"], r["cluster_rank"]) for r in
           cluster_diverse_top_k(clustered, k=7, by="host").collect()]
    # rank-1 of every cluster first (score desc), then rank-2s, ...
    assert got == [(1, 1), (4, 1), (6, 1), (7, 1),
                   (2, 2), (5, 2), (3, 3)]


def test_per_cluster_cap_is_collapse_at_one(clustered):
    got = [r["doc_id"] for r in
           cluster_diverse_top_k(clustered, k=10, by="host",
                                 per_cluster_cap=1).collect()]
    assert got == [1, 4, 6, 7]


def test_k_truncates_and_validates(clustered):
    assert cluster_diverse_top_k(clustered, k=2, by="host").count() == 2
    with pytest.raises(ValueError):
        cluster_diverse_top_k(clustered, k=0, by="host")
