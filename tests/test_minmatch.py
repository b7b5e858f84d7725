"""Minimum-should-match ranked retrieval (X49).

Elasticsearch ``minimum_should_match`` / Lucene ``MinShouldMatchSumScorer``
semantics: a doc qualifies only if it contains at least ``min_match``
DISTINCT query terms; its score stays the BM25 sum over the terms it
matches. Pinned three ways: kernel property vs an exhaustive scorer,
oracle semantics, and Spark engine vs oracle rank-identity.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.functions.varbyte import encode_blocks
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.wand import wand_top_k

K1, B = 1.2, 0.75


def _random_index(rng, n_docs, n_terms, density, block_size):
    doc_len = rng.integers(5, 200, size=n_docs)
    avgdl = float(doc_len.mean())
    term_postings = {}
    for t in range(n_terms):
        mask = rng.random(n_docs) < density * (1.0 if t else 3.0)
        ids = np.flatnonzero(mask).astype(np.uint64)
        if ids.size == 0:
            continue
        tfs = rng.integers(1, 8, size=ids.size).astype(np.uint64)
        term_postings[f"t{t:02d}"] = (ids, tfs)
    term_blocks = {}
    for term, (ids, tfs) in term_postings.items():
        dls = doc_len[ids.astype(np.int64)].astype(np.uint64)
        term_blocks[term] = encode_blocks(ids, tfs, dls, avgdl, K1, B,
                                          block_size)
    weights = {t: float(rng.uniform(0.1, 3.0)) for t in term_postings}
    return term_blocks, weights, term_postings, doc_len, avgdl


def _exhaustive_min_match(term_postings, weights, doc_len, avgdl, k, m):
    scores: dict[int, float] = {}
    counts: dict[int, int] = {}
    for term in sorted(term_postings):
        if term not in weights:
            continue
        w = weights[term]
        ids, tfs = term_postings[term]
        for d, tf in zip(ids.astype(int), tfs.astype(int)):
            dl = float(doc_len[d])
            contrib = w * (tf / (tf + K1 * (1 - B + B * dl / avgdl)))
            scores[d] = scores.get(d, 0.0) + contrib
            counts[d] = counts.get(d, 0) + 1
    ranked = sorted(((d, s) for d, s in scores.items()
                     if counts[d] >= m), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("m", [2, 3, 5])
def test_kernel_min_match_equals_exhaustive(seed, m):
    rng = np.random.default_rng(seed)
    blocks, weights, postings, dl, avgdl = _random_index(
        rng, n_docs=800, n_terms=6, density=0.15, block_size=32)
    for k in (1, 10, 50):
        got, stats = wand_top_k(blocks, weights, k, K1, B, avgdl,
                                min_match=m)
        want = _exhaustive_min_match(postings, weights, dl, avgdl, k, m)
        assert [d for d, _ in got] == [d for d, _ in want], (seed, m, k)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == ws  # bit-identical float fold
    # with m > 1 some candidate must have been disqualified on this
    # dense corpus (density 0.15 over 6 terms — singles are common)
    got, stats = wand_top_k(blocks, weights, 10, K1, B, avgdl, min_match=m)
    assert stats["under_min_match"] > 0


def test_kernel_min_match_stronger_than_terms_is_empty():
    rng = np.random.default_rng(7)
    blocks, weights, postings, dl, avgdl = _random_index(
        rng, n_docs=200, n_terms=3, density=0.2, block_size=16)
    got, stats = wand_top_k(blocks, weights, 10, K1, B, avgdl,
                            min_match=len(blocks) + 1)
    assert got == []
    assert stats["evaluated_docs"] == 0  # early break, nothing scored


def test_kernel_min_match_composes_with_filters_and_threshold():
    rng = np.random.default_rng(11)
    blocks, weights, postings, dl, avgdl = _random_index(
        rng, n_docs=600, n_terms=5, density=0.2, block_size=32)
    allowed = np.sort(rng.choice(600, size=300, replace=False)
                      ).astype(np.int64)
    aset = set(int(a) for a in allowed)
    base = _exhaustive_min_match(postings, weights, dl, avgdl, 600, 2)
    thresh = [x for x in base if x[1] >= 0.8 and x[0] in aset][:10]
    got, _ = wand_top_k(blocks, weights, 10, K1, B, avgdl,
                        allowed=allowed, min_score=0.8, min_match=2)
    assert [d for d, _ in got] == [d for d, _ in thresh]


# ---------------------------------------------------------------------------
# Oracle semantics
# ---------------------------------------------------------------------------

_ROWS = [
    {"url": "both", "warc_ts": None, "html": None,
     "text": "alpha beta gamma", "lang": "en"},
    {"url": "only-a", "warc_ts": None, "html": None,
     "text": "alpha delta epsilon", "lang": "en"},
    {"url": "only-b", "warc_ts": None, "html": None,
     "text": "beta zeta eta", "lang": "en"},
]


def test_oracle_min_match():
    from semantic_search_engine_spark.textproc import doc_id_for_url

    idx = OracleIndex.build(_ROWS, EngineConfig())
    all3 = idx.top_k("alpha beta", k=10)
    assert len(all3) == 3
    both = idx.top_k("alpha beta", k=10, min_match=2)
    assert [d for d, _ in both] == [doc_id_for_url("both")]
    # score of the surviving doc is unchanged by the qualification
    full = dict(all3)
    assert both[0][1] == full[both[0][0]]
    assert idx.top_k("alpha beta", k=10, min_match=3) == []


# ---------------------------------------------------------------------------
# Spark engine vs oracle (tiny corpus, module-scoped index build)
# ---------------------------------------------------------------------------

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_mm")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, None)


@pytest.fixture(scope="module")
def oracle(tiny_rows):
    return OracleIndex.build(tiny_rows, CFG)


@pytest.mark.parametrize("q,m", [
    ("wireless bluetooth headphones", 2),
    ("wireless bluetooth headphones", 3),
    ("gaming laptop smartphone", 2),
    ("zipfhead0 w0042", 2),
])
def test_engine_min_match_rank_identical_to_oracle(built, oracle, q, m):
    got = [(r["doc_id"], r["score"])
           for r in built.wand_top_k_df(q, k=10, min_match=m).collect()]
    want = oracle.top_k(q, k=10, min_match=m)
    assert [d for d, _ in got] == [d for d, _ in want], (q, m)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=0, abs_tol=1e-12)
    # and the constraint actually bites vs the unconstrained query
    loose = oracle.top_k(q, k=10)
    strict_set = {d for d, _ in want}
    assert strict_set.issubset({d for d, _ in loose} | strict_set)


def test_engine_batch_min_match_matches_single(built):
    qs = ["wireless bluetooth headphones", "gaming laptop smartphone"]
    batch = built.batch_wand_top_k_df(qs, k=10, min_match=2).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"]))
    for qi, q in enumerate(qs):
        single = [(r["doc_id"], r["score"])
                  for r in built.wand_top_k_df(q, k=10,
                                               min_match=2).collect()]
        got = sorted(by_q.get(qi, []), key=lambda x: (-x[1], x[0]))
        assert got == single, q
