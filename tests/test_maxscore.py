"""MaxScore DAAT retrieval (X108) — rank-identity with WAND and the oracle.

The two classic DAAT pruning strategies must return bit-identical results
from the same compressed posting blocks: MaxScore (fixed cursor order,
essential/non-essential split, random-access probes) is pinned against
wand_top_k, an exhaustive scorer, and the Spark engine's WAND serve path.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.functions.varbyte import encode_blocks
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.maxscore import maxscore_top_k
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


def _exhaustive(term_postings, weights, doc_len, avgdl, k,
                min_score=0.0):
    scores: dict[int, float] = {}
    for term in sorted(term_postings):
        if term not in weights:
            continue
        w = weights[term]
        ids, tfs = term_postings[term]
        for d, tf in zip(ids.astype(int), tfs.astype(int)):
            dl = float(doc_len[d])
            contrib = w * (tf / (tf + K1 * (1 - B + B * dl / avgdl)))
            scores[d] = scores.get(d, 0.0) + contrib
    ranked = sorted(((d, s) for d, s in scores.items()
                     if s >= min_score), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


@pytest.mark.parametrize("seed", range(6))
def test_maxscore_matches_wand_and_exhaustive(seed):
    rng = np.random.default_rng(seed)
    blocks, weights, postings, doc_len, avgdl = _random_index(
        rng, n_docs=400, n_terms=6, density=0.15, block_size=16)
    for k in (1, 5, 10, 50):
        ms, _ = maxscore_top_k(blocks, weights, k, K1, B, avgdl)
        wd, _ = wand_top_k(blocks, weights, k, K1, B, avgdl)
        ex = _exhaustive(postings, weights, doc_len, avgdl, k)
        assert ms == wd, (seed, k)
        assert [d for d, _ in ms] == [d for d, _ in ex], (seed, k)
        for (gd, gs), (_, es) in zip(ms, ex):
            assert math.isclose(gs, es, rel_tol=0, abs_tol=1e-12)


def test_maxscore_actually_prunes():
    """The essential/non-essential split must cut work: with a small k and
    skewed weights, skipped_evals > 0 and evaluated < total candidates."""
    rng = np.random.default_rng(42)
    blocks, weights, postings, doc_len, avgdl = _random_index(
        rng, n_docs=3000, n_terms=5, density=0.2, block_size=32)
    _, stats = maxscore_top_k(blocks, weights, 10, K1, B, avgdl)
    n_candidates = len({int(d) for ids, _ in postings.values()
                        for d in ids})
    assert stats["skipped_evals"] > 0
    assert stats["evaluated_docs"] < n_candidates
    assert stats["essential_start"] > 0  # some list went non-essential


@pytest.mark.parametrize("min_score", [0.5, 1.5, 3.0])
def test_maxscore_min_score_seeds_theta(min_score):
    rng = np.random.default_rng(7)
    blocks, weights, postings, doc_len, avgdl = _random_index(
        rng, n_docs=800, n_terms=5, density=0.15, block_size=16)
    ms, stats = maxscore_top_k(blocks, weights, 50, K1, B, avgdl,
                               min_score=min_score)
    ex = _exhaustive(postings, weights, doc_len, avgdl, 50,
                     min_score=min_score)
    assert [d for d, _ in ms] == [d for d, _ in ex]
    assert all(s >= min_score for _, s in ms)
    # the seeded theta makes the split bite from the start
    bare, bare_stats = maxscore_top_k(blocks, weights, 50, K1, B, avgdl)
    assert stats["evaluated_docs"] <= bare_stats["evaluated_docs"]


def test_maxscore_allowed_filter():
    rng = np.random.default_rng(11)
    blocks, weights, postings, doc_len, avgdl = _random_index(
        rng, n_docs=500, n_terms=4, density=0.2, block_size=16)
    allowed = np.array(sorted(d for d in range(500) if d % 3 == 0),
                       dtype=np.int64)
    ms, _ = maxscore_top_k(blocks, weights, 20, K1, B, avgdl,
                           allowed=allowed)
    ex = [(d, s) for d, s in _exhaustive(postings, weights, doc_len,
                                         avgdl, 10 ** 9) if d % 3 == 0][:20]
    assert ms == [(d, s) for d, s in ex] or \
        [d for d, _ in ms] == [d for d, _ in ex]


def test_maxscore_empty_and_degenerate():
    assert maxscore_top_k({}, {}, 10, K1, B, 100.0)[0] == []
    rng = np.random.default_rng(3)
    blocks, weights, *_ , avgdl = _random_index(
        rng, n_docs=50, n_terms=2, density=0.3, block_size=8)
    assert maxscore_top_k(blocks, weights, 0, K1, B, avgdl)[0] == []
    assert maxscore_top_k(blocks, {}, 10, K1, B, avgdl)[0] == []


# ---------------------------------------------------------------------------
# Spark engine: MaxScore serve path vs WAND serve path vs oracle
# ---------------------------------------------------------------------------

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_ms")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, None)


@pytest.mark.parametrize("q", [
    "wireless bluetooth headphones",
    "gaming laptop",
    "zipfhead0 w0042",
    "organic cotton",
])
def test_engine_maxscore_rank_identical_to_wand_and_oracle(
        built, tiny_rows, q):
    oracle = OracleIndex.build(tiny_rows, CFG)
    ms = [(r["doc_id"], r["score"])
          for r in built.maxscore_top_k_df(q, k=10).collect()]
    wd = [(r["doc_id"], r["score"])
          for r in built.wand_top_k_df(q, k=10).collect()]
    want = oracle.top_k(q, k=10)
    assert ms == wd, q
    assert [d for d, _ in ms] == [d for d, _ in want], q
    for (gd, gs), (wd_, ws) in zip(ms, want):
        assert math.isclose(gs, ws, rel_tol=0, abs_tol=1e-12)


def test_engine_maxscore_min_score(built, tiny_rows):
    oracle = OracleIndex.build(tiny_rows, CFG)
    q = "wireless bluetooth headphones"
    full = oracle.top_k(q, k=200)
    cut = full[min(3, len(full) - 1)][1]
    ms = [(r["doc_id"], r["score"])
          for r in built.maxscore_top_k_df(q, k=10,
                                           min_score=cut).collect()]
    want = [(d, s) for d, s in full if s >= cut][:10]
    assert [d for d, _ in ms] == [d for d, _ in want]


# ---------------------------------------------------------------------------
# adaptive strategy selection (X113)
# ---------------------------------------------------------------------------

def test_choose_strategy_rules(built):
    # short selective query -> WAND
    assert built.choose_strategy(["raretermxq"]) == "wand"
    assert built.choose_strategy(["gaming", "laptop"]) == "wand"
    # term-count rule: >= 4 distinct terms -> MaxScore
    assert built.choose_strategy(
        ["aa", "bb", "cc", "dd"]) == "maxscore"
    # df-ratio rule: the Zipf head appears in most docs
    assert built.choose_strategy(["zipfhead0", "w0042"]) == "maxscore"


@pytest.mark.parametrize("q", [
    "wireless bluetooth headphones",            # 3 terms, selective: wand
    "zipfhead0 w0042",                          # stopword-heavy: maxscore
    "wireless bluetooth headphones gaming laptop",  # >=4 terms: maxscore
])
def test_auto_top_k_identical_to_both_kernels(built, tiny_rows, q):
    oracle = OracleIndex.build(tiny_rows, CFG)
    auto = [(r["doc_id"], r["score"])
            for r in built.auto_top_k_df(q, k=10).collect()]
    want = oracle.top_k(q, k=10)
    assert [d for d, _ in auto] == [d for d, _ in want], q
    for (gd, gs), (wd, ws) in zip(auto, want):
        assert math.isclose(gs, ws, rel_tol=0, abs_tol=1e-12)


def test_df_lookup_cached_per_engine(built, monkeypatch):
    """ADVICE r3: the auto-routing df check must not pay a Spark collect
    per repeat query — after the first lookup the per-engine cache
    answers without touching the term_stats scan."""
    built.choose_strategy(["zipfhead0", "w0042"])
    _uuid, cache = built._term_df_cache  # (data_uuid, dict) since r5
    assert cache["zipfhead0"] > 0
    assert "w0042" in cache

    def boom(*a, **k):
        raise AssertionError("df re-queried despite cache")

    monkeypatch.setattr(built, "_pruned_term_scan", boom,
                        raising=False)
    # same terms again: answered from cache, no scan
    assert built.choose_strategy(["zipfhead0", "w0042"]) == "maxscore"
    assert built.choose_strategy(["zipfhead0"]) == "maxscore"


def test_df_cache_invalidated_by_term_stats_rewrite(built):
    """ADVICE r4: the per-engine df cache is keyed on the term_stats
    data_uuid, so an index merge (any rewrite of the table) makes the
    SAME engine re-query instead of serving stale df/idf."""
    built.choose_strategy(["zipfhead0"])
    uuid_before, cache = built._term_df_cache
    assert "zipfhead0" in cache
    # rewrite term_stats with identical content: only data_uuid changes
    store = built.store
    tbl = store.read("term_stats")
    cols = tbl.columns
    store.write("term_stats", tbl.select(*cols).localCheckpoint(),
                partition_by=(["term_bucket"]
                              if "term_bucket" in cols else None))
    built.choose_strategy(["zipfhead0"])  # must re-query, not KeyError
    uuid_after, cache2 = built._term_df_cache
    assert uuid_after != uuid_before
    assert cache2["zipfhead0"] == cache["zipfhead0"]
