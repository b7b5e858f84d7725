"""Pseudo-relevance feedback (X47): Rocchio/MLT-style query expansion
with the WAND kernel's per-term boost hook. Selection and rankings are
pinned bit-identical against pure-Python oracle mirrors."""

from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.corpus import QUERY_CORPUS


@pytest.fixture(scope="module")
def prf_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("prf_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, cfg).build(docs)
    return QueryEngine(spark, store, cfg)


def test_expansion_term_selection_matches_oracle(prf_built, tiny_oracle):
    from semantic_search_engine_spark.oracle import prf_expansion_terms

    qe = prf_built
    for pq in QUERY_CORPUS[:4]:
        expected = prf_expansion_terms(tiny_oracle, pq.query)
        got = qe.expansion_terms(pq.query)
        assert got == expected, pq.query


def test_prf_ranking_matches_oracle(prf_built, tiny_oracle):
    """Expanded ranking rank- and score-bit-identical: boost·idf weights
    fold in the same order on both sides."""
    from semantic_search_engine_spark.oracle import prf_top_k

    qe = prf_built
    for pq in QUERY_CORPUS[:4]:
        expected = prf_top_k(tiny_oracle, pq.query, k=10)
        got = qe.prf_top_k(pq.query, k=10)
        assert [d for d, _ in got] == [d for d, _ in expected], pq.query
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == es, (pq.query, gd)


def test_prf_expansion_changes_recall(prf_built, tiny_oracle):
    """Expansion actually reaches docs the raw query can't: at least one
    query's expanded result set differs from its unexpanded one (and when
    it does, the oracle agrees doc-for-doc — already pinned above)."""
    qe = prf_built
    changed = 0
    for pq in QUERY_CORPUS[:4]:
        plain = [d for d, _ in qe.top_k(pq.query, k=10)]
        prf = [d for d, _ in qe.prf_top_k(pq.query, k=10)]
        if plain != prf:
            changed += 1
    assert changed >= 1


def test_fb_terms_zero_degenerates_to_plain_wand(prf_built):
    qe = prf_built
    q = QUERY_CORPUS[0].query
    assert (qe.prf_top_k(q, k=10, fb_terms=0)
            == qe.top_k(q, k=10, mode="wand"))
