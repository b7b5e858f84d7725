"""Snapshot-keyed result cache (X94): hits serve without recompute,
commits invalidate by construction, LRU bounds, passthrough safety."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.result_cache import (
    CachingQueryEngine,
)
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=2, n_term_buckets=2,
                   shuffle_partitions=2, block_size=8)


def _rows(n=10):
    return [dict(url=f"https://c{i}.example/x", warc_ts=None, html=None,
                 text=f"common shared doc{i} words of the corpus"
                      + (" dropme" if i == 0 else ""),
                 lang="en") for i in range(n)]


@pytest.fixture()
def built(spark, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("rc")))
    docs = spark.createDataFrame(
        _rows(), "url string, warc_ts timestamp, html binary, "
                 "text string, lang string")
    b = IndexBuilder(spark, store, CFG)
    b.build(docs)
    return b, QueryEngine(spark, store, CFG)


def test_hit_serves_without_recompute(built, monkeypatch):
    _b, qe = built
    cqe = CachingQueryEngine(qe)
    first = cqe.top_k("common shared", k=5)
    calls = {"n": 0}
    real = QueryEngine.top_k

    def counting(self, *a, **kw):
        calls["n"] += 1
        return real(self, *a, **kw)

    monkeypatch.setattr(QueryEngine, "top_k", counting)
    second = cqe.top_k("common shared", k=5)
    assert second == first
    assert calls["n"] == 0
    assert cqe.stats()["hits"] == 1
    # a different k is a different key
    cqe.top_k("common shared", k=3)
    assert calls["n"] == 1


def test_commit_invalidates(built):
    b, qe = built
    cqe = CachingQueryEngine(qe)
    before = cqe.top_k("dropme", k=5)
    assert before
    b.delete_docs(["https://c0.example/x"])
    after = cqe.top_k("dropme", k=5)
    assert after == []                  # recomputed against new snapshot
    assert cqe.stats()["misses"] == 2


def test_mutating_a_result_does_not_poison_the_cache(built):
    _b, qe = built
    cqe = CachingQueryEngine(qe)
    r1 = cqe.top_k("common shared", k=5)
    r1.append(("poison", 0.0))
    r2 = cqe.top_k("common shared", k=5)
    assert ("poison", 0.0) not in r2


def test_lru_bound_and_noncacheable_passthrough(built):
    _b, qe = built
    cqe = CachingQueryEngine(qe, max_entries=2)
    for i in range(4):
        cqe.top_k(f"doc{i}", k=2)
    assert cqe.stats()["entries"] == 2
    # non-cacheable attributes pass straight through
    assert cqe.cfg is qe.cfg
    df = cqe.wand_top_k_df("common", k=2)
    assert hasattr(df, "collect")
    with pytest.raises(ValueError):
        CachingQueryEngine(qe, max_entries=0)
