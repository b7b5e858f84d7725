"""Delete-by-query (X90): the match set resolved by the query engine
(websearch semantics incl. negation) feeds the pinned incremental-delete
path; result equals a fresh build over the survivors; refusal edges."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)


def _rows():
    rows = []
    for i in range(18):
        extra = ""
        if i % 3 == 0:
            extra = " purgeme"               # 6 docs match purgeme
        if i % 6 == 0:
            extra += " keepme"               # 3 of those also keepme
        rows.append(dict(
            url=f"https://d{i}.example/x", warc_ts=None, html=None,
            text=f"common words doc{i} shared of the corpus{extra}",
            lang="en" if i % 2 == 0 else "de"))
    return rows


@pytest.fixture()
def built(spark, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("dbq")))
    docs = spark.createDataFrame(
        _rows(), "url string, warc_ts timestamp, html binary, "
                 "text string, lang string")
    b = IndexBuilder(spark, store, CFG)
    b.build(docs)
    return b, store, docs


def test_boolean_delete_with_negation(spark, built, tmp_path_factory):
    b, store, docs = built
    runner = b.delete_by_query("purgeme -keepme")
    assert runner is not None
    kept = {r["url"] for r in store.read("doc_meta").collect()}
    for i in range(18):
        u = f"https://d{i}.example/x"
        purged = (i % 3 == 0) and not (i % 6 == 0)
        assert (u not in kept) == purged, u
    # equals a fresh build over the survivors, rankings included
    survivors = docs.filter(
        ~(docs.text.contains("purgeme")
          & ~docs.text.contains("keepme")))
    ref = HadoopTableStore(spark, str(tmp_path_factory.mktemp("dbqr")))
    IndexBuilder(spark, ref, CFG).build(survivors)
    for t in ("corpus_stats", "term_stats"):
        assert (sorted(map(tuple, store.read(t).collect()))
                == sorted(map(tuple, ref.read(t).collect()))), t
    qa, qb = QueryEngine(spark, store, CFG), QueryEngine(spark, ref, CFG)
    for q in ("common shared", "purgeme", "keepme"):
        assert qa.top_k(q, k=10) == qb.top_k(q, k=10), q


def test_any_mode_and_lang_filter(spark, built):
    b, store, _docs = built
    # mode="any" + lang predicate: only the German purgeme docs go
    before = store.read("doc_meta").count()
    n_de_purge = (store.read("doc_meta")
                  .filter(F.col("lang") == "de").count())
    runner = b.delete_by_query("purgeme", mode="any", lang="de")
    assert runner is not None
    kept = {r["url"]: r["lang"]
            for r in store.read("doc_meta").collect()}
    # German purgeme docs (i % 3 == 0 and i odd): i = 3, 9, 15
    for i in (3, 9, 15):
        assert f"https://d{i}.example/x" not in kept
    assert store.read("doc_meta").count() == before - 3
    assert n_de_purge >= 3  # sanity: the filter actually narrowed


def test_no_match_and_refusals(built):
    b, _store, _docs = built
    assert b.delete_by_query("absentterm9z") is None
    with pytest.raises(ValueError, match="mass deletion"):
        b.delete_by_query("common", max_delete=3)
    with pytest.raises(ValueError, match="unknown mode"):
        b.delete_by_query("x", mode="fuzzy")
