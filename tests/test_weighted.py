"""Weighted multi-field (BM25F-style) ranking: title + body indexes
combined per-query with field weights — the Postgres
``setweight(to_tsvector(title),'A') || setweight(...body,'D')``
composition, run as ONE WAND job over the union of both fields'
postings."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex, bm25f_top_k
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore
from semantic_search_engine_spark.textproc import extract_html, resolve_text

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)


@pytest.fixture(scope="module")
def built_dual(spark, tiny_corpus_dir, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_bm25f")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    b = IndexBuilder(spark, store, CFG)
    b.build(docs)
    b.build(docs, field="title")  # derives from the committed text pass
    return QueryEngine(spark, store, CFG)


@pytest.fixture(scope="module")
def dual_oracles(tiny_rows):
    text_oracle = OracleIndex.build(tiny_rows, CFG)
    title_rows = []
    for r in tiny_rows:
        if r["url"] is None:
            continue
        if resolve_text(r.get("text"), r.get("html"),
                        CFG.prefer_provided_text) is None:
            continue
        title, _body = extract_html(r.get("html"))
        title_rows.append(dict(url=r["url"], warc_ts=r.get("warc_ts"),
                               html=None, text=title, lang=r.get("lang")))
    return text_oracle, OracleIndex.build(title_rows, CFG)


WEIGHTED_QUERIES = ["wireless bluetooth headphones", "entities", "page",
                    "smartphone", "absentterm9z"]


@pytest.mark.parametrize("q", WEIGHTED_QUERIES)
def test_weighted_rank_identical_to_oracle(built_dual, dual_oracles, q):
    text_o, title_o = dual_oracles
    weights = {"text": 1.0, "title": 2.5}
    got = built_dual.weighted_top_k(q, field_weights=weights, k=10)
    want = bm25f_top_k({"text": (text_o, 1.0), "title": (title_o, 2.5)},
                       q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_weighted_single_field_degenerates_to_wand(built_dual):
    q = "wireless bluetooth headphones"
    got = built_dual.weighted_top_k(q, field_weights={"text": 1.0}, k=10)
    plain = built_dual.top_k(q, k=10)
    assert got == plain


def test_weighted_title_boost_promotes_title_doc(built_dual, dual_oracles):
    """Doc 9 plants the query terms in its <title> with a short body —
    under a strong title weight it must outrank its body-only position."""
    text_o, title_o = dual_oracles
    q = "wireless bluetooth headphones"
    boosted = built_dual.weighted_top_k(
        q, field_weights={"text": 1.0, "title": 10.0}, k=10)
    title_only = bm25f_top_k({"title": (title_o, 1.0)}, q, k=1)
    assert title_only, "title oracle found no match for the planted query"
    top_title_doc = title_only[0][0]
    ranks = [d for d, _ in boosted]
    assert top_title_doc in ranks[:3]


def test_weighted_rejects_unknown_field(built_dual):
    with pytest.raises(Exception):
        built_dual.weighted_top_k("x", field_weights={"nope": 1.0}, k=5)
