"""Keyset ("search_after") pagination (X46).

OFFSET paging (the reference's ``LIMIT ? OFFSET ?``,
``ProductRepository.java:81``) costs O(offset) per page; the cursor path
costs O(k) at any depth. These tests pin that walking the cursor chain
reproduces the oracle's full ranking exactly — including across filtered
and thresholded variants — and agrees with offset paging page-for-page.
"""

from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.corpus import QUERY_CORPUS


@pytest.fixture(scope="module")
def sa_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("sa_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, cfg).build(docs)
    return QueryEngine(spark, store, cfg)


def _walk_pages(qe, query: str, k: int, **kw) -> list[tuple[int, float]]:
    out, cursor, pages = [], None, 0
    while True:
        env = qe.search_after(query, k=k, cursor=cursor, **kw)
        out.extend((int(r["doc_id"]), float(r["score"]))
                   for r in env["results"])
        cursor = env["next_cursor"]
        pages += 1
        assert pages < 500, "cursor chain did not terminate"
        if cursor is None:
            return out


def test_cursor_walk_reproduces_full_ranking(sa_built, tiny_oracle):
    """Concatenated cursor pages == the oracle's complete ranking, ids
    AND scores — so no hit is dropped or duplicated at page boundaries,
    including exact score ties split across pages (page size 3 forces
    many boundaries)."""
    qe = sa_built
    q = QUERY_CORPUS[0].query
    full = tiny_oracle.top_k(q, k=tiny_oracle.n_docs)
    walked = _walk_pages(qe, q, k=3)
    assert [d for d, _ in walked] == [d for d, _ in full]
    import math
    for (gd, gs), (ed, es) in zip(walked, full):
        assert gd == ed and math.isclose(gs, es, abs_tol=1e-9)


def test_cursor_page_equals_offset_page(sa_built):
    """Page 2 fetched by cursor == page 2 fetched by OFFSET."""
    qe = sa_built
    q = QUERY_CORPUS[1].query
    p1 = qe.search_after(q, k=5)
    by_cursor = qe.search_after(q, k=5, cursor=p1["next_cursor"])
    by_offset = qe.search(q, k=5, offset=5, count_mode="none")
    assert ([r["doc_id"] for r in by_cursor["results"]]
            == [r["doc_id"] for r in by_offset["results"]])


def test_cursor_with_structured_filter(sa_built, tiny_oracle):
    """Cursor pages respect structured filters: the walk equals the
    oracle's filtered ranking."""
    qe = sa_built
    q = QUERY_CORPUS[0].query
    langs = {d: m["lang"] for d, m in tiny_oracle.doc_meta.items()}
    full = [(d, s) for d, s in tiny_oracle.top_k(q, k=tiny_oracle.n_docs)
            if langs.get(d) == "en"]
    walked = _walk_pages(qe, q, k=4, lang="en")
    assert [d for d, _ in walked] == [d for d, _ in full]


def test_cursor_with_min_score(sa_built, tiny_oracle):
    """Cursor + threshold compose: only docs >= min_score, all of them,
    in order."""
    qe = sa_built
    q = "zipfhead0 zipfhead1"  # head terms: plenty of hits at tiny scale
    full = tiny_oracle.top_k(q, k=tiny_oracle.n_docs)
    assert len(full) >= 6
    thr = full[4][1]  # 5th-best score, inclusive
    expected = [d for d, s in full if s >= thr]
    walked = _walk_pages(qe, q, k=2, min_score=thr)
    assert [d for d, _ in walked] == expected


def test_exhausted_cursor_returns_empty_page(sa_built):
    qe = sa_built
    q = QUERY_CORPUS[0].query
    env = qe.search_after(q, k=2, cursor=(-1.0, 1 << 62))
    assert env["results"] == [] and env["next_cursor"] is None
