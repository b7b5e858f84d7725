"""Anchor-text field index (X58): in-link anchors aggregated per target
and indexed as a first-class BM25F field, pinned rank-identical against
an independently-computed oracle; plus the persisted PageRank
``static_rank`` table serving ``boosted_top_k(static="pagerank")``.

The link structure is authored literally in this file, so the expected
anchor text per url is known by construction — the oracle never calls
the linkgraph operators.
"""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex, bm25f_top_k
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore
from semantic_search_engine_spark.textproc import doc_id_for_url

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)

N = 24


def _url(i: int) -> str:
    return f"https://h{i}.example/p{i}"


def _links_of(i: int) -> list[tuple[int, str, bool]]:
    """(dst index, anchor text, nofollow) — the authored link layout."""
    out = [((i * 3 + 1) % N, f"visit page {(i * 3 + 1) % N} "
            f"topic{((i * 3 + 1) % N) % 5}", False),
           ((i * 5 + 2) % N, f"see also {(i * 5 + 2) % N} "
            f"topic{((i * 5 + 2) % N) % 5}", i % 6 == 0)]
    if i % 4 == 1:          # anchor-only term: never in any body/title
        out.append((7, f"quantumflux portal {i}", False))
    return out


def _page(i: int) -> bytes:
    links = []
    for j, anchor, nofollow in _links_of(i):
        rel = ' rel="nofollow"' if nofollow else ""
        links.append(f'<a href="{_url(j)}"{rel}>{anchor}</a>')
    if i == 3:              # external target: aggregates onto no doc
        links.append('<a href="https://external.example/x">elsewhere</a>')
    body = (f"body words doc{i} common shared topic{i % 5} "
            f"filler{i} filler{i}")
    return (f"<html><head><title>page {i}</title></head><body>"
            f"<p>{body}</p><nav>{''.join(links)}</nav>"
            f"</body></html>").encode()


def _rows() -> list[dict]:
    return [dict(url=_url(i), warc_ts=None, html=_page(i), text=None,
                 lang="en") for i in range(N)]


def _expected_anchor_text() -> dict[str, str]:
    """anchor_text per url by construction: distinct in-link anchors,
    lexicographic, space-joined (mirrors the documented aggregate
    semantics, computed independently here)."""
    by_dst: dict[str, set[str]] = {_url(i): set() for i in range(N)}
    for i in range(N):
        for j, anchor, _nofollow in _links_of(i):   # follow_only=False
            by_dst[_url(j)].add(anchor)
    return {u: " ".join(sorted(a)) for u, a in by_dst.items()}


@pytest.fixture(scope="module")
def built_anchor(spark, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("anchor")))
    docs = spark.createDataFrame(
        _rows(), "url string, warc_ts timestamp, html binary, "
                 "text string, lang string")
    b = IndexBuilder(spark, store, CFG)
    b.build(docs)
    b.build_link_field(docs)
    return b, QueryEngine(spark, store, CFG), docs


@pytest.fixture(scope="module")
def anchor_oracles():
    text_oracle = OracleIndex.build(_rows(), CFG)
    anchor_rows = [dict(url=u, warc_ts=None, html=None, text=t, lang="en")
                   for u, t in _expected_anchor_text().items()]
    return text_oracle, OracleIndex.build(anchor_rows, CFG)


ANCHOR_QUERIES = ["visit", "topic2", "quantumflux", "doc5 shared",
                  "see also", "absentzz"]


@pytest.mark.parametrize("q", ANCHOR_QUERIES)
def test_anchor_field_rank_identical_to_oracle(built_anchor,
                                               anchor_oracles, q):
    _b, qe, _docs = built_anchor
    text_o, anchor_o = anchor_oracles
    weights = {"text": 1.0, "anchor": 2.5}
    got = qe.weighted_top_k(q, field_weights=weights, k=10)
    want = bm25f_top_k({"text": (text_o, 1.0), "anchor": (anchor_o, 2.5)},
                       q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_anchor_only_term_retrieves_link_target(built_anchor):
    """'quantumflux' never appears in any page's own text — only in
    anchors pointing at doc 7. The anchor field must retrieve it."""
    _b, qe, _docs = built_anchor
    got = qe.weighted_top_k("quantumflux",
                            field_weights={"anchor": 1.0}, k=5)
    assert got and got[0][0] == doc_id_for_url(_url(7))
    # and the body-only index can't see it
    assert qe.weighted_top_k("quantumflux",
                             field_weights={"text": 1.0}, k=5) == []


def test_anchor_corpus_covers_all_docs(built_anchor):
    """Docs with no in-links index with an empty anchor field — the
    field's corpus stats span the whole corpus (n_docs identical to the
    text field's), not just linked-to pages."""
    b, _qe, _docs = built_anchor
    n_text = b.store.read("corpus_stats").collect()[0]["n_docs"]
    n_anchor = b.store.read("corpus_stats_anchor").collect()[0]["n_docs"]
    assert n_anchor == n_text == N


def test_link_field_build_resumes(built_anchor):
    """A second build over the unchanged corpus skips every stage."""
    b, _qe, docs = built_anchor
    runner = b.build_link_field(docs)
    assert runner.metrics, "no stages recorded"
    assert all(m["skipped"] for m in runner.metrics)


def test_static_rank_table_and_pagerank_blend(built_anchor):
    b, qe, docs = built_anchor
    b.build_static_rank(docs)
    ranks = b.store.read("static_rank")
    total = sum(r["rank"] for r in ranks.collect())
    assert total == pytest.approx(1.0, rel=1e-9)

    q, w = "shared common", 50.0
    via_name = qe.boosted_top_k(q, static="pagerank", w_static=w, k=10)
    via_df = qe.boosted_top_k(q, static_df=ranks, w_static=w, k=10)
    exhaustive = qe.boosted_top_k(q, static_df=ranks, w_static=w, k=10,
                                  mode="exhaustive")
    assert via_name == via_df
    assert [d for d, _ in via_name] == [d for d, _ in exhaustive]
    for (_, gs), (_, ws) in zip(via_name, exhaustive):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_pagerank_static_requires_table(spark, tiny_corpus_dir,
                                        tmp_path_factory):
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("norank")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    qe = QueryEngine(spark, store, CFG)
    with pytest.raises(ValueError, match="static_rank"):
        qe.boosted_top_k("anything", static="pagerank", k=5)
