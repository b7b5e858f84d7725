"""Link-graph operators (X57): href/anchor extraction, PageRank pinned
against a dense numpy power iteration, anchor-text aggregation, and the
end-to-end pagerank→boosted-retrieval blend (static_df plug-in).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from semantic_search_engine_spark.operators.linkgraph import (
    anchor_text_agg,
    extract_links,
    pagerank,
)

# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------

PAGE = """<html><head><title>t</title></head><body>
<a href="/relative/page">Relative <b>Link</b></a>
<a href="https://other.example/abs?q=1#frag">Absolute&nbsp;&amp; entity</a>
<a rel="nofollow" href="sibling.html">NoFollow</a>
<a href="javascript:void(0)">js</a>
<a href="mailto:x@example.com">mail</a>
<a href="#top">fragment only</a>
<a href="ftp://files.example/f">ftp</a>
<a class="c1" href='single-quoted'>SQ</a>
<a href=unquoted>UQ</a>
</body></html>"""


@pytest.fixture(scope="module")
def links(spark):
    docs = spark.createDataFrame(
        [("https://site.example/dir/index.html", PAGE.encode()),
         ("https://empty.example/", None),
         ("https://empty2.example/", b"")],
        "url string, html binary")
    rows = extract_links(docs).collect()
    return {(r["src_url"], r["dst_url"]): r for r in rows}


def test_extract_resolution_and_filtering(links):
    src = "https://site.example/dir/index.html"
    got = {d for s, d in links if s == src}
    assert got == {
        "https://site.example/relative/page",
        "https://other.example/abs?q=1",        # fragment dropped
        "https://site.example/dir/sibling.html",  # relative to dir
        "https://site.example/dir/single-quoted",
        "https://site.example/dir/unquoted",
    }
    # js/mailto/fragment/ftp all skipped; empty htmls produce nothing
    assert all(s == src for s, _ in links)


def test_extract_anchor_text_and_nofollow(links):
    src = "https://site.example/dir/index.html"
    r = links[(src, "https://site.example/relative/page")]
    assert r["anchor"] == "Relative Link"        # tags stripped, ws-normal
    assert r["nofollow"] is False
    r = links[(src, "https://other.example/abs?q=1")]
    assert r["anchor"] == "Absolute & entity"  # entities decoded, nbsp→ws
    r = links[(src, "https://site.example/dir/sibling.html")]
    assert r["nofollow"] is True


def test_extract_on_corpus_nav_links(spark, tiny_corpus_dir):
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    sample = docs.limit(30)
    out = extract_links(sample)
    row = (out.filter(out.dst_url.endswith("/section/0"))
           .select("src_url", "anchor").first())
    assert row is not None
    assert row["anchor"] == "internal nav link 0"
    # host-relative hrefs resolve against each page's own host
    assert row["dst_url" if False else "src_url"].startswith("https://site")


# ---------------------------------------------------------------------------
# pagerank vs dense numpy power iteration
# ---------------------------------------------------------------------------

def numpy_pagerank(edges: list[tuple[int, int]], n: int, d: float,
                   iters: int) -> np.ndarray:
    """Dense reference with identical semantics: uniform teleport,
    dangling mass redistributed uniformly, parallel edges collapsed,
    self-loops dropped."""
    es = {(s, t) for s, t in edges if s != t}
    out = np.zeros(n)
    for s, _ in es:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, t in es:
            nxt[t] += r[s] / out[s]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (nxt + dangling / n)
    return r


def _spark_pr(spark, edges, n_iter=10, d=0.85, **kw):
    df = spark.createDataFrame(
        [(f"n{s}", f"n{t}") for s, t in edges],
        "src_url string, dst_url string")
    rows = pagerank(df, damping=d, n_iter=n_iter, **kw).collect()
    return {r["url"]: r["rank"] for r in rows}


GRAPH = [  # hub (0), chain, dangling sink (4), cycle back, parallel dup
    (0, 1), (0, 2), (0, 3), (1, 2), (2, 0), (3, 4), (5, 0), (5, 4),
    (1, 2),  # parallel edge: must collapse
    (3, 3),  # self-loop: must drop
]


def test_pagerank_matches_numpy(spark):
    got = _spark_pr(spark, GRAPH)
    want = numpy_pagerank(GRAPH, 6, 0.85, 10)
    assert len(got) == 6
    for i in range(6):
        assert math.isclose(got[f"n{i}"], want[i], rel_tol=1e-9), i


def test_pagerank_mass_conserved_and_ordering(spark):
    got = _spark_pr(spark, GRAPH)
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)
    # the hub pointed at by 2 pages outranks the leaf only reachable
    # via one link from it
    assert got["n0"] > got["n3"]


def test_pagerank_two_node_cycle_uniform(spark):
    got = _spark_pr(spark, [(0, 1), (1, 0)])
    assert math.isclose(got["n0"], 0.5, rel_tol=1e-12)
    assert math.isclose(got["n1"], 0.5, rel_tol=1e-12)


def test_pagerank_rejects_bad_damping(spark):
    df = spark.createDataFrame([("a", "b")], "src_url string, dst_url string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)


def test_pagerank_honors_nofollow(spark):
    df = spark.createDataFrame(
        [("a", "b", False), ("a", "c", True), ("b", "a", False)],
        "src_url string, dst_url string, nofollow boolean")
    got = {r["url"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    assert "c" not in got          # only reachable via a nofollow edge
    got_all = {r["url"]: r["rank"]
               for r in pagerank(df, n_iter=5, follow_only=False).collect()}
    assert "c" in got_all


# ---------------------------------------------------------------------------
# anchor aggregation
# ---------------------------------------------------------------------------

def test_anchor_text_agg_dedup_cap_order(spark):
    rows = ([("s1", "d1", f"anchor{i:02d}", False) for i in range(40)]
            + [("s2", "d1", "anchor00", False),   # dup collapses
               ("s1", "d2", "zz", False), ("s2", "d2", "aa", False),
               ("s3", "d2", "", False), ("s4", "d2", None, False)])
    df = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor string, "
              "nofollow boolean")
    got = {r["url"]: r["anchor_text"]
           for r in anchor_text_agg(df, max_anchors=8).collect()}
    assert got["d2"] == "aa zz"                     # sorted, empties dropped
    parts = got["d1"].split(" ")
    assert parts == [f"anchor{i:02d}" for i in range(8)]  # capped at 8


# ---------------------------------------------------------------------------
# end-to-end: pagerank output plugs into boosted retrieval (static_df)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def eng(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_lg")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    IndexBuilder(spark, store, cfg).build(docs)
    return QueryEngine(spark, store, None)


def test_boosted_with_static_df_matches_exhaustive(eng, spark):
    q = "zipfhead0 zipfhead1"
    meta = eng.store.read("doc_meta").select("url", "doc_id").collect()
    rng = np.random.default_rng(7)
    pri = [(r["url"], float(p))
           for r, p in zip(meta, rng.random(len(meta)))]
    sdf = spark.createDataFrame(pri, "url string, rank double")
    fast = eng.boosted_top_k(q, w_static=2.0, k=10, static_df=sdf)
    slow = eng.boosted_top_k(q, w_static=2.0, k=10, static_df=sdf,
                             mode="exhaustive")
    assert [d for d, _ in fast] == [d for d, _ in slow]
    for (_, gs), (_, ws) in zip(fast, slow):
        assert math.isclose(gs, ws, rel_tol=0, abs_tol=1e-9)
    # a huge prior on one matching doc forces it to rank 1
    plain = eng.boosted_top_k(q, w_static=0.0, k=10)
    target = plain[-1][0]
    url = next(r["url"] for r in meta if r["doc_id"] == target)
    one = spark.createDataFrame([(url, 1.0)], "url string, rank double")
    forced = eng.boosted_top_k(q, w_static=1e6, k=10, static_df=one)
    assert forced[0][0] == target


def test_boosted_static_df_missing_docs_default_zero(eng, spark):
    q = "zipfhead0"
    empty = spark.createDataFrame([], "url string, rank double")
    with_empty = eng.boosted_top_k(q, w_static=5.0, k=10, static_df=empty)
    plain = eng.boosted_top_k(q, w_static=0.0, k=10)
    assert [d for d, _ in with_empty] == [d for d, _ in plain]
    for (_, a), (_, b) in zip(with_empty, plain):
        assert math.isclose(a, b, rel_tol=0, abs_tol=1e-12)


def test_boosted_static_df_rejects_bad_shape(eng, spark):
    bad = spark.createDataFrame([("u", 1.0, 2.0)],
                                "url string, a double, b double")
    with pytest.raises(ValueError, match="static_df"):
        eng.boosted_top_k_df("x", static_df=bad)
