"""Cross-feature composition (late r3): orthogonal features stacked in
ONE query must stay exact — every fast path pinned against the
exhaustive plan or the naive oracle with the SAME composed inputs."""
from __future__ import annotations

import math

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                   shuffle_partitions=8, block_size=32)
Q = "zipfhead0 zipfhead1"


@pytest.fixture(scope="module")
def eng(spark, tiny_corpus_dir, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_cmp")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    b = IndexBuilder(spark, store, CFG)
    b.build(docs)
    b.build_suffix()
    b.build_trigram()
    return QueryEngine(spark, store, CFG)


@pytest.fixture(scope="module")
def oracle(tiny_rows):
    return OracleIndex.build(tiny_rows, CFG)


def test_all_structured_filters_stack_on_fast_path(eng):
    """lang + warc_ts range + site + min_score TOGETHER: WAND fast path
    ≡ exhaustive, down to float scores."""
    meta = eng.store.read("doc_meta")
    ts = sorted(r["warc_ts"] for r in meta.select("warc_ts").collect())
    lo, hi = ts[20], ts[180]
    kw = dict(lang="en", warc_ts_min=lo, warc_ts_max=hi,
              site="example", min_score=0.01)
    fast = [(r["doc_id"], r["score"])
            for r in eng.wand_top_k_df(Q, k=10, **kw).collect()]
    slow = (eng._scored_filtered(Q, kw["min_score"], kw["lang"],
                                 kw["warc_ts_min"], kw["warc_ts_max"],
                                 site=kw["site"])
            .orderBy("score", ascending=False).collect())
    slow_top = sorted([(r["doc_id"], r["score"]) for r in slow],
                      key=lambda x: (-x[1], x[0]))[:10]
    assert len(slow_top) > 0  # the composed filters must keep some docs
    assert len(fast) == len(slow_top)
    assert [d for d, _ in fast] == [d for d, _ in slow_top]
    for (_, a), (_, b) in zip(fast, slow_top):
        assert math.isclose(a, b, rel_tol=0, abs_tol=1e-9)


def test_batch_with_site_filter_matches_singles(eng):
    queries = [Q, "zipfhead2", "wireless bluetooth headphones"]
    batch = eng.batch_wand_top_k_df(queries, k=5, lang="en",
                                    site="example").collect()
    by_q: dict[int, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"]))
    for qi, q in enumerate(queries):
        single = [(r["doc_id"], r["score"])
                  for r in eng.wand_top_k_df(q, k=5, lang="en",
                                             site="example").collect()]
        got = sorted(by_q.get(qi, []), key=lambda x: (-x[1], x[0]))
        assert got == single, q


def test_every_term_expansion_kind_in_one_boolean_query(eng, oracle):
    """prefix + suffix + infix + regex + NOT + OR in a single websearch
    query, engine ≡ naive oracle (each kind expands from its own
    dictionary)."""
    q = ('zipfhead0* OR *head1 OR *ipfhead* OR /zipfhead[23]/ '
         '-zipfhead4')
    got = {int(r["doc_id"]): float(r["score"])
           for r in eng.boolean_matches_df(q).collect()}
    want = oracle.boolean_matches(q)
    assert got.keys() == want.keys() and len(want) > 0
    for d, sc in want.items():
        assert got[d] == pytest.approx(sc, rel=1e-12)


def test_site_filter_composes_with_keyset_pagination(eng):
    """Two keyset pages with lang filter walk the same list as one big
    filtered page (cursor correctness under filters)."""
    full = eng.search(Q, k=10, lang="en", count_mode="none")
    page1 = eng.search_after(Q, k=5, lang="en")
    cur = (page1["results"][-1]["score"], page1["results"][-1]["doc_id"])
    page2 = eng.search_after(Q, k=5, cursor=cur, lang="en")
    walked = [r["doc_id"] for r in page1["results"] + page2["results"]]
    assert walked == [r["doc_id"] for r in full["results"]]
