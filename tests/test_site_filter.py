"""Web-search ``site:`` operator (X68): subdomain-inclusive host
filtering through the structured-filter fast path, host facets, and the
query-string ``site:``/``-site:`` extraction — pinned against a Python
urlparse oracle over the same corpus."""
from __future__ import annotations

from urllib.parse import urlparse

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.plans.boolean import extract_site_filters

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32)
Q = "zipfhead0 zipfhead1"
SITE = "site0001.example"


def test_extract_site_filters():
    assert extract_site_filters("foo site:a.com bar") == ("foo bar",
                                                          "a.com", None)
    assert extract_site_filters("-site:B.com foo") == ("foo", None,
                                                       "b.com")
    assert extract_site_filters("x site:a.com site:b.com") == \
        ("x", "b.com", None)  # last wins
    assert extract_site_filters("site:a.com -site:c.d x") == \
        ("x", "a.com", "c.d")
    assert extract_site_filters("opposite:math stays") == \
        ("opposite:math stays", None, None)  # mid-word, not an operator
    assert extract_site_filters("site: gap") == ("gap", None, None)


@pytest.fixture(scope="module")
def eng(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_site")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, None)


@pytest.fixture(scope="module")
def oracle_rows(eng):
    """(doc_id, host, score) for every candidate of Q, via the exhaustive
    scorer + Python urlparse — independent of the filter under test."""
    meta = {r["doc_id"]: r["url"]
            for r in eng.store.read("doc_meta").select("doc_id", "url")
            .collect()}
    scored = eng.scores_df(Q).collect()
    return [(r["doc_id"], urlparse(meta[r["doc_id"]]).hostname.lower(),
             r["score"]) for r in scored]


def _py_top(oracle_rows, pred, k=10):
    keep = [(d, s) for d, h, s in oracle_rows if pred(h)]
    keep.sort(key=lambda x: (-x[1], x[0]))
    return keep[:k]


def test_site_filter_fast_path_matches_oracle(eng, oracle_rows):
    got = [(r["doc_id"], r["score"])
           for r in eng.wand_top_k_df(Q, k=10, site=SITE).collect()]
    want = _py_top(oracle_rows, lambda h: h == SITE or
                   h.endswith("." + SITE))
    assert got == [(d, pytest.approx(s, abs=1e-9)) for d, s in want]
    assert len(got) > 0


def test_neg_site_excludes(eng, oracle_rows):
    got = [(r["doc_id"], r["score"])
           for r in eng.wand_top_k_df(Q, k=10, neg_site=SITE).collect()]
    want = _py_top(oracle_rows, lambda h: not (h == SITE or
                                               h.endswith("." + SITE)))
    assert got == [(d, pytest.approx(s, abs=1e-9)) for d, s in want]


def test_subdomain_inclusive_parent_domain_matches_all(eng, oracle_rows):
    # every corpus host is siteNNNN.example -> site="example" is a no-op
    plain = [r["doc_id"] for r in eng.wand_top_k_df(Q, k=10).collect()]
    parent = [r["doc_id"]
              for r in eng.wand_top_k_df(Q, k=10, site="example")
              .collect()]
    assert parent == plain


def test_search_envelope_and_exhaustive_agree(eng, oracle_rows):
    fast = eng.search(Q, k=5, site=SITE, count_mode="none")
    slow = eng.search(Q, k=5, site=SITE, count_mode="exact",
                      mode="exhaustive")
    assert [r["doc_id"] for r in fast["results"]] == \
        [r["doc_id"] for r in slow["results"]]
    n_match = sum(1 for _, h, _ in oracle_rows
                  if h == SITE or h.endswith("." + SITE))
    assert slow["total_count"] == n_match
    for r in fast["results"]:
        assert urlparse(r["url"]).hostname.lower() == SITE


def test_approx_count_all_buckets_is_exact(eng, oracle_rows):
    n_match = sum(1 for _, h, _ in oracle_rows
                  if h == SITE or h.endswith("." + SITE))
    got = eng.approx_count(Q, site=SITE,
                           sample_buckets=list(range(CFG.n_doc_buckets)))
    assert got == n_match


def test_host_facet_matches_python_counts(eng, oracle_rows):
    got = {r["host"]: r["n_docs"]
           for r in eng.facet_counts(Q, by="host").collect()}
    want: dict[str, int] = {}
    for _, h, _ in oracle_rows:
        want[h] = want.get(h, 0) + 1
    assert got == want
