"""Significant-terms aggregation (X50) — Elasticsearch ``significant_terms``
with the JLH score, over the engine index, pinned against an OracleIndex
mirror that recomputes foreground/background frequencies exhaustively.
"""

from __future__ import annotations

import math

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex, significant_terms

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32)


@pytest.fixture(scope="module")
def eng(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_sig")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, None)


@pytest.fixture(scope="module")
def oracle(tiny_rows):
    return OracleIndex.build(tiny_rows, CFG)


def _pin_oracle_semantics():
    """JLH basics on a hand-built corpus: a term co-occurring with the
    query beats a corpus-wide common term."""
    rows = [
        {"url": f"m{i}", "warc_ts": None, "html": None, "lang": "en",
         "text": "query cooccur common"} for i in range(5)
    ] + [
        {"url": f"b{i}", "warc_ts": None, "html": None, "lang": "en",
         "text": "common filler noise"} for i in range(45)
    ]
    idx = OracleIndex.build(rows, EngineConfig())
    out = significant_terms(idx, "query", n=5)
    terms = [t for t, _f, _b, _s in out]
    # 'cooccur' is fg-exclusive (fg_pct 1.0, bg_pct 0.1) — top;
    # 'common' occurs everywhere (fg_pct == 1.0 but bg_pct == 1.0) —
    # filtered by the fg_pct > bg_pct cut; query term itself excluded
    assert terms[0] == "cooccur"
    assert "common" not in terms
    assert "query" not in terms
    return out


def test_oracle_jlh_semantics():
    out = _pin_oracle_semantics()
    term, fg, bg, score = out[0]
    fgp, bgp = fg / 5.0, bg / 50.0
    assert math.isclose(score, (fgp - bgp) * (fgp / bgp), rel_tol=0,
                        abs_tol=0)


@pytest.mark.parametrize("q", [
    "wireless bluetooth headphones",
    "zipfhead0",
])
def test_engine_matches_oracle(eng, oracle, q):
    got = [(r["term"], r["fg_df"], r["bg_df"], r["score"])
           for r in eng.significant_terms(q, n=15).collect()]
    want = significant_terms(oracle, q, n=15)
    assert [g[:3] for g in got] == [w[:3] for w in want], q
    for (gt, gf, gb, gs), (wt, wf, wb, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-15), (q, gt)
    assert len(got) > 0


def test_engine_exclude_and_min_fg_df(eng, oracle):
    q = "wireless bluetooth headphones"
    with_q = {r["term"] for r in
              eng.significant_terms(q, n=50,
                                    exclude_query_terms=False).collect()}
    qterms = {"wireless", "bluetooth", "headphones"}
    # the query's own terms are maximally significant when not excluded
    assert qterms & with_q
    without = {r["term"] for r in eng.significant_terms(q, n=50).collect()}
    assert not (qterms & without)


def test_engine_sampling_is_deterministic_and_bounded(eng):
    q = "zipfhead0"
    a = eng.significant_terms(q, n=10, sample_ratio=0.5).collect()
    b = eng.significant_terms(q, n=10, sample_ratio=0.5).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    with pytest.raises(ValueError):
        eng.significant_terms(q, sample_ratio=0.0)
    with pytest.raises(ValueError):
        eng.significant_terms(q, sample_ratio=1.5)


def test_empty_query_returns_empty(eng):
    assert eng.significant_terms("").collect() == []
    assert eng.significant_terms("absenttermxyz9z").collect() == []
