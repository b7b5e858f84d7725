"""More-like-this retrieval and the index-stats health summary."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)


@pytest.fixture(scope="module")
def built_mlt(spark, tiny_corpus_dir, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_mlt")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, CFG)


@pytest.fixture(scope="module")
def mlt_oracle(tiny_rows):
    return OracleIndex.build(tiny_rows, CFG)


def _docs_with_mlt_terms(oracle, n=3):
    out = []
    for did in sorted(oracle.doc_positions):
        if oracle.mlt_terms(did):
            out.append(did)
        if len(out) == n:
            break
    assert out, "no docs with MLT-eligible terms in tiny corpus"
    return out


def test_mlt_terms_match_oracle(built_mlt, mlt_oracle):
    for did in _docs_with_mlt_terms(mlt_oracle):
        assert built_mlt.mlt_terms(did) == mlt_oracle.mlt_terms(did)


def test_mlt_term_selection_rules(mlt_oracle):
    did = _docs_with_mlt_terms(mlt_oracle)[0]
    terms = mlt_oracle.mlt_terms(did, min_tf=2, min_df=2,
                                 max_df_ratio=0.25)
    tpos = mlt_oracle.doc_positions[did]
    for t in terms:
        assert len(tpos[t]) >= 2
        assert 2 <= mlt_oracle.df(t) <= 0.25 * mlt_oracle.n_docs
    # cap respected and deterministic ordering by (tf*idf DESC, term ASC)
    assert len(terms) <= 20
    keys = [(-len(tpos[t]) * mlt_oracle.idf(t), t) for t in terms]
    assert keys == sorted(keys)


def test_more_like_this_rank_identical(built_mlt, mlt_oracle):
    for did in _docs_with_mlt_terms(mlt_oracle):
        got = built_mlt.more_like_this(did, k=10)
        want = mlt_oracle.more_like_this(did, k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12)
        # the source doc never appears in its own related list
        assert did not in [d for d, _ in got]


def test_more_like_this_unknown_doc(built_mlt):
    assert built_mlt.more_like_this(-12345, k=5) == []


def test_index_stats_consistent(built_mlt, mlt_oracle):
    s = built_mlt.index_stats()
    assert s["n_docs"] == mlt_oracle.n_docs
    assert s["avg_doc_len"] == pytest.approx(mlt_oracle.avg_doc_len)
    assert s["n_terms"] == len(mlt_oracle.postings)
    assert s["n_postings"] == sum(len(pl) for pl
                                  in mlt_oracle.postings.values())
    assert s["postings_bytes"] > 0
    assert s["n_blocks"] >= s["n_terms"]  # >= one block per (term, bucket)
    assert 1 <= s["n_buckets"] <= CFG.n_doc_buckets
    assert s["max_bucket_docs"] >= s["min_bucket_docs"] >= 1
    # uniform hash bucketing: skew stays mild even on the tiny corpus
    assert s["max_bucket_docs"] <= 4 * s["min_bucket_docs"]
