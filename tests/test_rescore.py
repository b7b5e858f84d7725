"""ES rescore-API parity (X88): BM25 WAND window re-ranked by embedding
cosine, pinned bit-identical against the oracle's window+combine."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex, semantic_top_k

DIM = 32
CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                   shuffle_partitions=8, block_size=32)


@pytest.fixture(scope="module")
def rescore_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("resc_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    b = IndexBuilder(spark, store, CFG)
    b.build(docs)
    b.build_embeddings(dim=DIM)
    return QueryEngine(spark, store, CFG)


@pytest.fixture(scope="module")
def oracle(tiny_rows):
    return OracleIndex.build(tiny_rows, CFG)


def _oracle_rescore(oidx, q, k, window, qw, rw):
    wnd = oidx.top_k(q, k=window)
    cosmap = dict(semantic_top_k(oidx, q, DIM, k=10 ** 6))
    out = [(d, qw * s + rw * cosmap.get(d, 0.0)) for d, s in wnd]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("qw,rw", [(1.0, 1.0), (0.5, 2.0)])
@pytest.mark.parametrize("q", ["zipfhead0 zipfhead1", "zipfhead2",
                               "wireless bluetooth headphones"])
def test_rescore_matches_oracle(rescore_built, oracle, q, qw, rw):
    got = rescore_built.rescore_top_k(q, k=10, window=50,
                                      query_weight=qw,
                                      rescore_weight=rw)
    want = _oracle_rescore(oracle, q, 10, 50, qw, rw)
    assert [d for d, _ in got] == [d for d, _ in want], (q, qw, rw)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == ws, (q, qw, rw)


def test_zero_rescore_weight_keeps_bm25_order(rescore_built):
    q = "zipfhead0 zipfhead1"
    plain = [d for d, _ in rescore_built.top_k(q, k=10)]
    resc = [d for d, _ in rescore_built.rescore_top_k(
        q, k=10, window=50, rescore_weight=0.0)]
    assert resc == plain


def test_window_bounds_recall(rescore_built):
    """Rescore can reorder WITHIN the window but never surface a doc
    outside it — the rescore API's contract."""
    q = "zipfhead0 zipfhead1"
    window_docs = {d for d, _ in rescore_built.top_k(q, k=20)}
    resc = rescore_built.rescore_top_k(q, k=20, window=20,
                                       rescore_weight=5.0)
    assert {d for d, _ in resc} <= window_docs


def test_absent_term_is_empty(rescore_built):
    assert rescore_built.rescore_top_k("absentterm9z", k=5) == []


def test_output_columns(rescore_built):
    df = rescore_built.rescore_top_k_df("zipfhead0", k=3)
    assert df.columns == ["doc_id", "score", "bm25", "cosine"]
    rows = df.collect()
    for r in rows:
        assert r["score"] == pytest.approx(
            r["bm25"] + (r["cosine"] or 0.0), abs=1e-12)
