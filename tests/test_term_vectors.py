"""Term vectors API (X75): per-doc (term, tf, positions, df, idf)
recomputed from the stored field — pinned against the oracle's
tokenizer/positions and the engine's own term_stats/idf."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.plans.wand import bm25_idf
from semantic_search_engine_spark.sources.store import HadoopTableStore
from semantic_search_engine_spark.textproc import token_positions

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus_dir, tmp_path_factory, tiny_rows):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_tv")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    eng = QueryEngine(spark, store, CFG)
    oracle = OracleIndex.build(tiny_rows, CFG)
    return eng, oracle


def test_term_vectors_match_oracle(spark, built):
    eng, oracle = built
    doc_ids = sorted(oracle.doc_positions)[:3]
    rows = eng.term_vectors(doc_ids).collect()
    got = {(r["doc_id"], r["term"]): r for r in rows}
    n_docs = len(oracle.doc_positions)
    for d in doc_ids:
        want_pos = oracle.doc_positions[d]
        got_terms = {t for (dd, t) in got if dd == d}
        assert got_terms == set(want_pos), d
        for t, plist in want_pos.items():
            r = got[(d, t)]
            assert r["tf"] == len(plist)
            assert list(r["positions"]) == plist
            want_df = len(oracle.postings[t])
            assert r["df"] == want_df
            assert r["idf"] == pytest.approx(
                bm25_idf(n_docs, want_df), abs=1e-12)


def test_term_vectors_positions_optional(spark, built):
    eng, oracle = built
    d = sorted(oracle.doc_positions)[0]
    rows = eng.term_vectors([d], with_positions=False).collect()
    assert rows and all(r["positions"] is None for r in rows)
    assert {r["term"] for r in rows} == set(oracle.doc_positions[d])


def test_term_vectors_bounds(spark, built):
    eng, _ = built
    assert eng.term_vectors([]).count() == 0
    with pytest.raises(ValueError, match="max_docs"):
        eng.term_vectors(list(range(200)), max_docs=100)


def test_unknown_doc_yields_nothing(spark, built):
    eng, _ = built
    assert eng.term_vectors([999999999]).count() == 0
