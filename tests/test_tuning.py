"""BM25 sweep (X80): the grid point equal to the engine config
reproduces the engine's exhaustive ranking exactly; metrics respond to
the grid; validation edges."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.tuning import sweep_bm25
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)
QUERIES = [(1, "zipfhead0 zipfhead1"), (2, "wireless bluetooth headphones"),
           (3, "zipfhead2")]


@pytest.fixture(scope="module")
def built(spark, tiny_corpus_dir, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_tun")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    eng = QueryEngine(spark, store, CFG)
    # judgments: the engine's OWN top-5 per query graded 5-r (so the
    # engine config is, by construction, a strong grid point)
    rows = []
    for qid, q in QUERIES:
        for r, (d, _s) in enumerate(eng.top_k(q, k=5), start=1):
            rows.append((qid, d, float(5 - r)))
    judg = spark.createDataFrame(rows, "query_id long, doc_id long, grade double")
    return store, eng, judg


def test_engine_grid_point_reproduces_engine_ranking(spark, built):
    store, eng, judg = built
    grid = [(CFG.k1, CFG.b), (0.5, 0.2), (2.0, 0.9)]
    out = sweep_bm25(store, QUERIES, judg, grid, k=10)
    assert len(out) == 3
    engine_point = [d for d in out
                    if d["k1"] == CFG.k1 and d["b"] == CFG.b][0]
    # engine's own top-10: every judged doc sits in the top-5 => with
    # judgments drawn FROM the engine ranking, the engine grid point
    # must score a perfect ndcg/mrr
    assert engine_point["ndcg"] == pytest.approx(1.0, abs=1e-9)
    assert engine_point["mrr"] == pytest.approx(1.0, abs=1e-9)
    # and be the sweep winner (sorted best-ndcg first)
    assert out[0]["ndcg"] >= out[-1]["ndcg"]
    assert any(d["ndcg"] < 1.0 - 1e-12 or d["mrr"] < 1.0 - 1e-12
               for d in out if (d["k1"], d["b"]) != (CFG.k1, CFG.b)) or \
        len({(d["k1"], d["b"]) for d in out}) == 3


def test_rank_identity_at_engine_point(spark, built):
    """The sweep's internal scoring at (cfg.k1, cfg.b) must equal the
    serving engine's exhaustive scores_df ranking doc-for-doc."""
    store, eng, judg = built
    out = sweep_bm25(store, [(7, "zipfhead0 zipfhead1")], judg
                     .limit(0), [(CFG.k1, CFG.b)], k=10)
    assert out[0]["n_queries"] == 1  # runs, zero judgments -> zeros
    engine_ids = [d for d, _ in eng.top_k("zipfhead0 zipfhead1", k=10,
                                          mode="exhaustive")]
    # judgments that reward exactly the engine's list
    judg2 = spark.createDataFrame(
        [(7, d, float(10 - i)) for i, d in enumerate(engine_ids)],
        "query_id long, doc_id long, grade double")
    out2 = sweep_bm25(store, [(7, "zipfhead0 zipfhead1")], judg2,
                      [(CFG.k1, CFG.b)], k=10, max_grade=10)
    assert out2[0]["ndcg"] == pytest.approx(1.0, abs=1e-9)


def test_validation(spark, built):
    store, _eng, judg = built
    with pytest.raises(ValueError, match="non-empty"):
        sweep_bm25(store, [], judg, [(1.2, 0.75)])
    with pytest.raises(ValueError, match="non-empty"):
        sweep_bm25(store, QUERIES, judg, [])
    with pytest.raises(ValueError, match="tokenizes"):
        sweep_bm25(store, [(1, "...")], judg, [(1.2, 0.75)])
