"""Injected neural embedder (operators/neural.py, VERDICT r3 #4).

The reference embeds with SentenceTransformer all-MiniLM-L6-v2
(``ml-model/app.py:59-90``); this engine ships no weights, so the adapter
takes any ``model.encode``-shaped callable. These tests inject the
deterministic fake and pin the full lifecycle: build embeddings over raw
text, IVF-index them, hybrid-query with the matching query probe, and
verify rank parity against a plain-numpy mirror of the same encoder.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.neural import (
    deterministic_fake_encoder,
    encode_query,
    make_encoder_embedding_udf,
)

DIM = 24
Q = "wireless bluetooth headphones"


@pytest.fixture(scope="module")
def neural_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("neural_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, cfg)
    builder.build(docs)
    enc = deterministic_fake_encoder(DIM)
    builder.build_embeddings(
        dim=DIM,
        embedder=make_encoder_embedding_udf(DIM, encoder=enc),
        embedder_tag="fake-neural", embedder_source="text")
    return store, cfg, builder, enc


def _mirror_ranking(store, enc, probe, k):
    """Plain-numpy replay: re-encode every stored doc text with the same
    callable (float32 at rest, float64 cosine — the engine's convention)
    and rank by cosine desc, doc_id asc."""
    rows = (store.read("doc_features")
            .select("doc_id", "text").collect())
    p = np.asarray(probe, dtype=np.float64)
    pn = float(np.linalg.norm(p)) or 1.0
    scored = []
    for r in rows:
        v = np.asarray(enc([r["text"] or ""])[0],
                       dtype=np.float32).astype(np.float64)
        n = float(np.linalg.norm(v))
        if n > 0:
            scored.append((int(r["doc_id"]), float(v @ p) / (n * pn)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def test_stored_vectors_match_encoder_output(neural_built):
    store, _cfg, _b, enc = neural_built
    rows = (store.read("doc_embeddings")
            .select("doc_id", "emb")
            .join(store.read("doc_features").select("doc_id", "text"),
                  "doc_id").limit(20).collect())
    for r in rows:
        expected = enc([r["text"] or ""])[0].astype(np.float32)
        assert np.array_equal(
            np.asarray(r["emb"], dtype=np.float32), expected), r["doc_id"]


def test_semantic_rank_parity_with_numpy_mirror(spark, neural_built):
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg, _b, enc = neural_built
    qe = QueryEngine(spark, store, cfg)
    probe = encode_query(enc, Q, DIM)
    got = [(int(r["doc_id"]), round(float(r["cosine"]), 6)) for r in
           qe.semantic_top_k_df(Q, k=10, probe=probe,
                                ann="exact").collect()]
    exp = [(d, round(s, 6)) for d, s in
           _mirror_ranking(store, enc, probe, 10)]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert abs(a - b) < 1e-6


def test_hybrid_with_neural_probe_and_ivf(spark, neural_built):
    """The full reference shape: neural doc vectors + neural query probe
    + persisted IVF + BM25 fusion. w_lex=0 at full probe must reproduce
    the exact neural cosine order."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg, builder, enc = neural_built
    builder.build_ann(n_lists=4, n_iters=2)
    qe = QueryEngine(spark, store, cfg)
    probe = encode_query(enc, Q, DIM)
    exact = [int(r["doc_id"]) for r in
             qe.semantic_top_k_df(Q, k=20, probe=probe,
                                  ann="exact").collect()]
    fused = [int(r["doc_id"]) for r in
             qe.hybrid_top_k_df(Q, k=10, w_lex=0.0, probe=probe,
                                ann="ivf", n_probe=4).collect()]
    assert fused == exact[:len(fused)]
    # and the combined fusion runs end-to-end with both legs live
    both = qe.hybrid_top_k_df(Q, k=10, probe=probe).collect()
    assert 0 < len(both) <= 10
    assert {c for c in ("doc_id", "rrf_score")} <= set(both[0].__fields__)


def test_loader_injection_loads_once_per_worker(spark, neural_built):
    """loader= form: the factory runs on workers (not the driver) and its
    output embeds identically to direct encoder= injection."""
    store, cfg, _b, enc = neural_built
    feats = store.read("doc_features").select("doc_id", "text").limit(16)
    udf_direct = make_encoder_embedding_udf(DIM, encoder=enc)
    # a lambda pickles by value (cloudpickle), like real loader closures
    udf_loader = make_encoder_embedding_udf(
        DIM, loader=lambda: deterministic_fake_encoder(DIM))
    a = {int(r["doc_id"]): list(r["e"]) for r in
         feats.select("doc_id", udf_direct("text").alias("e")).collect()}
    b = {int(r["doc_id"]): list(r["e"]) for r in
         feats.select("doc_id", udf_loader("text").alias("e")).collect()}
    assert a == b


def test_encoder_shape_contract_enforced(spark, neural_built):
    store, _cfg, _b, _enc = neural_built
    bad = make_encoder_embedding_udf(
        DIM, encoder=deterministic_fake_encoder(DIM + 1))
    feats = store.read("doc_features").select("text").limit(4)
    with pytest.raises(Exception, match="expected"):
        feats.select(bad("text")).collect()


def test_search_envelope_serves_injected_probe(spark, neural_built):
    """search(mode='semantic'/'hybrid', probe=...) ranks the neural index
    with the neural query probe — the envelope-level hook (code-review
    r4: without it the hashed featurizer would silently rank against
    neural doc vectors)."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg, _b, enc = neural_built
    qe = QueryEngine(spark, store, cfg)
    probe = encode_query(enc, Q, DIM)
    env = qe.search(Q, k=5, mode="semantic", probe=probe,
                    count_mode="none")
    expect = [int(r["doc_id"]) for r in
              qe.semantic_top_k_df(Q, k=5, probe=probe).collect()]
    assert [r["doc_id"] for r in env["results"]] == expect
    env_h = qe.search(Q, k=5, mode="hybrid", probe=probe,
                      count_mode="none")
    expect_h = [int(r["doc_id"]) for r in
                qe.hybrid_top_k_df(Q, k=5, probe=probe).collect()]
    assert [r["doc_id"] for r in env_h["results"]] == expect_h
