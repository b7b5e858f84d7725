"""Hybrid lexical+semantic retrieval (operators/hybrid.py, X45).

The reference ranks by embedding cosine (``ProductRepository.java:72``);
this engine's flagship is BM25. The hybrid path runs both and fuses by
reciprocal rank. Everything here is pinned against pure-Python oracle
recomputes designed for bit-identity (float fold orders match the plan).
"""

from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.corpus import QUERY_CORPUS

DIM = 32


@pytest.fixture(scope="module")
def hybrid_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("hyb_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, cfg)
    builder.build(docs)
    builder.build_embeddings(dim=DIM)
    return store, cfg


def test_stored_vectors_bit_identical_to_oracle(spark, hybrid_built,
                                                tiny_rows):
    """The at-rest float32 vectors equal the oracle featurizer for every
    doc — pins hashing, sign, sublinear tf, sorted-term fold order and
    the single float32 rounding step."""
    from semantic_search_engine_spark.oracle import OracleIndex, doc_embedding

    store, cfg = hybrid_built
    oracle = OracleIndex.build(tiny_rows, cfg)
    rows = store.read("doc_embeddings").select("doc_id", "emb").collect()
    assert len(rows) == oracle.n_docs
    for r in rows:
        expected = doc_embedding(oracle, int(r["doc_id"]), DIM)
        got = [float(x) for x in r["emb"]]
        assert got == expected, r["doc_id"]


def test_semantic_top_k_matches_oracle(spark, hybrid_built, tiny_rows):
    """Cosine ranking rank-identical AND score-bit-identical: the JVM
    zip_with/aggregate fold replays the oracle's left-to-right loops."""
    from semantic_search_engine_spark.oracle import OracleIndex, semantic_top_k
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = hybrid_built
    oracle = OracleIndex.build(tiny_rows, cfg)
    qe = QueryEngine(spark, store, cfg)
    for pq in QUERY_CORPUS[:5]:
        expected = semantic_top_k(oracle, pq.query, DIM, k=10)
        got = [(int(r["doc_id"]), float(r["cosine"]))
               for r in qe.semantic_top_k_df(pq.query, k=10).collect()]
        assert got == expected, pq.query


def test_hybrid_rrf_matches_oracle(spark, hybrid_built, tiny_rows):
    from semantic_search_engine_spark.oracle import (OracleIndex,
                                                     hybrid_rrf_top_k)
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = hybrid_built
    oracle = OracleIndex.build(tiny_rows, cfg)
    qe = QueryEngine(spark, store, cfg)
    for pq in QUERY_CORPUS[:5]:
        expected = hybrid_rrf_top_k(oracle, pq.query, DIM, k=10)
        got = qe.hybrid_top_k(pq.query, k=10)
        assert got == expected, pq.query


def test_hybrid_degenerates_to_each_path(spark, hybrid_built):
    """w_sem=0 reproduces WAND order; w_lex=0 reproduces cosine order."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = hybrid_built
    qe = QueryEngine(spark, store, cfg)
    q = QUERY_CORPUS[0].query
    lex_only = [d for d, _ in qe.hybrid_top_k(q, k=10, w_sem=0.0)]
    wand = [d for d, _ in qe.top_k(q, k=10, mode="wand")]
    assert lex_only == wand[:len(lex_only)]
    sem_only = [d for d, _ in qe.hybrid_top_k(q, k=10, w_lex=0.0)]
    sem = [int(r["doc_id"])
           for r in qe.semantic_top_k_df(q, k=20).collect()]
    assert sem_only == sem[:len(sem_only)]


def test_unindexed_term_query_falls_back_to_semantic(spark, hybrid_built,
                                                     tiny_rows):
    """A query whose term is out-of-dictionary still hashes to a probe
    vector: the lexical path is empty, fusion degrades gracefully to the
    semantic ranks (rank offsets preserved)."""
    from semantic_search_engine_spark.oracle import OracleIndex, semantic_top_k
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = hybrid_built
    oracle = OracleIndex.build(tiny_rows, cfg)
    qe = QueryEngine(spark, store, cfg)
    q = "zzzzunindexedterm"
    assert qe.top_k(q, k=5, mode="wand") == []
    got = [d for d, _ in qe.hybrid_top_k(q, k=5)]
    expected = [d for d, _ in semantic_top_k(oracle, q, DIM, k=5)]
    assert got == expected


def test_ivf_over_doc_embeddings_matches_brute(spark, hybrid_built):
    """The declared 10^12-doc semantic path — IVF over the same
    doc_embeddings table — integrates verbatim (vec_id=doc_id) and, at
    n_probe=n_lists, reproduces the brute cosine ranking exactly."""
    from pyspark.sql import functions as F

    from semantic_search_engine_spark.operators.ann import (
        IVFIndex, brute_force_top_k)
    from semantic_search_engine_spark.operators.hybrid import (
        embed_query_tokens)
    from semantic_search_engine_spark.textproc import tokenize

    store, cfg = hybrid_built
    emb = (store.read("doc_embeddings")
           .select(F.col("doc_id").alias("vec_id"),
                   F.col("emb").cast("array<double>").alias("embedding")))
    # empty docs hash to zero vectors: the engine path filters their NaN
    # cosine; do the same before the comparison
    sq = F.aggregate(F.transform("embedding", lambda x: x * x),
                     F.lit(0.0), lambda a, x: a + x)
    emb = emb.filter(sq > 0)
    idx = IVFIndex.build(emb, n_lists=4, n_iters=2)
    probe = embed_query_tokens(
        tokenize(QUERY_CORPUS[0].query, 64, 1), DIM)
    got = [(int(r["vec_id"]), float(r["cosine"]))
           for r in idx.search(probe, k=10, n_probe=4).collect()]
    exp = [(int(r["vec_id"]), float(r["cosine"]))
           for r in brute_force_top_k(emb, probe, k=10).collect()]
    assert got == exp and len(got) == 10
