"""Rocchio embedding-space relevance feedback (X114) — numpy-oracle parity.

One feedback round: q' = α·q + β·mean(top fb_docs) − γ·mean(bottom),
then the same cosine top-k plan with the moved probe. Pinned against a
local numpy recompute of the probe move and of the re-ranking.
"""

from __future__ import annotations

import numpy as np
import pytest

from semantic_search_engine_spark.config import EngineConfig

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32, partition_doc_features=True)
DIM = 32


@pytest.fixture(scope="module")
def built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_roc")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, CFG)
    builder.build(docs)
    builder.build_embeddings(dim=DIM)
    return QueryEngine(spark, store, None), store


def _all_vecs(store):
    return {int(r["doc_id"]): np.array(r["emb"], dtype=np.float64)
            for r in store.read("doc_embeddings")
            .select("doc_id", "emb").collect()}


def _cos_rank(vecs, probe, k):
    p = np.asarray(probe, dtype=np.float64)
    pn = float(np.sqrt(p @ p))
    scored = []
    for d, v in vecs.items():
        nv = float(np.sqrt(v @ v))
        if nv == 0.0:
            continue
        scored.append((d, float((v @ p) / (nv * pn))))
    return sorted(scored, key=lambda x: (-x[1], x[0]))[:k]


def test_rocchio_probe_matches_numpy(built):
    from semantic_search_engine_spark.operators.hybrid import (
        embed_query_tokens,
    )

    qe, store = built
    q = "wireless bluetooth headphones"
    vecs = _all_vecs(store)
    q0 = np.array(embed_query_tokens(q.split(), DIM), dtype=np.float64)
    base = _cos_rank(vecs, q0, 5)
    rel = [d for d, _ in base]
    want = 1.0 * q0 + 0.75 * (sum(vecs[d] for d in rel) / len(rel))
    got = np.array(qe.rocchio_probe(q, fb_docs=5), dtype=np.float64)
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_rocchio_with_negative_feedback(built):
    from semantic_search_engine_spark.operators.hybrid import (
        embed_query_tokens,
    )

    qe, store = built
    q = "gaming laptop"
    vecs = _all_vecs(store)
    q0 = np.array(embed_query_tokens(q.split(), DIM), dtype=np.float64)
    window = _cos_rank(vecs, q0, 8)
    rel = [d for d, _ in window[:5]]
    nr = [d for d, _ in window[5:]]
    want = (1.0 * q0 + 0.5 * (sum(vecs[d] for d in rel) / len(rel))
            - 0.25 * (sum(vecs[d] for d in nr) / len(nr)))
    got = np.array(qe.rocchio_probe(q, fb_docs=5, beta=0.5, gamma=0.25,
                                    nonrel_docs=3), dtype=np.float64)
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_rocchio_top_k_reranks_like_numpy(built):
    qe, store = built
    q = "wireless bluetooth headphones"
    vecs = _all_vecs(store)
    moved = qe.rocchio_probe(q, fb_docs=5)
    want = _cos_rank(vecs, moved, 10)
    got = [(int(r["doc_id"]), float(r["cosine"]))
           for r in qe.rocchio_top_k_df(q, k=10, fb_docs=5).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


def test_rocchio_degenerate_probe_passthrough(built):
    qe, _ = built
    # a query with no signal under the hashed featurizer: empty tokens
    out = qe.rocchio_probe("", fb_docs=5)
    assert out == [0.0] * DIM or not any(out)
