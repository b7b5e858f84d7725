"""Corpus-trained PPMI+SVD embeddings (operators/embed_train.py, X109).

Levy & Goldberg's implicit-matrix-factorization recipe, pinned three
ways: hand-computed co-occurrence/PPMI values, topic structure recovered
from a planted two-topic corpus, and bit-parity of the distributed
embedding build + cosine serving against local numpy recomputation.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.embed_train import (
    cooccurrence_counts,
    embed_query_trained,
    embed_tf_map_trained,
    make_trained_embedding_udf,
    ppmi_edges,
    top_vocab_from_term_stats,
    train_svd_word_vectors,
    word_vectors_df,
)

pytestmark = pytest.mark.usefixtures("spark")


def _feats(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _cooc_dict(df):
    return {(r["a"], r["b"]): r["cnt"] for r in df.collect()}


# ---------------------------------------------------------------------------
# hand-computed co-occurrence and PPMI
# ---------------------------------------------------------------------------

def test_cooccurrence_hand_window1(spark):
    got = _cooc_dict(cooccurrence_counts(
        _feats(spark, ["aa bb aa"]), ["aa", "bb"], window=1))
    # positions (aa,bb),(bb,aa) both fold to (aa,bb)
    assert got == {("aa", "bb"): 2}


def test_cooccurrence_hand_window2(spark):
    got = _cooc_dict(cooccurrence_counts(
        _feats(spark, ["xx yy zz"]), ["xx", "yy", "zz"], window=2))
    assert got == {("xx", "yy"): 1, ("yy", "zz"): 1, ("xx", "zz"): 1}


def test_cooccurrence_self_pair_and_vocab_cut(spark):
    got = _cooc_dict(cooccurrence_counts(
        _feats(spark, ["aa aa cc"]), ["aa"], window=2))
    # cc is out of vocab; the two aa positions co-occur once (folded)
    assert got == {("aa", "aa"): 1}


def test_ppmi_hand_values(spark):
    """'aa bb aa', window 1: ordered n(aa,bb)=n(bb,aa)=2, T=4,
    c(aa)=c(bb)=2 -> pmi = ln(2*4/(2*2)) = ln 2."""
    cooc = cooccurrence_counts(_feats(spark, ["aa bb aa"]),
                               ["aa", "bb"], window=1)
    edges = {(r["a"], r["b"]): r["ppmi"] for r in ppmi_edges(cooc).collect()}
    assert set(edges) == {("aa", "bb"), ("bb", "aa")}
    for v in edges.values():
        assert math.isclose(v, math.log(2.0), rel_tol=0, abs_tol=1e-12)


def test_ppmi_self_pair_zero_filtered(spark):
    """'aa aa': ordered n(aa,aa)=2, T=2, c(aa)=2 -> pmi = ln(2*2/4) = 0,
    dropped by the strictly-positive filter."""
    cooc = cooccurrence_counts(_feats(spark, ["aa aa"]), ["aa"], window=1)
    assert ppmi_edges(cooc).count() == 0


# ---------------------------------------------------------------------------
# SVD training: topic recovery, determinism, bounds
# ---------------------------------------------------------------------------

TOPIC_A = "alphax betax gammax"
TOPIC_B = "deltax epsilonx zetax"


def _topic_corpus():
    texts = []
    for i in range(30):
        texts.append(f"{TOPIC_A} fill{i:02d}a {TOPIC_A}")
        texts.append(f"{TOPIC_B} fill{i:02d}b {TOPIC_B}")
    return texts


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na and nb else 0.0


def test_ppmi_empty_cooccurrence_table(spark):
    """No co-occurring pairs at all (window too small / disjoint vocab):
    an empty edge frame, not a float(None) crash on the total."""
    cooc = cooccurrence_counts(_feats(spark, ["aa", "bb"]),
                               ["aa", "bb"], window=1)
    edges = ppmi_edges(cooc)
    assert edges.count() == 0
    assert set(edges.columns) == {"a", "b", "ppmi"}


def test_trained_vectors_recover_topics(spark):
    vocab = TOPIC_A.split() + TOPIC_B.split()
    cooc = cooccurrence_counts(_feats(spark, _topic_corpus()), vocab,
                               window=4)
    wv = train_svd_word_vectors(ppmi_edges(cooc), dim=4)
    assert set(wv) == set(vocab)
    within = _cos(wv["alphax"], wv["betax"])
    across = _cos(wv["alphax"], wv["deltax"])
    assert within > across + 0.2, (within, across)
    assert _cos(wv["deltax"], wv["zetax"]) > _cos(wv["betax"],
                                                  wv["zetax"]) + 0.2


def test_training_is_deterministic(spark):
    vocab = TOPIC_A.split() + TOPIC_B.split()
    cooc = cooccurrence_counts(_feats(spark, _topic_corpus()), vocab,
                               window=4)
    edges = ppmi_edges(cooc)
    wv1 = train_svd_word_vectors(edges, dim=4)
    wv2 = train_svd_word_vectors(edges, dim=4)
    for t in wv1:
        assert np.array_equal(wv1[t], wv2[t]), t


def test_max_vocab_refusal(spark):
    cooc = cooccurrence_counts(_feats(spark, ["aa bb cc dd"]),
                               ["aa", "bb", "cc", "dd"], window=3)
    with pytest.raises(ValueError, match="max_vocab"):
        train_svd_word_vectors(ppmi_edges(cooc), dim=2, max_vocab=2)


def test_small_vocab_zero_pads_to_dim(spark):
    cooc = cooccurrence_counts(_feats(spark, ["aa bb aa bb"]),
                               ["aa", "bb"], window=1)
    wv = train_svd_word_vectors(ppmi_edges(cooc), dim=8)
    for v in wv.values():
        assert v.shape == (8,)


# ---------------------------------------------------------------------------
# engine integration: trained embeddings through build_embeddings + serving
# ---------------------------------------------------------------------------

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32)
DIM = 16


@pytest.fixture(scope="module")
def trained(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_emb")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, CFG)
    builder.build(docs)
    vocab = top_vocab_from_term_stats(store.read("term_stats"), 300)
    cooc = cooccurrence_counts(
        store.read("doc_features").select("text"), vocab, window=5,
        max_token_len=CFG.max_token_len, min_token_len=CFG.min_token_len,
        analyzer=CFG.analyzer)
    wv = train_svd_word_vectors(ppmi_edges(cooc), dim=DIM)
    builder.build_embeddings(dim=DIM,
                             embedder=make_trained_embedding_udf(wv, DIM),
                             embedder_tag="ppmi-svd")
    return store, wv


def test_vocab_cut_is_deterministic_and_sized(trained, spark):
    store, wv = trained
    vocab = top_vocab_from_term_stats(store.read("term_stats"), 300)
    assert len(vocab) == 300
    assert vocab == top_vocab_from_term_stats(store.read("term_stats"), 300)
    # the Zipf head must be in any sane cf-ranked cut
    assert "zipfhead0" in vocab


def test_stored_trained_vectors_bit_identical_to_local(trained):
    """The distributed embedding stage (Arrow UDF over tf_map) equals the
    local recompute for EVERY doc — pins the sorted-term fold order, OOV
    skipping, and the single float32 rounding step."""
    store, wv = trained
    rows = (store.read("doc_embeddings")
            .join(store.read("doc_features").select("doc_id", "tf_map"),
                  "doc_id")
            .select("doc_id", "emb", "tf_map").collect())
    assert rows
    for r in rows:
        expected = embed_tf_map_trained(
            r["tf_map"], wv, DIM).astype(np.float32)
        assert np.array_equal(np.array(r["emb"], dtype=np.float32),
                              expected), r["doc_id"]


def test_semantic_serving_with_trained_probe_matches_numpy(trained, spark):
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, wv = trained
    qe = QueryEngine(spark, store, CFG)
    query = "zipfhead0 zipfhead1"
    probe = embed_query_trained(query.split(), wv, DIM)
    assert any(probe)
    got = [(int(r["doc_id"]), float(r["cosine"]))
           for r in qe.semantic_top_k_df(query, k=10,
                                         probe=probe).collect()]
    # numpy brute force over the stored vectors (float64 cosine like the
    # plan's cast)
    rows = store.read("doc_embeddings").select("doc_id", "emb").collect()
    p = np.array(probe, dtype=np.float64)
    scored = []
    for r in rows:
        v = np.array(r["emb"], dtype=np.float64)
        nv = float(np.sqrt((v * v).sum()))
        if nv == 0.0:
            continue
        scored.append((int(r["doc_id"]),
                       float((v @ p) / (nv * float(np.sqrt((p * p).sum()))))))
    want = sorted(scored, key=lambda x: (-x[1], x[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-9)


def test_word_vectors_table_round_trip(trained, spark):
    store, wv = trained
    df = word_vectors_df(spark, wv)
    back = {r["term"]: np.array(r["vector"], dtype=np.float32)
            for r in df.collect()}
    assert set(back) == set(wv)
    for t, v in wv.items():
        assert np.array_equal(back[t], v.astype(np.float32)), t
