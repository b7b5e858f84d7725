"""Product quantization (operators/pq.py): determinism, honest
compression, exactness in the lossless regime, recall in the lossy one,
and the save/load lifecycle with torn-save detection.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.ann import brute_force_top_k
from semantic_search_engine_spark.operators.pq import (
    IVFADCIndex,
    PQCodebook,
    load_ivfadc,
    load_pq,
    save_ivfadc,
    save_pq,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def probe(embeddings):
    row = embeddings.filter(F.col("vec_id") == 5).collect()[0]
    return [float(x) for x in row["embedding"]]


@pytest.fixture(scope="module")
def book(embeddings):
    return PQCodebook.train(embeddings, m=8, ksub=64, n_iters=4, seed=42)


@pytest.fixture(scope="module")
def codes(book, embeddings):
    return book.encode(embeddings).localCheckpoint(eager=True)


def test_train_is_deterministic(embeddings):
    a = PQCodebook.train(embeddings, m=4, ksub=16, n_iters=2, seed=9)
    b = PQCodebook.train(embeddings, m=4, ksub=16, n_iters=2, seed=9)
    assert np.array_equal(a.centroids, b.centroids)


def test_codes_are_m_bytes(book, codes):
    rows = codes.limit(20).collect()
    assert all(len(bytes(r["code"])) == book.m for r in rows)
    # 64 float64 components (512 B logical) → 8 B: the 64x story
    assert book.dim * 8 // book.m == 64


def test_m_must_divide_dim(embeddings):
    with pytest.raises(ValueError, match="must divide"):
        PQCodebook.train(embeddings, m=7, ksub=16)


def test_adc_exact_in_lossless_regime(spark, embeddings, probe):
    """ksub ≥ n distinct vectors ⇒ every subvector is its own centroid ⇒
    ADC distances equal true distances and the PQ top-k IS the exact
    top-k (order and membership)."""
    small = embeddings.orderBy("vec_id").limit(200)
    bk = PQCodebook.train(small, m=8, ksub=256, n_iters=1,
                          train_cap=1_000_000)
    cds = bk.encode(small)
    exact = [r["vec_id"] for r in
             brute_force_top_k(small, probe, k=10).collect()]
    approx = [r["vec_id"] for r in
              bk.adc_top_k(cds, probe, k=10).collect()]
    assert approx == exact


def test_adc_recall_lossy(book, codes, embeddings):
    """Mean recall over 10 probes (single-probe recall is high-variance
    on 500 near-equidistant clustered vectors — measured 0.35-0.47 for
    plain ADC at m=8/ksub=64). Plain ADC clears an honest floor; the
    shortlist→exact-rerank recipe (the production mode) clears a much
    higher one and never loses to plain ADC on average."""
    probes = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in embeddings.filter(
                  F.col("vec_id").isin(list(range(0, 50, 5)))).collect()}
    plain, rerank = [], []
    for pid, p in sorted(probes.items()):
        exact = {r["vec_id"] for r in
                 brute_force_top_k(embeddings, p, k=10).collect()}
        plain.append(len(exact & {
            r["vec_id"] for r in
            book.adc_top_k(codes, p, k=10).collect()}) / 10)
        rerank.append(len(exact & {
            r["vec_id"] for r in
            book.adc_rerank_top_k(codes, embeddings, p, k=10).collect()
        }) / 10)
    assert sum(plain) / len(plain) >= 0.30, plain
    assert sum(rerank) / len(rerank) >= 0.60, rerank
    assert sum(rerank) >= sum(plain), (plain, rerank)


def test_approx_cos_bounded(book, codes, probe):
    rows = book.adc_top_k(codes, probe, k=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert -1.0 - 1e-6 <= r["approx_cos"] <= 1.0 + 1e-6
    dists = [r["approx_dist"] for r in rows]
    assert dists == sorted(dists)


def test_save_load_round_trip(spark, book, codes, probe,
                              tmp_path_factory):
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("pq_wh")))
    save_pq(book, codes, store, "emb")
    book2, codes2 = load_pq(store, "emb")
    assert np.array_equal(book.centroids, book2.centroids)
    a = [(r["vec_id"], r["approx_dist"]) for r in
         book.adc_top_k(codes, probe, k=10).collect()]
    b = [(r["vec_id"], r["approx_dist"]) for r in
         book2.adc_top_k(codes2, probe, k=10).collect()]
    assert a == b


def test_ivfadc_exact_in_lossless_regime(spark, embeddings, probe):
    """n_probe = n_lists (no pruning) and ksub ≥ n (every residual its
    own centroid) ⇒ IVFADC == brute force, order and membership."""
    small = embeddings.orderBy("vec_id").limit(200)
    idx = IVFADCIndex.build(small, n_lists=4, m=8, ksub=256,
                            n_iters_pq=1, train_cap=1_000_000)
    exact = [r["vec_id"] for r in
             brute_force_top_k(small, probe, k=10).collect()]
    approx = [r["vec_id"] for r in
              idx.search(probe, k=10, n_probe=4).collect()]
    assert approx == exact


def test_ivfadc_mean_anchor_reduces_energy(embeddings):
    """The property mean-anchoring guarantees (and the unit-centroid
    anchor VIOLATES on weakly-clustered data — measured 1.47 there):
    mean residual energy ≤ raw unit-vector energy (= 1.0). Plus an
    honest recall floor at full probe (pure quantization error; the
    corpus's near-equidistant clusters put plain-ADC recall ~0.4)."""
    idx = IVFADCIndex.build(embeddings, n_lists=8, m=8, ksub=64,
                            n_iters_pq=4)
    rows = embeddings.collect()
    vn = np.array([r["embedding"] for r in rows], dtype=np.float64)
    vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    lid = np.argmax(vn @ idx.centroids.T, axis=1)
    resid_e = float(((vn - idx.anchors[lid]) ** 2).sum(axis=1).mean())
    unit_e = float(((vn - idx.centroids[lid]) ** 2).sum(axis=1).mean())
    assert resid_e <= 1.0 + 1e-9, resid_e
    assert resid_e < unit_e, (resid_e, unit_e)
    pids = list(range(0, 50, 5))
    probes = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in rows if r["vec_id"] in pids}
    recalls = [idx.recall_at_k(embeddings, p, k=10, n_probe=8)
               for _, p in sorted(probes.items())]
    assert sum(recalls) / len(recalls) >= 0.30, recalls


def test_ivfadc_pruned_probe_and_rerank(embeddings, probe):
    """Pruned probes (n_probe < n_lists) return k rows from the probed
    lists only; the rerank form returns exact cosines and can only
    improve on plain ADC ordering."""
    idx = IVFADCIndex.build(embeddings, n_lists=8, m=8, ksub=64,
                            n_iters_pq=4)
    plain = idx.search(probe, k=10, n_probe=2).collect()
    assert len(plain) == 10
    dists = [r["approx_dist"] for r in plain]
    assert dists == sorted(dists)
    rr = idx.search(probe, k=10, n_probe=8,
                    rerank_embeddings=embeddings).collect()
    assert len(rr) == 10
    assert [r["cosine"] for r in rr] == sorted(
        (r["cosine"] for r in rr), reverse=True)
    exact = {r["vec_id"] for r in
             brute_force_top_k(embeddings, probe, k=10).collect()}
    n_rr = len(exact & {r["vec_id"] for r in rr})
    n_plain = len(exact & {r["vec_id"]
                           for r in idx.search(probe, k=10,
                                               n_probe=8).collect()})
    assert n_rr >= n_plain


def test_ivfadc_save_load_round_trip(spark, embeddings, probe,
                                     tmp_path_factory):
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    idx = IVFADCIndex.build(embeddings, n_lists=8, m=8, ksub=64,
                            n_iters_pq=4)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("ivfadc_wh")))
    save_ivfadc(idx, store, "emb")
    idx2 = load_ivfadc(store, "emb")
    assert np.array_equal(idx.centroids, idx2.centroids)
    assert np.array_equal(idx.anchors, idx2.anchors)
    assert np.array_equal(idx.book.centroids, idx2.book.centroids)
    a = [(r["vec_id"], r["approx_dist"]) for r in
         idx.search(probe, k=10, n_probe=4).collect()]
    b = [(r["vec_id"], r["approx_dist"]) for r in
         idx2.search(probe, k=10, n_probe=4).collect()]
    assert a == b
    # persisted list_id layout: the probe is a real partition prune
    probed = idx2.search(probe, k=10, n_probe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "list_id" in plan, plan


def test_ivfadc_torn_save_detected(spark, embeddings, tmp_path_factory):
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    idx = IVFADCIndex.build(embeddings, n_lists=4, m=8, ksub=16,
                            n_iters_pq=2)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("ivfadc_wh2")))
    save_ivfadc(idx, store, "emb")
    cb = store.read("ivfadc_codebook_emb")
    store.write("ivfadc_codebook_emb", cb, meta={"save_id": "other"})
    with pytest.raises(ValueError, match="torn"):
        load_ivfadc(store, "emb")


def test_torn_save_detected(spark, book, codes, tmp_path_factory):
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("pq_wh2")))
    save_pq(book, codes, store, "emb")
    # a later save that only committed its codebook half
    cb = store.read("pq_codebook_emb")
    store.write("pq_codebook_emb", cb, meta={"save_id": "other"})
    with pytest.raises(ValueError, match="torn"):
        load_pq(store, "emb")
