"""Impact-ordered champion lists (plans/champions.py): exact theta
bootstrap + approximate impact-only retrieval.

Kernel layer: a champion-derived seed must leave WAND's result identical
while strictly increasing pruning on head-term queries. Spark layer:
`top_k(theta_bootstrap=True)` must be rank- and score-identical to the
unseeded path; `impact_top_k` must be bit-identical to the exact engine
when every posting is a champion, an honest lower bound when not; a
stale champion table (postings rebuilt underneath) must disable the
bootstrap and refuse impact answers rather than mis-serve.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pytest

from semantic_search_engine_spark.functions.varbyte import encode_blocks
from semantic_search_engine_spark.plans.champions import (
    kth_best,
    partial_scores,
)
from semantic_search_engine_spark.plans.wand import wand_top_k

K1, B = 1.2, 0.75


def _mini_index(rng, n_docs=800, n_terms=6, density=0.25, block_size=32):
    doc_len = rng.integers(5, 200, size=n_docs)
    avgdl = float(doc_len.mean())
    term_postings = {}
    for t in range(n_terms):
        mask = rng.random(n_docs) < density * (3.0 if t == 0 else 1.0)
        ids = np.flatnonzero(mask).astype(np.uint64)
        if ids.size:
            term_postings[f"t{t:02d}"] = (
                ids, rng.integers(1, 8, size=ids.size).astype(np.uint64))
    term_blocks = {
        term: encode_blocks(ids, tfs,
                            doc_len[ids.astype(np.int64)].astype(np.uint64),
                            avgdl, K1, B, block_size)
        for term, (ids, tfs) in term_postings.items()}
    weights = {t: float(rng.uniform(0.5, 3.0)) for t in term_postings}
    return term_blocks, weights, term_postings, doc_len, avgdl


def _champion_rows(term_postings, doc_len, avgdl, m):
    """(term, doc_id, tf, dl, df) rows for the top-m by tf_norm per term —
    the driver-side shape `partial_scores` consumes."""
    rows = []
    for term, (ids, tfs) in term_postings.items():
        dls = doc_len[ids.astype(np.int64)].astype(np.float64)
        tfn = tfs.astype(np.float64) / (
            tfs.astype(np.float64) + K1 * (1 - B + B * dls / avgdl))
        order = np.lexsort((ids.astype(np.int64), -tfn))[:m]
        for i in order:
            rows.append((term, int(ids[i]), int(tfs[i]), int(dls[i]),
                         int(ids.size)))
    return rows


def test_kernel_seeded_theta_identical_and_prunes_more():
    rng = np.random.default_rng(7)
    term_blocks, weights, term_postings, doc_len, avgdl = _mini_index(rng)
    k = 10
    base_hits, base_stats = wand_top_k(term_blocks, weights, k, K1, B,
                                       avgdl)
    # champion partials under the SAME weights: idf-free test weights, so
    # feed partial_scores pre-weighted contributions by hand
    partials: dict[int, float] = {}
    for term in sorted(term_postings):
        w = weights[term]
        ids, tfs = term_postings[term]
        dls = doc_len[ids.astype(np.int64)].astype(np.float64)
        tfn = tfs.astype(np.float64) / (
            tfs.astype(np.float64) + K1 * (1 - B + B * dls / avgdl))
        order = np.lexsort((ids.astype(np.int64), -tfn))[:16]
        for i in order:
            d = int(ids[i])
            tf, dl = float(tfs[i]), float(dls[i])
            partials[d] = partials.get(d, 0.0) + w * (
                tf / (tf + K1 * (1.0 - B + B * dl / avgdl)))
    theta0 = heapq.nlargest(k, partials.values())[-1]
    assert theta0 > 0.0
    seeded_hits, seeded_stats = wand_top_k(term_blocks, weights, k, K1, B,
                                           avgdl, min_score=theta0)
    assert seeded_hits == base_hits
    assert (seeded_stats["evaluated_docs"]
            < base_stats["evaluated_docs"])
    assert seeded_stats["skipped_evals"] > base_stats["skipped_evals"]


def test_partial_scores_are_lower_bounds_in_float():
    """partial_scores over any champion subset must never exceed the
    kernel's full score for the same doc — the IEEE monotone-rounding
    argument, exercised on randomized postings."""
    rng = np.random.default_rng(11)
    term_blocks, weights, term_postings, doc_len, avgdl = _mini_index(rng)
    n_docs = len(doc_len)
    # df-weighted this time: partial_scores computes idf itself
    rows = _champion_rows(term_postings, doc_len, avgdl, m=4)
    partials = partial_scores(rows, n_docs, avgdl, K1, B)
    # full scores via the kernel's own accumulation (k = everything)
    from semantic_search_engine_spark.plans.wand import bm25_idf
    full: dict[int, float] = {}
    for term in sorted(term_postings):
        ids, tfs = term_postings[term]
        w = bm25_idf(n_docs, int(ids.size))
        dls = doc_len[ids.astype(np.int64)].astype(np.float64)
        for d, tf, dl in zip(ids.astype(int), tfs.astype(float),
                             dls):
            full[d] = full.get(d, 0.0) + w * (
                tf / (tf + K1 * (1.0 - B + B * dl / avgdl)))
    for d, p in partials.items():
        assert p <= full[d] + 0.0, d  # lower bound, no epsilon needed


def test_kth_best_underfull_returns_zero():
    assert kth_best({1: 0.5, 2: 0.4}, 3) == 0.0
    assert kth_best({}, 1) == 0.0
    assert kth_best({1: 0.5, 2: 0.4}, 2) == 0.4


# ---------------------------------------------------------------------------
# Spark layer
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def champ_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32,
                       champions_m=16)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("champ_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, cfg).build(docs)
    IndexBuilder(spark, store, cfg).build_champions()
    return store, cfg


def test_champion_table_shape_and_reality(spark, champ_built):
    """≤ m rows per term, every row a REAL posting (tf/dl match the
    decoded postings table)."""
    from pyspark.sql import functions as F

    from semantic_search_engine_spark.plans.query import (
        DECODED_SCHEMA,
        decode_postings,
    )

    store, cfg = champ_built
    champs = store.read("champions")
    per_term = champs.groupBy("term").count().agg(
        F.max("count")).collect()[0][0]
    assert per_term <= cfg.champions_m
    decoded = (store.read("postings")
               .select("term", "doc_ids_vb", "tfs_vb", "dls_vb",
                       "n_postings")
               .mapInPandas(decode_postings, schema=DECODED_SCHEMA))
    missing = champs.join(decoded, ["term", "doc_id", "tf", "dl"],
                          "left_anti").count()
    assert missing == 0


def test_theta_bootstrap_rank_and_score_identical(spark, champ_built):
    from semantic_search_engine_spark.corpus import QUERY_CORPUS
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = champ_built
    qe = QueryEngine(spark, store, cfg)
    for pq in QUERY_CORPUS:
        plain = qe.top_k(pq.query, k=10)
        seeded = qe.top_k(pq.query, k=10, theta_bootstrap=True)
        assert seeded == plain, pq.query  # scores bit-identical too


def test_champion_theta_positive_on_head_terms(spark, champ_built):
    store, cfg = champ_built
    from semantic_search_engine_spark.plans.query import QueryEngine

    qe = QueryEngine(spark, store, cfg)
    assert qe.champion_theta("zipfhead0 zipfhead1", 10) > 0.0
    # absent term: no champions, no seeding — and still exact above
    assert qe.champion_theta("absentterm9z", 10) == 0.0


def test_impact_top_k_is_honest_lower_bound(spark, champ_built):
    """Approximate mode: every returned score must be ≤ the doc's exact
    score, and recall vs the exact top-10 is high on the test corpus."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = champ_built
    qe = QueryEngine(spark, store, cfg)
    q = "zipfhead0 zipfhead1"  # df ≈ 190 of 200 docs each
    exact = qe.top_k(q, k=10)
    approx = qe.impact_top_k(q, k=10)
    assert len(approx) == 10
    full_exact = dict(qe.top_k(q, k=100, mode="exhaustive"))
    for d, s in approx:
        assert s <= full_exact.get(d, float("inf")) + 0.0
    got = {d for d, _ in approx}
    want = {d for d, _ in exact}
    recall = len(got & want) / 10
    assert recall >= 0.5, recall  # m=16 champions over ~190-doc lists


def test_impact_top_k_exact_when_m_covers_everything(
        spark, champ_built):
    """With m ≥ every posting-list length, partials ARE full scores and
    the approximate mode is bit-identical to the exact engine."""
    import dataclasses

    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = champ_built
    big = dataclasses.replace(cfg, champions_m=100_000)
    IndexBuilder(spark, store, big).build_champions()
    qe = QueryEngine(spark, store, big)
    for q in ["wireless bluetooth headphones", "zipfhead0 zipfhead1",
              "raretermxq zipfhead0"]:
        assert qe.impact_top_k(q, k=10) == qe.top_k(q, k=10), q
    # restore the small-m table for other tests in this module
    IndexBuilder(spark, store, cfg).build_champions()


def test_stale_champions_disable_bootstrap_and_refuse_impact(
        spark, champ_built, tmp_path_factory):
    """Rebuild postings underneath (ingest a new doc): the champion
    fingerprint no longer chains on the current postings, so the
    bootstrap silently falls back to exact-unseeded and impact mode
    raises instead of serving from a superseded index."""
    import datetime as dt

    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = champ_built
    qe = QueryEngine(spark, store, cfg)
    assert qe._champions_current()
    upd = spark.createDataFrame(
        [("https://example.org/new-champ-doc", dt.datetime(2024, 1, 1),
          None,
          "wireless bluetooth headphones " * 40, "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    IndexBuilder(spark, store, cfg).ingest_updates(upd)
    qe2 = QueryEngine(spark, store, cfg)
    assert not qe2._champions_current()
    with pytest.raises(ValueError, match="stale"):
        qe2.impact_top_k("wireless bluetooth", k=5)
    # bootstrap falls back: still exact, identical to plain
    assert (qe2.top_k("wireless bluetooth headphones", k=10,
                      theta_bootstrap=True)
            == qe2.top_k("wireless bluetooth headphones", k=10))
    # re-running build_champions re-validates
    IndexBuilder(spark, store, cfg).build_champions()
    qe3 = QueryEngine(spark, store, cfg)
    assert qe3._champions_current()
    assert qe3.impact_top_k("wireless bluetooth", k=5)
