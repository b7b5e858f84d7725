"""Persisted-IVF serving on the semantic/hybrid path (VERDICT r3 #2).

The reference's default semantic accelerator is a pgvector ivfflat index
(``data-pipeline/database.py:47-54``); its exact seqscan is the fallback.
This engine mirrors that lifecycle: ``IndexBuilder.build_ann`` persists an
IVF over the committed ``doc_embeddings`` table, and
``QueryEngine.semantic_top_k_df`` / ``hybrid_top_k_df`` serve from it by
default (``ann="auto"``) with partition-pruned probes, keeping the brute
scan as the explicit exact mode.

Everything here runs in its OWN warehouse: the module-scoped hybrid
fixture elsewhere must keep serving exact (no index in its store).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.corpus import QUERY_CORPUS

DIM = 32
N_LISTS = 4
Q = QUERY_CORPUS[0].query


@pytest.fixture(scope="module")
def ann_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("ann_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, cfg)
    builder.build(docs)
    builder.build_embeddings(dim=DIM)
    name = builder.build_ann(n_lists=N_LISTS, n_iters=2)
    return store, cfg, builder, name


def _engine(spark, ann_built):
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg, _b, _n = ann_built
    return QueryEngine(spark, store, cfg)


def _rows(df):
    return [(int(r["doc_id"]), float(r["cosine"])) for r in df.collect()]


def test_full_probe_identical_to_exact(spark, ann_built):
    """n_probe = n_lists scans every list with the SAME guarded JVM
    cosine expression as the brute path — bit-equal scores, identical
    ranking (the recall/identity pin the verdict asked for)."""
    qe = _engine(spark, ann_built)
    exact = _rows(qe.semantic_top_k_df(Q, k=10, ann="exact"))
    full = _rows(qe.semantic_top_k_df(Q, k=10, ann="ivf",
                                      n_probe=N_LISTS))
    assert full == exact
    assert len(exact) == 10


def test_auto_serves_ivf_and_probe_is_partition_pruned(spark, ann_built):
    """ann='auto' with a current index runs the IVF plan, and the probed
    scan is a REAL partition prune on list_id — not a full read with a
    post-filter."""
    qe = _engine(spark, ann_built)
    df = qe.semantic_top_k_df(Q, k=10, n_probe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "list_id" in plan, plan
    # a 1-probe result is a subset of some list, ranked consistently
    got = _rows(df)
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))
    assert 0 < len(got) <= 10


def test_default_n_probe_results_come_from_probed_lists(spark, ann_built):
    """Default n_probe=round(sqrt(n_lists)): every returned doc belongs
    to one of the nearest lists (correct pruning, no leakage)."""
    import math

    import numpy as np

    from semantic_search_engine_spark.operators.ann import load_ivf
    from semantic_search_engine_spark.operators.hybrid import (
        embed_query_tokens)
    from semantic_search_engine_spark.textproc import tokenize

    store, cfg, _b, name = ann_built
    qe = _engine(spark, ann_built)
    got = _rows(qe.semantic_top_k_df(Q, k=10))  # auto → ivf
    idx = load_ivf(store, name)
    probe = embed_query_tokens(tokenize(Q, 64, 1), DIM)
    p = np.asarray(probe, dtype=np.float64)
    p = p / np.linalg.norm(p)
    d2 = ((idx.centroids - p) ** 2).sum(axis=1)
    n_probe = max(1, int(round(math.sqrt(N_LISTS))))
    nearest = {int(j) for j in np.argsort(d2, kind="stable")[:n_probe]}
    lists = {int(r["list_id"]) for r in
             idx.assignments.filter(
                 F.col("doc_id").isin([d for d, _ in got]))
             .select("list_id").collect()}
    assert lists <= nearest, (lists, nearest)


def test_hybrid_semantic_leg_routes_through_ivf(spark, ann_built):
    """hybrid(w_lex=0, full probe) == exact cosine order — the fusion
    sees the same semantic ranking through the IVF leg."""
    qe = _engine(spark, ann_built)
    exact = [d for d, _ in
             _rows(qe.semantic_top_k_df(Q, k=20, ann="exact"))]
    fused = [int(r["doc_id"]) for r in
             qe.hybrid_top_k_df(Q, k=10, w_lex=0.0, ann="ivf",
                                n_probe=N_LISTS).collect()]
    assert fused == exact[:len(fused)]


def test_build_ann_resume_is_noop(spark, ann_built):
    """Re-running build_ann with unchanged source + parameters must not
    rewrite the index (same assignments data_uuid — the checkpoint
    discipline every other opt-in stage follows)."""
    store, cfg, builder, name = ann_built
    before = store.table_meta(f"ann_{name}_assignments")["data_uuid"]
    builder.build_ann(n_lists=N_LISTS, n_iters=2)
    after = store.table_meta(f"ann_{name}_assignments")["data_uuid"]
    assert before == after


def test_stale_index_falls_back_and_rebuild_recovers(spark, tiny_corpus_dir,
                                                     tmp_path_factory):
    """After an embeddings rebuild the saved index's source_uuid no longer
    matches: ann='auto' silently serves exact, ann='ivf' refuses. A fresh
    build_ann re-arms the fast path."""
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("ann_stale_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, cfg)
    builder.build(docs)
    builder.build_embeddings(dim=DIM)
    builder.build_ann(n_lists=N_LISTS, n_iters=2)
    # rebuild embeddings at a different dim → new data_uuid, stale index
    builder.build_embeddings(dim=DIM * 2)
    qe = QueryEngine(spark, store, cfg)
    assert qe._ann_ivf() is None
    with pytest.raises(ValueError, match="stale|no current"):
        qe.semantic_top_k_df(Q, k=5, ann="ivf")
    exact = _rows(qe.semantic_top_k_df(Q, k=5, ann="exact"))
    auto = _rows(qe.semantic_top_k_df(Q, k=5))  # falls back, no error
    assert auto == exact
    builder.build_ann(n_lists=N_LISTS, n_iters=2)
    qe2 = QueryEngine(spark, store, cfg)
    assert qe2._ann_ivf() is not None
    full = _rows(qe2.semantic_top_k_df(Q, k=5, ann="ivf",
                                       n_probe=N_LISTS))
    assert full == _rows(qe2.semantic_top_k_df(Q, k=5, ann="exact"))


def test_filtered_semantic_prefilter_exact_and_ivf(spark, ann_built):
    """Structured pre-filter on the semantic path (the reference's
    filtered vector query): exact-path results equal a manual
    doc_meta-filtered brute ranking, and the IVF path at full probe
    equals the exact path under the same filter."""
    store, cfg, _b, _n = ann_built
    qe = _engine(spark, ann_built)
    langs = [r["lang"] for r in
             store.read("doc_meta").groupBy("lang").count()
             .orderBy(F.desc("count")).limit(1).collect()]
    lang = langs[0]
    exact = _rows(qe.semantic_top_k_df(Q, k=10, ann="exact", lang=lang))
    # manual mirror: unfiltered deep ranking, post-filtered by doc_meta
    eligible = {int(r["doc_id"]) for r in
                store.read("doc_meta").filter(F.col("lang") == lang)
                .select("doc_id").collect()}
    deep = _rows(qe.semantic_top_k_df(Q, k=10_000, ann="exact"))
    manual = [(d, s) for d, s in deep if d in eligible][:10]
    assert exact == manual
    assert all(d in eligible for d, _ in exact)
    full = _rows(qe.semantic_top_k_df(Q, k=10, ann="ivf",
                                      n_probe=N_LISTS, lang=lang))
    assert full == exact


def test_filtered_hybrid_fuses_only_eligible_docs(spark, ann_built):
    store, cfg, _b, _n = ann_built
    qe = _engine(spark, ann_built)
    lang = store.read("doc_meta").select("lang").first()["lang"]
    eligible = {int(r["doc_id"]) for r in
                store.read("doc_meta").filter(F.col("lang") == lang)
                .select("doc_id").collect()}
    rows = qe.hybrid_top_k_df(Q, k=10, lang=lang,
                              n_probe=N_LISTS).collect()
    assert rows, "filtered hybrid returned nothing"
    assert all(int(r["doc_id"]) in eligible for r in rows)


def test_search_envelope_semantic_and_hybrid_modes(spark, ann_built):
    """search(mode='semantic'|'hybrid') returns the standard envelope
    (results hydrated with doc_meta columns, limit/offset honored) ranked
    by the vector paths — the reference's vector serve shape."""
    qe = _engine(spark, ann_built)
    for mode, score_src in (("semantic", "cosine"), ("hybrid",
                                                     "rrf_score")):
        env = qe.search(Q, k=5, mode=mode)
        assert set(env) >= {"results", "total_count", "limit", "offset",
                            "query", "execution_time_ms"}
        assert env["limit"] == 5 and env["offset"] == 0
        assert 0 < len(env["results"]) <= 5
        r0 = env["results"][0]
        assert {"doc_id", "url", "lang", "doc_len", "score"} <= set(r0)
        # ranking agrees with the underlying df path
        df = (qe.semantic_top_k_df(Q, k=5) if mode == "semantic"
              else qe.hybrid_top_k_df(Q, k=5))
        expect = [int(r["doc_id"]) for r in df.collect()]
        assert [r["doc_id"] for r in env["results"]] == expect
        # offset pages without overlap
        env2 = qe.search(Q, k=2, offset=2, mode=mode)
        full = [r["doc_id"] for r in qe.search(Q, k=4, mode=mode)
                ["results"]]
        assert [r["doc_id"] for r in env2["results"]] == full[2:4]


def test_torn_save_detected_on_serve_and_repaired_by_rebuild(
        spark, tiny_corpus_dir, tmp_path_factory):
    """A crashed re-save (assignments committed, centroids not) must not
    serve: _ann_ivf refuses (exact fallback) and build_ann treats the
    torn state as not-a-checkpoint, repairing it (code-review r4)."""
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("ann_torn_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, cfg)
    builder.build(docs)
    builder.build_embeddings(dim=DIM)
    name = builder.build_ann(n_lists=N_LISTS, n_iters=2)
    # simulate the torn re-save: flip the assignments save_id only
    atbl = f"ann_{name}_assignments"
    meta = dict(store.table_meta(atbl))
    meta["save_id"] = "deadbeef" + meta["save_id"][8:]
    store.write(atbl, store.read(atbl), partition_by=["list_id"],
                meta=meta)
    qe = QueryEngine(spark, store, cfg)
    assert qe._ann_ivf() is None  # torn: serve falls back to exact
    exact = _rows(qe.semantic_top_k_df(Q, k=5, ann="exact"))
    assert _rows(qe.semantic_top_k_df(Q, k=5)) == exact
    # build_ann must NOT checkpoint-hit on the torn state
    builder.build_ann(n_lists=N_LISTS, n_iters=2)
    qe2 = QueryEngine(spark, store, cfg)
    assert qe2._ann_ivf() is not None
    assert _rows(qe2.semantic_top_k_df(Q, k=5, ann="ivf",
                                       n_probe=N_LISTS)) == exact


def test_n_probe_zero_or_negative_refused(spark, ann_built):
    """ADVICE r4: n_probe<=0 would probe zero lists and return silently
    empty results — both serve paths must raise instead."""
    from semantic_search_engine_spark.operators.ann import load_ivf

    qe = _engine(spark, ann_built)
    for bad in (0, -1):
        with pytest.raises(ValueError, match="n_probe"):
            qe.semantic_top_k_df(Q, k=5, ann="ivf", n_probe=bad)
    store, _cfg, _b, name = ann_built
    idx = load_ivf(store, name)
    with pytest.raises(ValueError, match="n_probe"):
        idx.search([1.0] * DIM, k=5, n_probe=0)


def test_unprovenanced_index_not_served_in_auto_mode(
        spark, tiny_corpus_dir, tmp_path_factory):
    """ADVICE r4: an index persisted via bare save_ivf (no source_uuid)
    cannot be staleness-checked, so ann='auto' must fall back to exact;
    the explicit ann='ivf' assertion still serves it."""
    from semantic_search_engine_spark.operators.ann import (
        IVFIndex,
        save_ivf,
    )
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("ann_bare_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, cfg)
    builder.build(docs)
    builder.build_embeddings(dim=DIM)
    idx = IVFIndex.build(store.read("doc_embeddings"), n_lists=N_LISTS,
                         n_iters=2, key="doc_id", vec_col="emb")
    save_ivf(idx, store, "doc_emb")  # bare save: no source_uuid
    qe = QueryEngine(spark, store, cfg)
    assert qe._ann_ivf(require_provenance=True) is None
    assert qe._ann_ivf(require_provenance=False) is not None
    exact = _rows(qe.semantic_top_k_df(Q, k=5, ann="exact"))
    assert _rows(qe.semantic_top_k_df(Q, k=5, ann="auto")) == exact
    # explicit ivf mode serves it (full probe => same ranking)
    assert _rows(qe.semantic_top_k_df(Q, k=5, ann="ivf",
                                      n_probe=N_LISTS)) == exact


def test_default_n_lists_sizing_targets_list_rows():
    """VERDICT r4 #3: default sizing is clamp(round(N/4000), 8,
    min(round(sqrt(N)), 65536)) — target-rows form below 16M docs,
    sqrt cap above, never the r4 sqrt(N)-always form that gave
    316-vector lists at 100k docs."""
    from semantic_search_engine_spark.plans.build_index import (
        default_n_lists as sizing,
    )

    assert sizing(1_000) == 8            # tiny corpus: floor
    assert sizing(100_000) == 25         # ~4k rows/list, NOT sqrt=316
    assert sizing(1_000_000) == 250
    assert sizing(16_000_000) == 4000    # crossover: N/4000 == sqrt(N)
    assert sizing(100_000_000) == 10000  # sqrt cap takes over
    assert sizing(10**12) == 65536       # driver-memory ceiling
