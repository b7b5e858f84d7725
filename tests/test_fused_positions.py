"""Fused position extraction (VERDICT r3 #3): ``build(positions=True)``
emits ``pos_map`` from the SAME extract+tokenize Arrow pass and the
positional index encodes from that committed column — no second
corpus-wide Python pass over raw text. The after-the-fact
``build_positions()`` path (re-tokenize) must stay bit-identical to it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.corpus import QUERY_CORPUS

CFG = dict(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
           block_size=32)


def _build(spark, tiny_corpus_dir, tmp_path_factory, tag, **kw):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(**CFG)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp(tag)))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, cfg)
    builder.build(docs, **kw)
    return store, cfg, builder


@pytest.fixture(scope="module")
def fused_built(spark, tiny_corpus_dir, tmp_path_factory):
    return _build(spark, tiny_corpus_dir, tmp_path_factory, "fusedpos_wh",
                  positions=True)


@pytest.fixture(scope="module")
def twopass_built(spark, tiny_corpus_dir, tmp_path_factory):
    store, cfg, builder = _build(spark, tiny_corpus_dir, tmp_path_factory,
                                 "twopass_wh")
    builder.build_positions()
    return store, cfg, builder


def test_fused_positions_table_bit_identical_to_two_pass(
        fused_built, twopass_built):
    """The whole point: same kept-token stream whether positions come
    from the fused pass or the standalone re-tokenize — the encoded
    position blocks must match byte-for-byte."""
    fs, _, _ = fused_built
    ts, _, _ = twopass_built
    a = fs.read("positions").orderBy("term", "partition_id", "block_id")
    b = ts.read("positions").orderBy("term", "partition_id", "block_id")
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    ra = [tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                for v in r) for r in a.select(*cols).collect()]
    rb = [tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                for v in r) for r in b.select(*cols).collect()]
    assert ra == rb


def test_fused_tf_map_identical_to_counter_path(fused_built, twopass_built):
    """tf_map derived as len(positions[t]) inside the fused UDF equals
    the Counter(tokenize) form for every doc — downstream statistics
    (postings, BM25) are unchanged by the flag."""
    fs, _, _ = fused_built
    ts, _, _ = twopass_built
    a = {int(r["doc_id"]): dict(r["tf_map"]) for r in
         fs.read("doc_features").select("doc_id", "tf_map").collect()}
    b = {int(r["doc_id"]): dict(r["tf_map"]) for r in
         ts.read("doc_features").select("doc_id", "tf_map").collect()}
    assert a == b


def test_pos_map_lengths_match_tf(fused_built, spark):
    """len(pos_map[t]) == tf_map[t] for every (doc, term) — the
    tsvector invariant, now committed at rest."""
    fs, _, _ = fused_built
    bad = (fs.read("doc_features")
           .select(F.explode("pos_map").alias("term", "ps"), "tf_map")
           .filter(F.size("ps") != F.col("tf_map")[F.col("term")])
           .count())
    assert bad == 0


def test_fused_build_runs_one_python_text_pass(fused_built):
    """The positions stage of a positions=True build is pure JVM: its
    plan contains no Python evaluation nodes (the UDF ran once, in
    doc_features)."""
    fs, cfg, builder = fused_built
    df = builder._positions_df("", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the block encoder is mapInPandas (a numpy stream, exempted like the
    # postings encoder); what must NOT appear is the scalar tokenize UDF
    # (ArrowEvalPython) — the scan reads the committed pos_map instead
    assert "ArrowEvalPython" not in plan, plan
    assert "pos_map" in plan, plan


def test_phrase_results_identical_on_fused_index(fused_built, twopass_built,
                                                 spark):
    from semantic_search_engine_spark.plans.query import QueryEngine

    fs, cfg, _ = fused_built
    ts, _, _ = twopass_built
    qf = QueryEngine(spark, fs, cfg)
    qt = QueryEngine(spark, ts, cfg)
    for q in [QUERY_CORPUS[0].query, "wireless bluetooth"]:
        assert qf.phrase_top_k(q, k=10, mode="positions") == \
            qt.phrase_top_k(q, k=10, mode="positions"), q


def test_incremental_ingest_maintains_fused_positions(
        spark, tiny_corpus_dir, tmp_path_factory):
    """ingest_updates into a positions=True index: the batch carries
    pos_map (schema parity with the committed table) and the positions
    stage refreshes incrementally — equal to a full positions=True
    rebuild over the merged corpus."""
    from semantic_search_engine_spark.corpus import generate_rows
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(**CFG)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("fusedinc_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, cfg)
    builder.build(docs, positions=True)
    batch_rows = list(generate_rows(210))[200:]  # 10 new urls
    batch = spark.createDataFrame(
        batch_rows, "url string, warc_ts timestamp, html binary, "
                    "text string, lang string")
    builder.ingest_updates(batch)
    # the merged doc_features still carries pos_map for every row
    feats = store.read("doc_features")
    assert "pos_map" in feats.columns
    assert feats.filter(F.col("pos_map").isNull()).count() == 0
    # reference: full rebuild over the union
    store2 = HadoopTableStore(spark,
                              str(tmp_path_factory.mktemp("fusedref_wh")))
    IndexBuilder(spark, store2, cfg).build(
        docs.unionByName(batch), positions=True)
    cols = sorted(store.read("positions").columns)
    a = sorted(tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                     for v in r)
               for r in store.read("positions").select(*cols).collect())
    b = sorted(tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                     for v in r)
               for r in store2.read("positions").select(*cols).collect())
    assert a == b


def test_arrow_batch_override_scoped_and_restored(spark):
    """The per-stage Arrow batch override must restore the session conf
    whether it was set or unset before (bench sets 512 globally; tests
    usually leave it unset)."""
    from semantic_search_engine_spark.plans.build_index import (
        _ARROW_BATCH_KEY, _arrow_batch)

    prev = spark.conf.get(_ARROW_BATCH_KEY, None)
    try:
        spark.conf.set(_ARROW_BATCH_KEY, "512")
        with _arrow_batch(spark, 20_000):
            assert spark.conf.get(_ARROW_BATCH_KEY) == "20000"
        assert spark.conf.get(_ARROW_BATCH_KEY) == "512"
        spark.conf.unset(_ARROW_BATCH_KEY)
        with _arrow_batch(spark, 512):
            assert spark.conf.get(_ARROW_BATCH_KEY) == "512"
        assert spark.conf.get(_ARROW_BATCH_KEY, None) in (None, "10000")
        # exception inside the block must still restore
        spark.conf.set(_ARROW_BATCH_KEY, "777")
        try:
            with _arrow_batch(spark, 123):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert spark.conf.get(_ARROW_BATCH_KEY) == "777"
    finally:
        if prev is None:
            try:
                spark.conf.unset(_ARROW_BATCH_KEY)
            except Exception:
                pass
        else:
            spark.conf.set(_ARROW_BATCH_KEY, prev)
