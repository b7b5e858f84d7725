"""Layout migration (`IndexBuilder.migrate_layout`): re-layout a committed
index under a new physical/scoring config without re-running extraction or
tokenization, bit-identical to a from-scratch build under the new config.

The reference stack has no such operation (Elasticsearch reindexes to
change shard count; Postgres REINDEX re-runs to_tsvector) — at web scale
re-running the extract UDF to re-tune bucket counts would dominate the
cost, so the migration path must never touch the source corpus.
"""

import dataclasses

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

OLD_CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
NEW_CFG = dataclasses.replace(OLD_CFG, n_doc_buckets=5, n_term_buckets=3,
                              block_size=16, k1=0.9, b=0.4)


@pytest.fixture(scope="module")
def migrated(spark, tiny_corpus_dir, tmp_path_factory):
    """Build under OLD_CFG (with the opt-in positional/embedding/fuzzy
    derivatives), then migrate to NEW_CFG. The source DataFrame is only
    ever passed to the initial build — migration cannot re-extract by
    construction (no documents argument)."""
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_mig")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, OLD_CFG)
    builder.build(docs)
    builder.build_positions()
    builder.build_embeddings(dim=16)
    builder.build_fuzzy(max_edit=1)
    nb = builder.migrate_layout(NEW_CFG)
    return store, nb, docs


@pytest.fixture(scope="module")
def scratch(spark, tiny_corpus_dir, tmp_path_factory):
    """From-scratch build under NEW_CFG — the identity baseline."""
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_scr")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, NEW_CFG)
    builder.build(docs)
    builder.build_embeddings(dim=16)
    builder.build_fuzzy(max_edit=1)
    return store


def _rows(store, table, cols):
    return sorted(
        tuple(r[c] for c in cols)
        for r in store.read(table).select(*cols).collect())


def test_postings_bit_identical_to_scratch_build(migrated, scratch):
    store, _, _ = migrated
    cols = ["term", "partition_id", "block_id", "n_postings",
            "first_doc_id", "last_doc_id", "doc_ids_vb", "tfs_vb",
            "dls_vb", "block_max_tf_norm", "cf_block", "term_bucket"]
    got = _rows(store, "postings", cols)
    want = _rows(scratch, "postings", cols)
    assert got == want and len(got) > 0


def test_doc_features_content_carried(migrated, scratch):
    store, _, _ = migrated
    cols = ["doc_id", "url", "extracted_sha256", "doc_len", "partition_id"]
    assert _rows(store, "doc_features", cols) == \
        _rows(scratch, "doc_features", cols)


def test_term_stats_and_meta_identical(migrated, scratch):
    store, _, _ = migrated
    assert _rows(store, "term_stats",
                 ["term", "df", "cf", "term_bucket"]) == \
        _rows(scratch, "term_stats", ["term", "df", "cf", "term_bucket"])
    assert _rows(store, "doc_meta", ["doc_id", "partition_id"]) == \
        _rows(scratch, "doc_meta", ["doc_id", "partition_id"])


def test_query_rank_identity_after_migration(migrated, spark, tiny_rows):
    store, nb, _ = migrated
    oracle = OracleIndex.build(tiny_rows, NEW_CFG)
    qe = QueryEngine(spark, store, cfg=None)  # bind the persisted NEW_CFG
    assert qe.cfg.n_doc_buckets == NEW_CFG.n_doc_buckets
    assert qe.cfg.k1 == NEW_CFG.k1
    for q in ["wireless bluetooth", "gaming laptop"]:
        got = qe.top_k(q, k=10)
        want = oracle.top_k(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6


def test_positions_rebuilt_under_new_buckets(migrated):
    store, _, _ = migrated
    parts = {r["partition_id"] for r in
             store.read("positions").select("partition_id").collect()}
    assert parts <= set(range(NEW_CFG.n_doc_buckets))
    assert max(parts) >= 3   # really rebucketed into the 5-bucket space


def test_embeddings_and_fuzzy_refreshed(migrated, scratch):
    store, _, _ = migrated
    cols = ["doc_id", "partition_id", "emb"]
    got = sorted((r["doc_id"], r["partition_id"], tuple(r["emb"]))
                 for r in store.read("doc_embeddings").collect())
    want = sorted((r["doc_id"], r["partition_id"], tuple(r["emb"]))
                  for r in scratch.read("doc_embeddings").collect())
    assert got == want
    assert _rows(store, "term_deletes",
                 ["variant", "term", "variant_bucket"]) == \
        _rows(scratch, "term_deletes",
              ["variant", "term", "variant_bucket"])


def test_subsequent_build_resume_skips_everything(migrated):
    """The migrated fingerprints are wired exactly as build() writes them:
    a rerun of build() under the new config skips every stage (never
    re-extracts)."""
    store, nb, docs = migrated
    runner = nb.build(docs)
    ran = [m["stage"] for m in runner.metrics if not m.get("skipped")]
    assert ran == []


def test_migration_idempotent(migrated):
    store, nb, _ = migrated
    uuid_before = (store.table_meta("postings") or {})["data_uuid"]
    nb.migrate_layout(NEW_CFG)   # no config change → every stage skips
    assert (store.table_meta("postings") or {})["data_uuid"] == uuid_before


def test_rejects_content_affecting_change(migrated):
    _, nb, _ = migrated
    with pytest.raises(ValueError, match="non-layout"):
        nb.migrate_layout(dataclasses.replace(NEW_CFG, analyzer="english"))


def test_rejects_unbound_builder(migrated, spark):
    store, _, _ = migrated
    stale = IndexBuilder(spark, store, OLD_CFG)   # index now holds NEW_CFG
    with pytest.raises(ValueError, match="persisted"):
        stale.migrate_layout(dataclasses.replace(OLD_CFG, n_doc_buckets=4))


def test_no_python_udf_in_rebucket_plan(migrated, spark):
    """The stage-1 migration pass must be JVM-only: recomputing the bucket
    from the stable doc_id never calls the extract/tokenize UDFs."""
    store, nb, _ = migrated
    src = store.read("doc_features")
    from semantic_search_engine_spark.functions.udfs import doc_bucket_expr
    plan = (src.drop("partition_id")
            .withColumn("partition_id", doc_bucket_expr("doc_id", 7))
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
