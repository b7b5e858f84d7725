"""Age-based retention (X78): expire_documents drops exactly the
pre-cutoff docs through the pinned incremental-delete path; the result
equals a fresh build over the survivors; no-op and mass-expiry refusal
edges."""
from __future__ import annotations

import datetime

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)


def test_expire_documents(spark, tiny_corpus_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    # corpus warc_ts ticks one minute per doc — a cutoff at minute 50
    # expires the first 50 docs
    cutoff = [r["warc_ts"] for r in
              docs.orderBy("warc_ts").collect()][50]

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_ret")))
    b = IndexBuilder(spark, store, CFG)
    b.build(docs)
    runner = b.expire_documents(cutoff)
    assert runner is not None

    survivors = docs.filter(docs["warc_ts"] >= cutoff)
    ref_store = HadoopTableStore(spark,
                                 str(tmp_path_factory.mktemp("wh_ref")))
    IndexBuilder(spark, ref_store, CFG).build(survivors)

    # identical corpus state and rankings
    for t in ("corpus_stats", "term_stats"):
        a = sorted(map(tuple, store.read(t).collect()))
        c = sorted(map(tuple, ref_store.read(t).collect()))
        assert a == c, t
    qa = QueryEngine(spark, store, CFG)
    qb = QueryEngine(spark, ref_store, CFG)
    assert qa.top_k("zipfhead0 zipfhead1", k=10) == \
        qb.top_k("zipfhead0 zipfhead1", k=10)
    assert store.read("doc_meta").count() == survivors.count()

    # nothing left to expire at the same cutoff -> no-op
    assert b.expire_documents(cutoff) is None

    # mass expiry refused with the rebuild recommendation
    far = cutoff + datetime.timedelta(days=3650)
    with pytest.raises(ValueError, match="mass retention"):
        b.expire_documents(far, max_expire=10)
