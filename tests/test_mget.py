"""Point lookup by key (QueryEngine.get_docs, X111) — ES `_mget` parity.

Keys name their own storage (doc_id = f(url), bucket = g(doc_id)), so a
point lookup must prune the metadata scan to the requested buckets and
broadcast-join the tiny request list — asserted on the physical plan.
"""

from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.textproc import doc_id_for_url

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32, partition_doc_features=True)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_mget")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, None)


def _urls(tiny_rows, idxs):
    return [tiny_rows[i]["url"] for i in idxs]


def test_mget_by_url_found_and_missing(built, tiny_rows):
    urls = _urls(tiny_rows, [12, 27, 42]) + ["https://nowhere.example/x"]
    rows = {r["url"]: r for r in built.get_docs(urls=urls).collect()}
    assert len(rows) == 4
    for u in urls[:3]:
        r = rows[u]
        assert r["found"] is True
        assert r["doc_id"] == doc_id_for_url(u)
        assert r["doc_len"] > 0 and r["warc_ts"] is not None
    miss = rows["https://nowhere.example/x"]
    assert miss["found"] is False
    assert miss["lang"] is None and miss["doc_len"] is None
    # the requested url is preserved on the miss row (ES envelope shape)
    assert miss["doc_id"] == doc_id_for_url("https://nowhere.example/x")


def test_mget_by_doc_id_and_with_text(built, tiny_rows):
    urls = _urls(tiny_rows, [13, 11])
    ids = [doc_id_for_url(u) for u in urls]
    rows = {r["doc_id"]: r
            for r in built.get_docs(doc_ids=ids, with_text=True).collect()}
    assert set(rows) == set(ids)
    for u, d in zip(urls, ids):
        assert rows[d]["found"] is True
        assert rows[d]["url"] == u
        assert rows[d]["text"]  # stored extraction, non-empty


def test_mget_dedups_and_orders(built, tiny_rows):
    u = tiny_rows[15]["url"]
    rows = built.get_docs(urls=[u, u, u]).collect()
    assert len(rows) == 1 and rows[0]["found"] is True


def test_mget_refusals(built):
    with pytest.raises(ValueError, match="exactly one"):
        built.get_docs()
    with pytest.raises(ValueError, match="exactly one"):
        built.get_docs(urls=["a"], doc_ids=[1])
    with pytest.raises(ValueError, match="point-lookup"):
        built.get_docs(doc_ids=list(range(2000)))
    assert built.get_docs(urls=[]).count() == 0


def test_mget_plan_prunes_and_broadcasts(built, tiny_rows):
    df = built.get_docs(urls=_urls(tiny_rows, [12, 13]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the metadata scan carries the bucket partition filter (the layout
    # is partitioned in this fixture) and the doc_id pushdown
    assert "PartitionFilters: [" in plan
    pf = plan[plan.index("PartitionFilters"):]
    assert "partition_id" in pf[:300]
    assert "doc_id" in plan.split("PushedFilters")[1][:300]
