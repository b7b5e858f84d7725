"""Structured Streaming query-log analytics (search_logs made live).

Strategy: write deterministic json log files, run the SAME transformation
in batch mode and in streaming mode (file source → memory sink), and
assert equal results — plus stateful running counters across triggers.
"""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.streaming.analytics import (
    QUERY_LOG_SCHEMA,
    read_query_log_stream,
    run_to_memory_sink,
    running_query_counters,
    windowed_query_stats,
    zero_result_queries,
)

T0 = dt.datetime(2025, 3, 1, 12, 0, 0)


def _write_log_file(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _mk_rows(n0: int, n: int) -> list[dict]:
    rows = []
    for i in range(n0, n0 + n):
        rows.append({
            "query": ["laptop", "headphones", "nosuchthing"][i % 3],
            "results_count": 0 if i % 3 == 2 else 10 + i % 7,
            "response_time_ms": 100 + (i * 37) % 400,
            "created_at": (T0 + dt.timedelta(minutes=i % 23))
            .strftime("%Y-%m-%dT%H:%M:%S.000Z"),
        })
    return rows


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qlogs"))
    _write_log_file(os.path.join(d, "part-000.json"), _mk_rows(0, 40))
    _write_log_file(os.path.join(d, "part-001.json"), _mk_rows(40, 40))
    return d


def test_stream_matches_batch_windowed_stats(spark, log_dir):
    batch = spark.read.schema(QUERY_LOG_SCHEMA).json(log_dir)
    expected = {
        (r["window_start"], r["query"]):
            (r["n_searches"], round(r["avg_response_ms"], 6),
             r["max_results"])
        for r in windowed_query_stats(batch).collect()
    }

    stream = read_query_log_stream(spark, log_dir, max_files_per_trigger=1)
    q = run_to_memory_sink(windowed_query_stats(stream), "win_stats",
                           output_mode="update")
    try:
        got_rows = spark.sql(
            "SELECT * FROM win_stats").collect()
    finally:
        q.stop()
    # update-mode emits intermediate window versions; the latest per key
    # must equal the batch answer
    got = {}
    for r in got_rows:
        got[(r["window_start"], r["query"])] = (
            r["n_searches"], round(r["avg_response_ms"], 6),
            r["max_results"])
    # keep the max-n version per key (monotone growth across triggers)
    latest = {}
    for r in got_rows:
        key = (r["window_start"], r["query"])
        if key not in latest or r["n_searches"] > latest[key][0]:
            latest[key] = (r["n_searches"], round(r["avg_response_ms"], 6),
                           r["max_results"])
    assert latest == expected


def test_watermark_present_in_streaming_plan(spark, log_dir):
    stream = read_query_log_stream(spark, log_dir)
    df = windowed_query_stats(stream, watermark="10 minutes")
    assert "watermark" in df._jdf.queryExecution().analyzed().toString().lower()


def test_zero_result_feed(spark, log_dir):
    batch = spark.read.schema(QUERY_LOG_SCHEMA).json(log_dir)
    rows = zero_result_queries(batch).collect()
    assert len(rows) == 80 // 3 + (1 if 80 % 3 > 2 else 0)
    assert {r["query"] for r in rows} == {"nosuchthing"}


def test_stateful_running_counters_across_triggers(spark, log_dir):
    """applyInPandasWithState: counters accumulate across the two input
    files (processed as separate triggers via maxFilesPerTrigger=1)."""
    stream = read_query_log_stream(spark, log_dir, max_files_per_trigger=1)
    q = run_to_memory_sink(running_query_counters(stream), "run_counters",
                           output_mode="update")
    try:
        got_rows = spark.sql("SELECT * FROM run_counters").collect()
    finally:
        q.stop()
    latest = {}
    for r in got_rows:  # update mode: keep the largest snapshot per query
        if (r["query"] not in latest
                or r["total_searches"] > latest[r["query"]][0]):
            latest[r["query"]] = (r["total_searches"], r["total_ms"],
                                  r["peak_results"])

    batch = spark.read.schema(QUERY_LOG_SCHEMA).json(log_dir)
    expected = {
        r["query"]: (r["n"], r["ms"], r["peak"])
        for r in batch.groupBy("query").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("response_time_ms").alias("ms"),
            F.max("results_count").alias("peak")).collect()
    }
    assert latest == expected


# ---------------------------------------------------------------------------
# Streaming ingest: incremental crawl batches == one batch build (E13 ext.)
# ---------------------------------------------------------------------------

def _doc_rows_df(spark, rows):
    from semantic_search_engine_spark.streaming.ingest import DOCUMENT_SCHEMA
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
         for r in rows], DOCUMENT_SCHEMA)


def test_streaming_ingest_equals_single_batch_build(spark, tmp_path_factory):
    """Two streamed crawl files (maxFilesPerTrigger=1 → two micro-batches,
    first bootstraps via build, second merges via ingest_updates) must
    produce the same index state and rankings as one batch build over the
    union."""
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.corpus import generate_rows
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore
    from semantic_search_engine_spark.streaming.ingest import streaming_ingest

    cfg = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                       shuffle_partitions=4, block_size=16)
    rows = list(generate_rows(60))
    drop = str(tmp_path_factory.mktemp("crawl_drop"))
    # two disjoint crawl files landing in order
    _doc_rows_df(spark, rows[:35]).coalesce(1).write.parquet(f"{drop}/f1")
    _doc_rows_df(spark, rows[35:]).coalesce(1).write.parquet(f"{drop}/f2")
    import glob as _g
    import shutil as _sh
    for i, src in enumerate(sorted(_g.glob(f"{drop}/f*/part-*.parquet"))):
        _sh.move(src, f"{drop}/crawl-{i}.parquet")
    _sh.rmtree(f"{drop}/f1"); _sh.rmtree(f"{drop}/f2")

    s_store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_sing")))
    ckpt = str(tmp_path_factory.mktemp("ckpt_sing"))
    q = streaming_ingest(spark, s_store, drop, ckpt, cfg,
                         max_files_per_trigger=1)
    q.awaitTermination()

    b_store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_batch")))
    IndexBuilder(spark, b_store, cfg).build(_doc_rows_df(spark, rows))

    # identical corpus stats, term stats, and doc metadata
    for t in ("corpus_stats", "term_stats", "doc_meta"):
        cols = [c for c in s_store.read(t).columns
                if c not in ("n_distinct_doc_ids",)]
        sv = sorted(map(tuple, s_store.read(t).select(cols).collect()))
        bv = sorted(map(tuple, b_store.read(t).select(cols).collect()))
        assert sv == bv, t
    # identical rankings through the full WAND path
    qs = QueryEngine(spark, s_store, cfg)
    qb = QueryEngine(spark, b_store, cfg)
    for query in ["wireless bluetooth headphones", "zipfhead0 zipfhead1"]:
        assert qs.top_k(query, k=10) == qb.top_k(query, k=10), query

    # exactly-once: re-running the stream with the same checkpoint and no
    # new files must not rewrite anything
    uuid_before = (s_store.table_meta("doc_features") or {}).get("data_uuid")
    q2 = streaming_ingest(spark, s_store, drop, ckpt, cfg,
                          max_files_per_trigger=1)
    q2.awaitTermination()
    uuid_after = (s_store.table_meta("doc_features") or {}).get("data_uuid")
    assert uuid_before == uuid_after


def test_streaming_ingest_update_batch_wins(spark, tmp_path_factory):
    """A later micro-batch re-crawling an existing url replaces it (MERGE
    semantics through the stream, data_ingestion.py:224-243 analogue)."""
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.corpus import generate_rows
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore
    from semantic_search_engine_spark.streaming.ingest import streaming_ingest

    cfg = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                       shuffle_partitions=4, block_size=16)
    rows = list(generate_rows(30))
    url = rows[3]["url"]
    drop = str(tmp_path_factory.mktemp("crawl_drop2"))
    _doc_rows_df(spark, rows).coalesce(1).write.parquet(f"{drop}/f1")
    recrawl = [dict(rows[3], html=None,
                    text="recrawled body with uniquetokenqz only")]
    _doc_rows_df(spark, recrawl).coalesce(1).write.parquet(f"{drop}/f2")
    import glob as _g
    import shutil as _sh
    for i, src in enumerate(sorted(_g.glob(f"{drop}/f*/part-*.parquet"))):
        _sh.move(src, f"{drop}/crawl-{i}.parquet")
    _sh.rmtree(f"{drop}/f1"); _sh.rmtree(f"{drop}/f2")

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_upd")))
    streaming_ingest(spark, store, drop,
                     str(tmp_path_factory.mktemp("ckpt_upd")), cfg,
                     max_files_per_trigger=1).awaitTermination()

    from semantic_search_engine_spark.textproc import resolve_text
    n_valid = len({r["url"] for r in rows
                   if r["url"] is not None
                   and resolve_text(r.get("text"), r.get("html"),
                                    cfg.prefer_provided_text) is not None})
    # replaced, not duplicated
    assert store.read("doc_meta").count() == n_valid
    qe = QueryEngine(spark, store, cfg)
    hits = qe.top_k("uniquetokenqz", k=5)
    assert len(hits) == 1
    from semantic_search_engine_spark.textproc import doc_id_for_url
    assert hits[0][0] == doc_id_for_url(url)
