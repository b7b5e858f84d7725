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
