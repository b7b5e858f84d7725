"""Query-log analytics (X92): batch aggregates over the engine's own
search-log records — popularity, zero-result gaps, prefix completions —
including records written by the real ``_log_search`` path."""
from __future__ import annotations

import json
import os

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.querylog import (
    popular_queries,
    popular_suggestions,
    read_query_log,
    zero_result_queries,
)

RECORDS = [
    # (query, results_count, latency, created_at)
    ("Wireless Headphones", 5, 12, "2026-08-01T10:00:00.000Z"),
    ("wireless   headphones", 5, 15, "2026-08-02T10:00:00.000Z"),
    ("WIRELESS headphones!", 0, 9, "2026-08-03T10:00:00.000Z"),
    ("wireless charger", 3, 20, "2026-08-01T11:00:00.000Z"),
    ("quantum flux", 0, 5, "2026-08-01T12:00:00.000Z"),
    ("quantum flux", 0, 7, "2026-08-02T12:00:00.000Z"),
    ("", 0, 1, "2026-08-01T13:00:00.000Z"),
]


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qlog"))
    for i, (q, rc, ms, ts) in enumerate(RECORDS):
        with open(os.path.join(d, f"r{i}.json"), "w") as f:
            f.write(json.dumps({"query": q, "results_count": rc,
                                "response_time_ms": ms,
                                "created_at": ts}) + "\n")
    return d


def test_popularity_pools_normalized_forms(spark, log_dir):
    rows = popular_queries(spark, log_dir, n=10).collect()
    by_q = {r["query"]: r for r in rows}
    # three surface forms of the same query pool into one
    assert by_q["wireless headphones"]["n_searches"] == 3
    assert by_q["wireless headphones"]["avg_results"] == pytest.approx(
        10 / 3)
    assert by_q["quantum flux"]["n_searches"] == 2
    assert "" not in by_q
    # ranked by count desc, then query asc
    assert [r["query"] for r in rows][:2] == ["wireless headphones",
                                              "quantum flux"]


def test_zero_result_gap_report(spark, log_dir):
    rows = zero_result_queries(spark, log_dir).collect()
    # "wireless headphones" once returned 0 but not ALWAYS -> not a gap
    assert [r["query"] for r in rows] == ["quantum flux"]
    assert rows[0]["n_searches"] == 2


def test_prefix_completions(spark, log_dir):
    rows = popular_suggestions(spark, log_dir, "WiRe").collect()
    assert [r["query"] for r in rows] == ["wireless headphones",
                                          "wireless charger"]
    assert popular_suggestions(spark, log_dir, "??").count() == 0


def test_real_log_search_records_parse(spark, log_dir, tmp_path_factory):
    """Records written by the engine's own _log_search round-trip
    through read_query_log — pins the schema contract."""
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    d = str(tmp_path_factory.mktemp("qlog_real"))
    qe = QueryEngine(spark,
                     HadoopTableStore(spark,
                                      str(tmp_path_factory.mktemp("s"))),
                     EngineConfig(), query_log_dir=d)
    qe._log_search("hello world", 7, 42)
    rows = read_query_log(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["query"], r["results_count"],
            r["response_time_ms"]) == ("hello world", 7, 42)
    assert r["created_at"] is not None
    assert popular_queries(spark, d).collect()[0]["query"] == \
        "hello world"
