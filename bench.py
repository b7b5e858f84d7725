"""Headline benchmark: index-build throughput + BM25 query latency.

Per BASELINE.json the authoritative metric is index-build throughput
(docs/sec) plus BM25 top-10 rank-identity; this script measures both at the
scale mapped from ``$SPARK_GRAFT_SF_DIR`` and prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-phase seconds...}, "sf": <sf>, ...extras}

Run directly: ``python bench.py``. Env knobs:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1) — selects scale
  SPARK_GRAFT_CPUS    (default 32)                   — local[N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    # synthetic webtext corpus size per scale factor (docs)
    n_docs = {0.001: 2_000, 0.01: 20_000, 0.1: 100_000}.get(sf, 20_000)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sse-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.corpus import QUERY_CORPUS, write_corpus
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cache_root = os.environ.get("SSE_BENCH_CACHE", "/tmp/sse_bench")
    corpus_dir = os.path.join(cache_root, f"corpus_n{n_docs}")
    t0 = time.time()
    corpus_path = write_corpus(corpus_dir, n_docs)
    gen_sec = time.time() - t0

    warehouse = os.path.join(cache_root, f"warehouse_n{n_docs}_c{cpus}")
    shutil.rmtree(warehouse, ignore_errors=True)  # measure a cold build
    store = HadoopTableStore(spark, warehouse)
    cfg = EngineConfig(shuffle_partitions=cpus,
                       n_doc_buckets=max(32, cpus))
    builder = IndexBuilder(spark, store, cfg)
    docs = spark.read.parquet(corpus_path)

    t0 = time.time()
    runner = builder.build(docs)
    build_sec = time.time() - t0
    stage_sec = {m["stage"]: m["wall_ms"] / 1000.0 for m in runner.metrics}

    qe = QueryEngine(spark, store, cfg)
    queries: dict[str, float] = {"index_build": round(build_sec, 3)}
    qtimes = []
    for i, pq in enumerate(QUERY_CORPUS):
        t0 = time.time()
        qe.top_k(pq.query, k=pq.k)
        dt = time.time() - t0
        queries[f"q{i}_{pq.query.split()[0]}"] = round(dt, 3)
        qtimes.append(dt)
    # one exact-count filtered search (the reference's two-statement pattern)
    t0 = time.time()
    qe.search("wireless bluetooth headphones", k=10, lang="en",
              count_mode="exact")
    queries["q_filtered_exact_count"] = round(time.time() - t0, 3)

    total = build_sec + sum(qtimes) + queries["q_filtered_exact_count"]
    out = {
        "metric": "index_build_plus_query_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / build_sec, 1),
        "cpus": cpus,
        "corpus_gen_sec": round(gen_sec, 3),
        "stage_sec": {k: round(v, 3) for k, v in stage_sec.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
