"""Headline benchmark: index-build throughput + BM25 query latency.

Per BASELINE.json the authoritative metric is index-build throughput
(docs/sec) plus BM25 top-10 rank-identity; this script measures both at the
scale mapped from ``$SPARK_GRAFT_SF_DIR`` and prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-phase seconds...}, "sf": <sf>, ...extras}

Run directly: ``python bench.py``. Env knobs:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1) — selects scale
  SPARK_GRAFT_CPUS    (default 32)                   — local[N]

``python bench.py --scaling`` runs the identical index build at local[8]
and local[32] in fresh subprocesses (the sandbox stand-in for N vs 4N
executors, per the driver instruction), prints both throughputs plus the
scaling efficiency, and rewrites the measured-results section of BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    # synthetic webtext corpus size per scale factor (docs)
    n_docs = {0.001: 2_000, 0.01: 20_000, 0.1: 100_000}.get(sf, 20_000)
    n_docs = int(os.environ.get("SPARK_GRAFT_NDOCS", n_docs))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sse-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        # small-scale tuning: the sandbox corpus is tens of MB, so default
        # 64m advisory/128m split sizes under-parallelize; at real scale
        # these two lines are unnecessary (data >> advisory size).
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.files.maxPartitionBytes", "16m")
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
    # 4 tasks per core on the UDF-heavy explicit repartitions: page sizes
    # are skewed (long docs), so finer tasks cut the straggler tail
    cfg = EngineConfig(shuffle_partitions=4 * cpus,
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


def scaling_main() -> None:
    """Two-cluster-size scaling evidence (north_rule): same input, same code,
    local[8] vs local[32]; efficiency = (thr_32 / thr_8) / (32 / 8)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Scaling evidence needs a compute-dominated run: at 100k docs the
    # build is ~10 s fixed overhead vs ~150 core-s of UDF work, which caps
    # apparent efficiency far below the engine's real scaling. 400k docs
    # puts >20x compute over overhead at local[32].
    n_docs = os.environ.get("SPARK_GRAFT_NDOCS", "400000")
    runs = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_NDOCS=n_docs)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=3600)
        line = out.stdout.strip().splitlines()[-1]
        runs[cpus] = json.loads(line)
        print(f"local[{cpus}]: build {runs[cpus]['queries']['index_build']}s, "
              f"{runs[cpus]['docs_per_sec']} docs/sec", file=sys.stderr)
    thr8, thr32 = runs[8]["docs_per_sec"], runs[32]["docs_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    result = {
        "metric": "index_build_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {"docs_per_sec_local8": thr8,
                    "docs_per_sec_local32": thr32,
                    "build_sec_local8": runs[8]["queries"]["index_build"],
                    "build_sec_local32": runs[32]["queries"]["index_build"]},
        "sf": runs[32]["sf"],
        "n_docs": runs[32]["n_docs"],
        "runs": {str(c): r for c, r in runs.items()},
    }
    print(json.dumps(result))
    _write_bench_md(result)


def _write_bench_md(result: dict) -> None:
    lines = [
        "# BENCH — measured scaling evidence",
        "",
        "North-rule criterion: indexing-throughput scaling efficiency >= 0.8",
        "between N and 4N executors. No real cluster in this sandbox, so the",
        "same job runs at two parallelism levels on the same input",
        "(local[8] vs local[32]), per the driver instruction.",
        "",
        f"Corpus: {result['n_docs']} synthetic webtext docs "
        f"(seeded, deterministic), sf={result['sf']}.",
        "",
        "| parallelism | index build (s) | throughput (docs/sec) |",
        "|---|---|---|",
    ]
    q = result["queries"]
    for c in (8, 32):
        lines.append(f"| local[{c}] | {q[f'build_sec_local{c}']} "
                     f"| {q[f'docs_per_sec_local{c}']} |")
    lines += [
        "",
        f"**Scaling efficiency = (thr_32 / thr_8) / (32/8) = "
        f"{result['value']}** (target >= 0.8).",
        "",
        "Per-stage wall-clock (local[32]):",
        "",
        "| stage | seconds |",
        "|---|---|",
    ]
    for stage, sec in result["runs"]["32"]["stage_sec"].items():
        lines.append(f"| {stage} | {sec} |")
    lines += [
        "",
        "Query latencies (local[32], seconds; q* are block-max WAND top-10):",
        "",
        "```json",
        json.dumps(result["runs"]["32"]["queries"], indent=1),
        "```",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_main()
        sys.exit(0)
    sys.exit(main())
