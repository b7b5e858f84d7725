"""spark-submit entrypoint: run BM25 top-k queries against a built index.

Usage:

    spark-submit --py-files sse_spark.zip scripts/query.py \
        --warehouse <path-or-catalog> [--store hadoop|iceberg] \
        [--field text|title] [--k 10] [--offset 0] [--min-score 0] \
        [--lang en] [--mode wand|exhaustive] [--count exact|none] \
        [--log-dir <query-log dir>] "query text" ["another query" ...]

Prints one JSON line per query: the result envelope (results, total_count,
limit, offset, query, execution_time_ms) — the SearchResponse analogue.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--store", default="hadoop", choices=["hadoop", "iceberg"])
    p.add_argument("--field", default="text", choices=["text", "title"])
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--min-score", type=float, default=0.0)
    p.add_argument("--lang", default=None)
    p.add_argument("--mode", default="wand", choices=["wand", "exhaustive"])
    p.add_argument("--count", default="none",
                   choices=["exact", "approx", "none"])
    p.add_argument("--batch", action="store_true",
                   help="answer ALL queries in one Spark job "
                        "(multi-query WAND; bare top-k only — "
                        "incompatible with filters/offset/count)")
    p.add_argument("--log-dir", default=None)
    p.add_argument("queries", nargs="+")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None

    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import make_store

    spark = (SparkSession.builder.appName("sse-query")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    store = make_store(spark, args.warehouse, args.store)
    # cfg=None → bind to the config persisted by the index build
    qe = QueryEngine(spark, store, cfg=None, field=args.field,
                     query_log_dir=args.log_dir)

    if args.batch:
        if (args.lang is not None or args.min_score != 0.0
                or args.offset != 0 or args.count != "none"
                or args.mode != "wand"):
            print("--batch supports bare WAND top-k only "
                  "(no filters/offset/count/exhaustive)", file=sys.stderr)
            return 2
        results = qe.batch_top_k(args.queries, k=args.k)
        for q in args.queries:
            hits = results[q]
            print(json.dumps(
                {"results": [{"doc_id": d, "score": s} for d, s in hits],
                 "total_count": len(hits), "limit": args.k, "offset": 0,
                 "query": q}, default=str))
        if not preexisting:
            spark.stop()
        return 0

    for q in args.queries:
        if (args.lang is None and args.min_score == 0.0
                and args.offset == 0 and args.count == "none"):
            # simple case: bare top-k honoring --mode (wand OR exhaustive)
            hits = qe.top_k(q, k=args.k, mode=args.mode)
            out = {"results": [{"doc_id": d, "score": s} for d, s in hits],
                   "total_count": len(hits), "limit": args.k, "offset": 0,
                   "query": q}
        else:
            out = qe.search(q, k=args.k, offset=args.offset,
                            min_score=args.min_score, lang=args.lang,
                            count_mode=args.count, mode=args.mode)
        print(json.dumps(out, default=str))
    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
