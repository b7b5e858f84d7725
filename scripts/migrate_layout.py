"""spark-submit entrypoint: migrate a committed index to a new physical
layout / scoring config WITHOUT re-running extraction or tokenization.

Usage (cluster):

    spark-submit --py-files sse_spark.zip scripts/migrate_layout.py \
        --warehouse <path-or-catalog> [--store hadoop|iceberg] \
        [--field text|title] [--doc-buckets N] [--term-buckets N] \
        [--block-size N] [--k1 F] [--b F] [--partition-doc-features 0|1]

Loads the index's persisted config, applies the given layout overrides,
and runs ``IndexBuilder.migrate_layout`` — the ALTER-INDEX path a growing
corpus uses to re-tune bucket counts (docs/SCALE.md sizes P at docs/P ≈
10^7) or BM25 params without paying the extract/tokenize UDF passes.
Content-affecting fields (analyzer, token lengths, ...) are rejected;
rebuild from source for those. Resumable like build: re-submitting after
a failure skips committed stages.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--store", default="hadoop", choices=["hadoop", "iceberg"])
    p.add_argument("--field", default="text", choices=["text", "title"])
    p.add_argument("--run-id", default=None)
    p.add_argument("--input-version", default="static",
                   help="source snapshot id the index was built with "
                        "(keeps the migrated stage-1 fingerprint aligned "
                        "with future build() resumes)")
    p.add_argument("--doc-buckets", type=int, default=None)
    p.add_argument("--term-buckets", type=int, default=None)
    p.add_argument("--block-size", type=int, default=None)
    p.add_argument("--k1", type=float, default=None)
    p.add_argument("--b", type=float, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--partition-doc-features", type=int, default=None,
                   choices=[0, 1])
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None

    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import make_store

    spark = (SparkSession.builder.appName("sse-migrate-layout")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    store = make_store(spark, args.warehouse, args.store)
    sfx = "" if args.field == "text" else f"_{args.field}"
    persisted = json.loads(
        store.read(f"engine_config{sfx}").collect()[0]["config_json"])
    old_cfg = EngineConfig(**persisted)

    overrides = {k: v for k, v in {
        "n_doc_buckets": args.doc_buckets,
        "n_term_buckets": args.term_buckets,
        "block_size": args.block_size,
        "k1": args.k1,
        "b": args.b,
        "shuffle_partitions": args.shuffle_partitions,
        "partition_doc_features": (None
                                   if args.partition_doc_features is None
                                   else bool(args.partition_doc_features)),
    }.items() if v is not None}
    if not overrides:
        print(json.dumps({"status": "noop",
                          "reason": "no layout overrides given"}))
        return 0
    new_cfg = dataclasses.replace(old_cfg, **overrides)

    builder = IndexBuilder(spark, store, old_cfg)
    builder.migrate_layout(new_cfg, field=args.field, run_id=args.run_id,
                           input_version=args.input_version)
    print(json.dumps({
        "status": "ok",
        "field": args.field,
        "changed": {k: [persisted[k], overrides[k]] for k in overrides
                    if persisted[k] != overrides[k]},
    }, sort_keys=True))
    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
