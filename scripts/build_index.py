"""spark-submit entrypoint: build the inverted index.

Usage (cluster):

    spark-submit --py-files sse_spark.zip scripts/build_index.py \
        --input <parquet-or-iceberg-table> --warehouse <path-or-catalog> \
        [--store hadoop|iceberg] [--field text|title] \
        [--input-version <source snapshot id>] \
        [--shuffle-partitions N] [--doc-buckets N] [--term-buckets N]

The job is checkpoint-resumable: re-submitting after a failure skips every
stage whose committed output is current (lineage.py). Pass the source
table's snapshot id as --input-version so source-data changes invalidate
the first stage.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="parquet path or catalog table of documents "
                        "(url, warc_ts, html, text, lang)")
    p.add_argument("--warehouse", required=True,
                   help="store root path (hadoop) or catalog name (iceberg)")
    p.add_argument("--store", default="hadoop", choices=["hadoop", "iceberg"])
    p.add_argument("--field", default="text", choices=["text", "title"])
    p.add_argument("--input-version", default="static")
    p.add_argument("--run-id", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--doc-buckets", type=int, default=None)
    p.add_argument("--term-buckets", type=int, default=None)
    p.add_argument("--k1", type=float, default=None)
    p.add_argument("--b", type=float, default=None)
    p.add_argument("--analyzer", default=None,
                   choices=["simple", "english"],
                   help="token normalization: 'english' = Snowball "
                        "stopwords + Porter stemming (Postgres "
                        "to_tsvector('english') parity); default simple")
    p.add_argument("--positions", action="store_true",
                   help="also build the positional index "
                        "(phrase/proximity retrieval)")
    p.add_argument("--suffix-dict", action="store_true",
                   help="build the reversed-term dictionary (term_rev) "
                        "so leading-wildcard '*word' queries push down "
                        "instead of scanning the full dictionary")
    p.add_argument("--trigram-dict", action="store_true",
                   help="build the trigram term dictionary (term_trigram) "
                        "so infix-wildcard '*word*' queries scan only the "
                        "stem's trigram rows (pg_trgm's LIKE-'%%word%%' "
                        "plan) instead of the full dictionary")
    p.add_argument("--fuzzy", action="store_true",
                   help="also build the SymSpell deletion index "
                        "(typo-tolerant lookup / --mode fuzzy)")
    p.add_argument("--lm", action="store_true",
                   help="persist the bigram language model "
                        "(lm_unigrams/lm_bigrams) so 'did you mean' "
                        "(query.py --did-you-mean) serves without "
                        "retraining")
    p.add_argument("--embeddings", type=int, default=None, metavar="DIM",
                   help="also build DIM-dimensional hashed doc embeddings "
                        "(hybrid / --mode hybrid retrieval)")
    p.add_argument("--champions", action="store_true",
                   help="also build impact-ordered champion lists "
                        "(exact WAND theta bootstrap / --mode impact)")
    p.add_argument("--link-field", action="store_true",
                   help="also extract the link graph and index in-link "
                        "anchor text as the 'anchor' BM25F field")
    p.add_argument("--static-rank", action="store_true",
                   help="also compute PageRank over the link graph into "
                        "the static_rank table (query --static pagerank)")
    p.add_argument("--dedup", default=None, choices=["exact", "near"],
                   help="content dedup at ingest: drop cross-url "
                        "duplicate bodies ('exact' = identical text, "
                        "'near' = MinHash-LSH clusters too); decisions "
                        "land in the dedup_drops ledger table")
    p.add_argument("--dedup-threshold", type=float, default=None,
                   help="near-dup Jaccard threshold (default 0.7)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None

    from semantic_search_engine_spark.config import DEFAULT_CONFIG, EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import make_store

    spark = (SparkSession.builder.appName("sse-build-index")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    overrides = {k: v for k, v in {
        "shuffle_partitions": args.shuffle_partitions,
        "n_doc_buckets": args.doc_buckets,
        "n_term_buckets": args.term_buckets,
        "k1": args.k1,
        "b": args.b,
        "analyzer": args.analyzer,
        "dedup": args.dedup,
        "dedup_threshold": args.dedup_threshold,
    }.items() if v is not None}
    import dataclasses
    cfg = dataclasses.replace(DEFAULT_CONFIG, **overrides) \
        if overrides else DEFAULT_CONFIG
    assert isinstance(cfg, EngineConfig)

    store = make_store(spark, args.warehouse, args.store)
    if args.input.endswith((".parquet", "/")) or "/" in args.input:
        docs = spark.read.parquet(args.input)
    else:
        docs = spark.read.table(args.input)

    builder = IndexBuilder(spark, store, cfg)
    runner = builder.build(
        docs, field=args.field, run_id=args.run_id,
        input_version=args.input_version)
    stages = list(runner.metrics)
    if args.positions:
        stages += builder.build_positions(field=args.field,
                                          run_id=args.run_id).metrics
    if args.suffix_dict:
        stages += builder.build_suffix(field=args.field,
                                       run_id=args.run_id).metrics
    if args.trigram_dict:
        stages += builder.build_trigram(field=args.field,
                                        run_id=args.run_id).metrics
    if args.fuzzy:
        stages += builder.build_fuzzy(field=args.field,
                                      run_id=args.run_id).metrics
    if args.lm:
        stages += builder.build_lm(field=args.field,
                                   run_id=args.run_id).metrics
    if args.embeddings:
        stages += builder.build_embeddings(field=args.field,
                                           dim=args.embeddings,
                                           run_id=args.run_id).metrics
    if args.champions:
        stages += builder.build_champions(field=args.field,
                                          run_id=args.run_id).metrics
    if args.link_field:
        stages += builder.build_link_field(
            docs, run_id=args.run_id,
            input_version=args.input_version).metrics
    if args.static_rank:
        stages += builder.build_static_rank(
            docs, run_id=args.run_id,
            input_version=args.input_version).metrics
    print(json.dumps({"run_id": runner.run_id,
                      "stages": [{k: m[k] for k in
                                  ("stage", "skipped", "wall_ms",
                                   "output_rows")}
                                 for m in stages]}, default=str))
    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
