"""semantic_search_engine_spark — a PySpark-native full-text (BM25) engine.

A from-scratch rebuild of the *capabilities* of
``rnallanlab/semantic-search-engine`` (ingest → normalize → featurize →
index → filtered scored top-k retrieval with pagination; see
``/root/reference``) as an idiomatic Spark batch inverted-index builder
plus BM25 top-k query engine over Common-Crawl-style web pages.

Layout:
    config.py     — engine configuration (BM25 k1/b, block size, partitions)
    textproc.py   — deterministic HTML→text extractor + tokenizer (shared
                    verbatim between the single-node oracle and Spark UDFs,
                    guaranteeing the byte-identity invariant)
    corpus.py     — seeded synthetic webtext corpus generator (FIXTURES.md)
    oracle.py     — single-node reference implementation (correctness anchor)
    functions/    — pandas UDFs + varbyte/delta posting codec
    operators/    — normalization parsers, top-k/pagination, dedup, textstats
    sources/      — TableStore abstraction (parquet+manifest snapshots;
                    Iceberg-ready interface)
    plans/        — index build pipeline + query engine
    streaming/    — structured-streaming ingest (documents → doc_meta deltas)
"""

__version__ = "0.1.0"
