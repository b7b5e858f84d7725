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
    operators/    — dedup (exact + MinHash-LSH pipeline) and ANN
                    (brute-force cosine + spherical IVF)
    sources/      — TableStore abstraction (parquet+manifest snapshots;
                    Iceberg-ready interface) + multimodal binary columns
    plans/        — index build pipeline + query engine (exhaustive and
                    block-max WAND paths)
    streaming/    — query-log analytics (watermarked windows, stateful
                    counters)
    lineage.py    — checkpoint-resumable stage graph + per-partition lineage
    driver_contract.py — 47 paired Spark/DuckDB correctness queries
"""

__version__ = "0.1.0"
