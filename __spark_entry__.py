"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``semantic_search_engine_spark.driver_contract``:
50 paired Spark/DuckDB queries (hard-capped at the driver's 50-entry
verification window so every entry gets a CORRECTNESS row), including
EIGHT gates that run the FULL inverted-index engine (build into a cached
warehouse) inside the comparison — bare block-max-WAND top-k
(``bm25_topk_engine_wand``), the MaxScore kernel + adaptive router
(``bm25_maxscore_engine``), multi-query batch
(``bm25_batch_topk_engine``), structured-filtered
(``bm25_filtered_engine_wand``), score-threshold with seeded-theta WAND
(``bm25_threshold_engine_wand``), positional-index phrase retrieval
(``bm25_phrase_engine``), websearch boolean retrieval
(``bm25_boolean_engine``), and facet histograms (``facet_counts``) —
each against the equivalent declarative SQL. ``binary_payload_stats``
additionally round-trips real RIFF/WAVE PCM bytes through the stdlib
codec against a closed-form oracle. ``tests/`` and ``bench.py`` cover
the rest of the engine surface (resume, merge, incremental
maintenance, streaming, snippets, ANN serving, fused positions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from semantic_search_engine_spark import driver_contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 with deterministic tie-break on sf0.001."""
    return driver_contract.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_contract.queries()


def oracle_sql() -> dict[str, str]:
    return driver_contract.oracle_sql()
