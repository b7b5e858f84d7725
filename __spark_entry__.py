"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``semantic_search_engine_spark.driver_contract``;
the full inverted-index engine (build + WAND query) is exercised by
``tests/`` and ``bench.py`` (it materializes index tables, which the
side-by-side DuckDB comparison can't replay — the declarative BM25 here
computes identical results through pure DataFrame ops).
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
