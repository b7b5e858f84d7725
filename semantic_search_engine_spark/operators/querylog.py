"""Query-log analytics — the feedback loop every search deployment
runs over its ``search_logs`` table (the reference designs exactly this
table, ``data-pipeline/database.py:63-69``): which queries are popular
(feeds typeahead and caching), which return nothing (the content-gap
dashboard), and popularity-ranked completions for a prefix.

Input is the engine's own query log (``QueryEngine(query_log_dir=...)``
writes one JSON file per search, atomically renamed — the same files
``streaming/analytics.read_query_log_stream`` consumes as a stream;
this module is the BATCH view over the same records).

Scale shape: one json scan + one groupBy on the normalized query
string — query logs are tiny next to the corpus (10^9 searches/day ≈
100 GB/day of JSON), and the aggregate output is bounded by distinct
queries. Normalization goes through the INDEX analyzer so "Foo  Bar"
and "foo bar" pool their counts, exactly like the suggestion dictionary
keys they will rank."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_query_log", "popular_queries", "zero_result_queries",
           "popular_suggestions"]

LOG_SCHEMA = ("query string, results_count int, response_time_ms int, "
              "created_at string")


def _norm_expr(col: str, max_token_len: int = 64,
               min_token_len: int = 1):
    """Analyzer-grid normalization as a JVM expression (the simple
    analyzer's token grid; an english-analyzer deployment should
    normalize driver-side per query — log volumes allow it)."""
    toks = F.expr(f"regexp_extract_all(lower({col}), '[a-z0-9]+', 0)")
    toks = F.filter(toks, lambda t: (F.length(t) >= min_token_len)
                    & (F.length(t) <= max_token_len))
    return F.array_join(toks, " ")


def read_query_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """The raw log records (schema pinned to what ``_log_search``
    writes)."""
    return (spark.read.schema(LOG_SCHEMA).json(log_dir)
            .withColumn("created_at",
                        F.to_timestamp("created_at",
                                       "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")))


def popular_queries(spark: SparkSession, log_dir: str, n: int = 100,
                    min_count: int = 1) -> DataFrame:
    """(query, n_searches, avg_results, avg_latency_ms, last_seen)
    ranked by popularity — ties break on the normalized query text."""
    logs = read_query_log(spark, log_dir)
    agg = (logs
           .withColumn("q", _norm_expr("query"))
           .filter(F.length("q") > 0)
           .groupBy("q")
           .agg(F.count(F.lit(1)).alias("n_searches"),
                F.avg("results_count").alias("avg_results"),
                F.avg("response_time_ms").alias("avg_latency_ms"),
                F.max("created_at").alias("last_seen"))
           .filter(F.col("n_searches") >= min_count))
    return (agg.select(F.col("q").alias("query"), "n_searches",
                       "avg_results", "avg_latency_ms", "last_seen")
            .orderBy(F.desc("n_searches"), F.asc("query")).limit(n))


def zero_result_queries(spark: SparkSession, log_dir: str,
                        n: int = 100) -> DataFrame:
    """The content-gap report: queries whose EVERY recorded search
    returned nothing, by frequency. (A query that ever returned results
    is not a gap — it may have been a transient index state.)"""
    logs = read_query_log(spark, log_dir)
    agg = (logs.withColumn("q", _norm_expr("query"))
           .filter(F.length("q") > 0)
           .groupBy("q")
           .agg(F.count(F.lit(1)).alias("n_searches"),
                F.max("results_count").alias("_max_results")))
    return (agg.filter(F.col("_max_results") == 0)
            .select(F.col("q").alias("query"), "n_searches")
            .orderBy(F.desc("n_searches"), F.asc("query")).limit(n))


def popular_suggestions(spark: SparkSession, log_dir: str, prefix: str,
                        n: int = 10) -> DataFrame:
    """Popularity-ranked query completions for a prefix — the
    log-driven leg of typeahead (the dictionary-driven leg is
    ``QueryEngine.suggest``; serve the union: logs rank what users DO,
    the dictionary covers what the corpus HAS). Prefix matching is on
    the normalized text, token-grid aligned."""
    norm_prefix = " ".join(
        __import__("re").findall(r"[a-z0-9]+", prefix.lower()))
    if not norm_prefix:
        return spark.createDataFrame([], "query string, n_searches long")
    pop = popular_queries(spark, log_dir, n=2 ** 31 - 1)
    return (pop.filter(F.col("query").startswith(norm_prefix))
            .select("query", "n_searches")
            .orderBy(F.desc("n_searches"), F.asc("query")).limit(n))
