"""Query-log analytics as Structured Streaming.

The reference designs an append-only ``search_logs`` table —
``(query, results_count, response_time_ms, created_at)``,
``data-pipeline/database.py:63-69`` — that nothing ever reads. Here it
becomes a live pipeline: the query engine appends log rows, and a
Structured Streaming job turns the feed into windowed latency/volume
analytics with watermarked late-data handling, plus a custom stateful
operator (``applyInPandasWithState``) maintaining per-query running
counters.

Every transformation is expressed once and runs in *both* batch and
streaming mode (the DataFrame is the IR; ``readStream`` vs ``read`` is the
only difference) — tests assert batch/stream result equivalence, which is
the Spark-idiomatic way to validate a streaming query.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

# search_logs shape (database.py:63-69), `id SERIAL` dropped (no serial at
# scale; the event time + query is the identity that matters).
QUERY_LOG_SCHEMA = StructType([
    StructField("query", StringType(), False),
    StructField("results_count", IntegerType(), True),
    StructField("response_time_ms", IntegerType(), True),
    StructField("created_at", TimestampType(), False),
])


def read_query_log_stream(spark: SparkSession, path: str,
                          max_files_per_trigger: int = 10) -> DataFrame:
    """File-source stream over the append-only log directory (json lines).

    At production scale this is the same code with a Kafka source —
    everything downstream is source-agnostic.
    """
    return (spark.readStream.schema(QUERY_LOG_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .json(path))


def windowed_query_stats(logs: DataFrame, window: str = "5 minutes",
                         watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window analytics with late-data watermark.

    Output: (window_start, window_end, query, n_searches, avg_response_ms,
    max_results). In streaming mode the watermark bounds state: windows
    older than ``watermark`` are finalized and evicted.
    """
    src = logs
    if logs.isStreaming:
        src = logs.withWatermark("created_at", watermark)
    return (src.groupBy(F.window("created_at", window).alias("w"), "query")
            .agg(F.count(F.lit(1)).alias("n_searches"),
                 F.avg("response_time_ms").alias("avg_response_ms"),
                 F.max("results_count").alias("max_results"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "query", "n_searches", "avg_response_ms", "max_results"))


def zero_result_queries(logs: DataFrame) -> DataFrame:
    """Quality feed: queries that found nothing (candidate synonyms/typos)."""
    return (logs.filter(F.col("results_count") == 0)
            .select("query", "created_at"))


# ---------------------------------------------------------------------------
# Custom stateful operator: per-query running counters
# ---------------------------------------------------------------------------

COUNTER_OUTPUT_SCHEMA = StructType([
    StructField("query", StringType(), False),
    StructField("total_searches", LongType(), False),
    StructField("total_ms", LongType(), False),
    StructField("peak_results", IntegerType(), False),
])

COUNTER_STATE_SCHEMA = StructType([
    StructField("total_searches", LongType(), False),
    StructField("total_ms", LongType(), False),
    StructField("peak_results", IntegerType(), False),
])


def _update_query_counters(key, pdfs: Iterator[pd.DataFrame],
                           state: GroupState) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: fold this trigger's rows for one query
    into running totals kept in GroupState. Emits the updated snapshot."""
    total, ms, peak = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        total += len(pdf)
        ms += int(pdf["response_time_ms"].fillna(0).sum())
        if len(pdf):
            peak = max(peak, int(pdf["results_count"].fillna(0).max()))
    state.update((total, ms, peak))
    yield pd.DataFrame({
        "query": [key[0]],
        "total_searches": [total],
        "total_ms": [ms],
        "peak_results": [peak],
    })


def running_query_counters(logs: DataFrame) -> DataFrame:
    """Stateful per-query running counters (streaming input only)."""
    return (logs.groupBy("query").applyInPandasWithState(
        _update_query_counters,
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def run_to_memory_sink(stream_df: DataFrame, name: str,
                       output_mode: str = "update"):
    """Drive a streaming DF into an in-memory table until the source drains
    (test/dev harness; production uses a parquet/Kafka sink + trigger)."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).start())
    q.processAllAvailable()
    return q
