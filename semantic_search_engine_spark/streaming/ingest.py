"""Structured-Streaming ingest: incremental crawls → MERGE → rebuild.

The reference's pipeline is batch-only (``data-pipeline/data_ingestion.py``
re-runs end-to-end per crawl); this wrapper is the incremental form a
continuously-landing web crawl needs: a file-source stream over a document
drop directory feeds ``IndexBuilder.ingest_updates`` per micro-batch via
``foreachBatch``, so every batch flows through the same MERGE-by-url →
downstream-rebuild chain as a manual upsert — the index after N streamed
batches equals the index after one batch build over the union (pinned by
test).

Scale notes: ``foreachBatch`` is the right shape here because the sink is
a multi-stage batch job (merge + 4 derived stages), not a row-append —
exactly what the Spark docs prescribe for reusing batch writers in a
stream. Checkpointing is two-layer: the stream's ``checkpointLocation``
tracks which source files were consumed — an AT-LEAST-ONCE guarantee
(``foreachBatch`` may replay a batch after a crash), made effectively
exactly-once by the MERGE-by-url upsert being idempotent — and the
engine's own stage fingerprints make the per-batch rebuild resumable if
the driver dies mid-batch (E13).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..config import DEFAULT_CONFIG, EngineConfig
from ..plans.build_index import IndexBuilder
from ..sources.store import TableStore

#: BASELINE input_hint schema — the shape of a landed crawl file
DOCUMENT_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                   "text string, lang string")


def streaming_ingest(
    spark: SparkSession,
    store: TableStore,
    source_dir: str,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    field: str = "text",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start a stream that ingests parquet document files as they land.

    ``available_now=True`` (default) drains everything currently in
    ``source_dir`` and stops — the backfill/cron form; pass ``False`` for
    a continuously-running tail. ``max_files_per_trigger`` bounds
    micro-batch size for latency/throughput trade-off.

    Returns the ``StreamingQuery``; callers ``awaitTermination()`` it.
    """
    builder = IndexBuilder(spark, store, cfg)
    sfx = "" if field == "text" else f"_{field}"

    def _sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if store.exists(f"doc_features{sfx}"):
            builder.ingest_updates(batch_df, field=field,
                                   run_id=f"stream-{batch_id}")
        else:
            # first batch bootstraps the index (full build → fingerprints
            # committed, so batch 2+ merges instead of rebuilding)
            builder.build(batch_df, field=field,
                          run_id=f"stream-{batch_id}",
                          input_version=f"stream-{batch_id}")

    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (stream.writeStream
              .foreachBatch(_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
