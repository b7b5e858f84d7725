"""Streaming percolation — standing-query alerting over the crawl drop
directory (Elasticsearch percolate + watcher, as a Structured Streaming
job): fresh documents land, every micro-batch is matched against the
compiled stored-query set (operators/percolate.py, X70), and the
(url, doc_id, query_id, batch_id) match records APPEND to a store table
(X24's append primitive — one commit per batch, no read-union-rewrite).

This is the third consumer of the same drop directory, after index
ingest (streaming/ingest.py) and query-log analytics — the
crawl-pipeline shape where one landed file fans out to independent
streams, each with its own checkpoint.

Delivery semantics: the file-source checkpoint gives at-least-once batch
replay on crash; match records carry ``batch_id``, so a replayed batch
re-appends the same rows and readers dedup on
(doc_id, query_id, batch_id) — or exactly-once per (doc_id, query_id)
via ``dedup=True``, which anti-joins the already-appended matches before
appending (an idempotent-on-replay sink at the cost of one extra read
per batch).

Scale notes: percolation cost per batch is the anchor-join candidate
fanout (see operators/percolate.py) — independent of index size, linear
in batch size; ``compiled`` is broadcast-sized for typical stored-query
counts. Text resolution reuses the engine's extract policy (prefer
provided text, else extract from html) in one Arrow pass.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import doc_id_expr
from ..operators.percolate import percolate
from ..sources.store import TableStore
from .ingest import DOCUMENT_SCHEMA

__all__ = ["streaming_percolate"]


def _resolve_text(batch_df: DataFrame) -> DataFrame:
    """(url, warc_ts, html, text, ...) -> (doc_id, url, text) with the
    engine's resolution policy: trust provided text, else extract."""
    from ..textproc import extract_html

    def _extract(iterator):
        import pandas as pd
        for pdf in iterator:
            texts = []
            for t, h in zip(pdf["text"], pdf["html"]):
                if t is not None:
                    texts.append(t)
                elif h is not None:
                    texts.append(extract_html(bytes(h))[1])
                else:
                    texts.append(None)
            yield pd.DataFrame({"url": pdf["url"], "text": texts})

    resolved = (batch_df.select("url", "html", "text")
                .mapInPandas(_extract, schema="url string, text string")
                .filter(F.col("text").isNotNull()))
    return resolved.withColumn("doc_id", doc_id_expr("url"))


def streaming_percolate(
    spark: SparkSession,
    store: TableStore,
    compiled: DataFrame,
    source_dir: str,
    checkpoint_dir: str,
    matches_table: str = "percolator_matches",
    dedup: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the alerting stream; returns the ``StreamingQuery``.

    ``compiled`` is the output of ``compile_percolator`` (error rows are
    ignored there). Matches append to ``matches_table`` as
    (doc_id, url, query_id, batch_id)."""
    compiled = compiled.cache()  # reused every micro-batch

    def _sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = _resolve_text(batch_df)
        hits = (percolate(docs.select("doc_id", "text"), compiled)
                .join(docs.select("doc_id", "url"), "doc_id")
                .select("doc_id", "url", "query_id",
                        F.lit(int(batch_id)).alias("batch_id")))
        if dedup and store.exists(matches_table):
            seen = store.read(matches_table).select("doc_id", "query_id")
            hits = hits.join(seen, ["doc_id", "query_id"], "left_anti")
        if store.exists(matches_table):
            store.append(matches_table, hits)
        else:
            store.write(matches_table, hits)

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
