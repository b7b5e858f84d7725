"""Streaming percolation (X73): the alerting stream over the crawl drop
dir — matches equal a batch percolation over the union of landed files,
replay appends are dedupable, `dedup=True` is exactly-once per
(doc, query)."""
from __future__ import annotations

import glob
import shutil

import pytest

from semantic_search_engine_spark.corpus import generate_rows
from semantic_search_engine_spark.functions.udfs import doc_id_expr
from semantic_search_engine_spark.operators.percolate import (
    compile_percolator,
    percolate,
)
from semantic_search_engine_spark.sources.store import HadoopTableStore
from semantic_search_engine_spark.streaming.ingest import DOCUMENT_SCHEMA
from semantic_search_engine_spark.streaming.percolate import (
    streaming_percolate,
)

QUERIES = [
    (1, "zipfhead0 zipfhead1"),
    (2, '"wireless bluetooth"'),
    (3, "raretermxq"),
    (4, "zipfhead0 -zipfhead1"),
]


def _doc_rows_df(spark, rows):
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
         for r in rows], DOCUMENT_SCHEMA)


def _drop_files(spark, tmp_path_factory, rows, n_files=2):
    drop = str(tmp_path_factory.mktemp("alert_drop"))
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per:(i + 1) * per]
        _doc_rows_df(spark, chunk).coalesce(1).write.parquet(
            f"{drop}/f{i}")
    for i, src in enumerate(sorted(glob.glob(f"{drop}/f*/part-*.parquet"))):
        shutil.move(src, f"{drop}/crawl-{i}.parquet")
    for i in range(n_files):
        shutil.rmtree(f"{drop}/f{i}")
    return drop


@pytest.fixture(scope="module")
def scenario(spark, tmp_path_factory):
    rows = list(generate_rows(60))
    drop = _drop_files(spark, tmp_path_factory, rows)
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    compiled = compile_percolator(queries)
    return rows, drop, compiled


def test_stream_matches_equal_batch_percolation(spark, scenario,
                                                tmp_path_factory):
    rows, drop, compiled = scenario
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_al")))
    q = streaming_percolate(spark, store, compiled, drop,
                            str(tmp_path_factory.mktemp("ckpt_al")),
                            max_files_per_trigger=1)
    q.awaitTermination()
    got = {(r["doc_id"], r["query_id"])
           for r in store.read("percolator_matches").collect()}

    # batch reference over the union, same text-resolution policy;
    # rows with NULL text: the stream extracts from html — mirror it
    from semantic_search_engine_spark.textproc import extract_html
    py_docs = []
    for r in rows:
        text = r["text"] if r["text"] is not None else (
            extract_html(bytes(r["html"]))[1] if r["html"] is not None
            else None)
        if text is not None:
            py_docs.append((r["url"], text))
    docs_df = spark.createDataFrame(py_docs, "url string, text string") \
        .withColumn("doc_id", doc_id_expr("url")).select("doc_id", "text")
    want = {(r["doc_id"], r["query_id"])
            for r in percolate(docs_df, compiled).collect()}
    assert got == want and len(want) > 0
    # multiple stored queries fire
    assert len({q for _, q in want}) >= 2


def test_replay_appends_are_dedupable_and_dedup_mode_exact(
        spark, scenario, tmp_path_factory):
    rows, drop, compiled = scenario
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_dd")))
    ckpt = str(tmp_path_factory.mktemp("ckpt_dd"))
    streaming_percolate(spark, store, compiled, drop, ckpt,
                        dedup=True).awaitTermination()
    first = sorted(map(tuple, store.read("percolator_matches")
                       .select("doc_id", "query_id").collect()))
    # a FRESH checkpoint replays everything (simulated crash-replay);
    # dedup=True must keep (doc, query) pairs exactly-once
    streaming_percolate(spark, store, compiled, drop,
                        str(tmp_path_factory.mktemp("ckpt_dd2")),
                        dedup=True).awaitTermination()
    again = sorted(map(tuple, store.read("percolator_matches")
                       .select("doc_id", "query_id").collect()))
    assert again == first
    assert len(first) == len(set(first))
