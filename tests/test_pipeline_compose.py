"""The full curation pipeline composed end-to-end (late r3): raw docs
with planted PII / junk / benchmark contamination flow through
scrub -> Gopher filter -> decontaminate, then the survivors build a
real index whose ranking is pinned against an OracleIndex built on the
same survivor rows. Every drop is asserted by construction."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.contamination import decontaminate
from semantic_search_engine_spark.operators.gopher import gopher_filter
from semantic_search_engine_spark.operators.pii import scrub_pii
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)

BENCH_PASSAGE = ("the capital of france is paris and the capital of "
                 "italy is rome obviously")


def _good(i: int) -> str:
    stops = ["the", "of", "and", "that", "with", "have"]
    words = []
    for j in range(40):
        words.append(stops[(i + j) % len(stops)])
        words.append(f"doc{i:02d}tok{j:02d}")
    words.append(f"needle{i % 3}")
    return "\n".join(" ".join(words[x:x + 16])
                     for x in range(0, len(words), 16))


def _rows():
    rows = []
    for i in range(8):                      # clean survivors
        rows.append((f"https://ok{i}.example/a", _good(i)))
    # PII-bearing but otherwise good: must SURVIVE, redacted
    rows.append(("https://pii.example/a",
                 _good(8) + "\nreach me at alice@example.com"))
    # junk: one sentence repeated -> Gopher dup rules drop it
    rows.append(("https://junk.example/a",
                 "spam line of the day\n" * 40))
    # contaminated: embeds the benchmark passage verbatim
    rows.append(("https://leak.example/a",
                 _good(9) + "\n" + BENCH_PASSAGE))
    return rows


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    docs = spark.createDataFrame(_rows(), "url string, text string")
    ev = spark.createDataFrame([(0, BENCH_PASSAGE)],
                               "eval_id long, text string")

    scrubbed = scrub_pii(docs, drop_over=20)
    flt = gopher_filter(scrubbed, id_col="url")
    kept = (scrubbed.join(
        flt.filter("gopher_pass").select("url"), "url"))
    clean = decontaminate(kept, ev, n=13, id_col="url")
    return docs, clean.select("url", "text")


def test_survivor_set_is_exactly_as_planted(pipeline):
    _docs, clean = pipeline
    urls = {r["url"] for r in clean.select("url").collect()}
    assert urls == ({f"https://ok{i}.example/a" for i in range(8)}
                    | {"https://pii.example/a"})


def test_pii_redacted_not_dropped(pipeline):
    _docs, clean = pipeline
    row = clean.filter(F.col("url") == "https://pii.example/a").first()
    assert "<EMAIL>" in row["text"]
    assert "alice@example.com" not in row["text"]


def test_survivors_index_and_rank_against_oracle(pipeline, spark,
                                                 tmp_path_factory):
    _docs, clean = pipeline
    corpus = clean.select(
        "url", F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"), "text",
        F.lit("en").alias("lang"))
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("pipe_wh")))
    IndexBuilder(spark, store, CFG).build(corpus)
    qe = QueryEngine(spark, store, CFG)
    oracle = OracleIndex.build(
        [dict(url=r["url"], warc_ts=None, html=None, text=r["text"],
              lang="en") for r in clean.collect()], CFG)
    for q in ["needle0", "needle1 the", "doc03tok05"]:
        got = qe.top_k(q, k=5)
        want = oracle.top_k(q, k=5)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-12)
    # the contaminated doc's unique needle is un-retrievable: doc 9's
    # tokens died with the leak drop
    assert qe.top_k("doc09tok00", k=5) == []
