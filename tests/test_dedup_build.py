"""Content dedup at ingest (X60): build-time exact/near dedup staged as
doc_features_raw → dedup_drops → doc_features, with ledger decisions
pinned against an independent Python oracle (own XXH64, own shingling,
own union-find), bit-identity against a pre-filtered build, resume
behavior (re-tuning dedup never re-extracts), and ingest/delete
maintenance equivalence (new dups dropped, deleted survivors resurrect
their losers)."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.corpus import render_page
from semantic_search_engine_spark.oracle import (
    OracleIndex,
    dedup_decisions,
    xxhash64,
)
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore
from semantic_search_engine_spark.textproc import (
    doc_id_for_url,
    resolve_text,
)

TS = dt.datetime(2026, 1, 1)

NEAR_CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                        shuffle_partitions=8, block_size=16,
                        dedup="near")
EXACT_CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                         shuffle_partitions=8, block_size=16,
                         dedup="exact")
PLAIN_CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                         shuffle_partitions=8, block_size=16)


def _row(i: int, url: str, title: str, p1: str, p2: str) -> dict:
    return dict(url=url, warc_ts=TS,
                html=render_page(i, title, p1, p2).encode("utf-8"),
                text=None, lang="en")


def _words(seed: int, n: int) -> str:
    # stride-17 progressions with doc-specific offsets: two different
    # seeds never share a 3-shingle (the offsets can't align for three
    # consecutive positions), so only the PLANTED near-dups cluster
    return " ".join(f"w{(seed * 101 + j * 17) % 9973:04d}"
                    for j in range(n))


def planted_rows() -> list[dict]:
    rows = [
        _row(i, f"https://site{i}.example/page",
             f"title {_words(i, 3)}", _words(i, 30), _words(i + 50, 25))
        for i in range(40)
    ]
    # exact dups: doc 3's content at three mirror urls
    for m in range(3):
        rows.append(dict(rows[3], url=f"https://mirror{m}.example/copy3"))
    # near dups: doc 7's body with one token appended (J ≈ 0.95)
    for m in range(2):
        rows.append(_row(7, f"https://near{m}.example/v7",
                         f"title {_words(7, 3)}",
                         _words(7, 30) + f" extra{m}", _words(57, 25)))
    # a near-dup whose EXACT copy also exists (exact keeper chains to a
    # near keeper — exercises the final-keep remap)
    chained = _row(9, "https://chain0.example/v9", f"title {_words(9, 3)}",
                   _words(9, 30) + " chained", _words(59, 25))
    rows.append(chained)
    rows.append(dict(chained, url="https://chain1.example/v9copy"))
    return rows


def _unique_url_docs(rows: list[dict]) -> list[tuple[int, str]]:
    """(doc_id, extracted_text) per url — the oracle's dedup input (the
    fixture has no recrawl urls, so resolution is trivial)."""
    out = []
    for r in rows:
        text = resolve_text(r["text"], r["html"], True)
        out.append((doc_id_for_url(r["url"]), text))
    assert len({d for d, _ in out}) == len(out)
    return out


@pytest.fixture(scope="module")
def near_built(spark, tmp_path_factory):
    rows = planted_rows()
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_nd")))
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    builder = IndexBuilder(spark, store, NEAR_CFG)
    runner = builder.build(docs)
    return rows, store, builder, runner


def _ledger(store) -> dict[int, tuple[int, str]]:
    return {r["doc_id"]: (r["keep_doc_id"], r["reason"])
            for r in store.read("dedup_drops").collect()}


def test_xxhash64_matches_spark(spark):
    samples = ["", "a", "hello world", "x" * 31, "y" * 32, "z" * 100,
               "shingle one two:3", "naïve café 日本語"]
    got = [xxhash64(s.encode("utf-8")) for s in samples]
    want = [r["h"] for r in spark.createDataFrame(
        [(s,) for s in samples], "s string")
        .select(F.xxhash64("s").alias("h")).collect()]
    assert got == want


def test_near_ledger_matches_oracle(near_built):
    rows, store, _b, _r = near_built
    want = dedup_decisions(_unique_url_docs(rows), NEAR_CFG)
    assert _ledger(store) == want
    # the fixture really exercises both reasons and the keeper remap
    reasons = {r for _, r in want.values()}
    assert reasons == {"exact", "near"}
    # every keeper survives (no chains)
    assert not (set(want) & {k for k, _ in want.values()})


def test_exact_ledger_matches_oracle(spark, tmp_path_factory):
    rows = planted_rows()
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_ex")))
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    IndexBuilder(spark, store, EXACT_CFG).build(docs)
    want = dedup_decisions(_unique_url_docs(rows), EXACT_CFG)
    assert _ledger(store) == want
    assert all(r == "exact" for _, r in want.values())
    assert len(want) >= 4  # 3 mirrors + the chained exact copy


def _rows_of(store, table, cols):
    return sorted(tuple(r[c] for c in cols)
                  for r in store.read(table).select(*cols).collect())


POSTING_COLS = ["term", "partition_id", "block_id", "n_postings",
                "first_doc_id", "last_doc_id", "doc_ids_vb", "tfs_vb",
                "dls_vb", "block_max_tf_norm", "cf_block", "term_bucket"]


def test_dedup_build_equals_prefiltered_build(near_built, spark,
                                              tmp_path_factory):
    rows, store, _b, _r = near_built
    dropped_ids = set(_ledger(store))
    survivors = [r for r in rows
                 if doc_id_for_url(r["url"]) not in dropped_ids]
    assert len(survivors) < len(rows)
    ref = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_ref")))
    docs = spark.createDataFrame(
        survivors, "url string, warc_ts timestamp, html binary, "
                   "text string, lang string")
    IndexBuilder(spark, ref, PLAIN_CFG).build(docs)
    assert _rows_of(store, "postings", POSTING_COLS) == \
        _rows_of(ref, "postings", POSTING_COLS)
    assert _rows_of(store, "doc_meta", ["doc_id", "url", "doc_len"]) == \
        _rows_of(ref, "doc_meta", ["doc_id", "url", "doc_len"])
    assert _rows_of(store, "term_stats", ["term", "df", "cf"]) == \
        _rows_of(ref, "term_stats", ["term", "df", "cf"])


def test_rank_identity_vs_oracle(near_built, spark):
    rows, store, _b, _r = near_built
    oracle = OracleIndex.build(rows, NEAR_CFG)
    qe = QueryEngine(spark, store, NEAR_CFG)
    import math
    for q in ["title w0101", _words(7, 3), "w0202 w0303 w1010"]:
        want = oracle.top_k(q, k=5)
        got = qe.top_k(q, k=5)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_ed, es) in zip(got, want):
            assert math.isclose(gs, es, abs_tol=1e-9), (q, gd)


def test_retune_reruns_only_dedup_stages(near_built, spark):
    rows, store, builder, _r = near_built
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    import dataclasses
    retuned = dataclasses.replace(NEAR_CFG, dedup_threshold=0.5)
    rn = IndexBuilder(spark, store, retuned).build(docs)
    by_stage = {m["stage"]: m["skipped"] for m in rn.metrics}
    assert by_stage["doc_features_raw"] is True      # extract NOT re-run
    assert by_stage["dedup_drops"] is False
    assert by_stage["doc_features"] is False
    # rebuild the module fixture state for later tests
    IndexBuilder(spark, store, NEAR_CFG).build(docs)


def test_ingest_dedups_against_existing_corpus(spark, tmp_path_factory,
                                               near_built):
    rows = planted_rows()
    first, batch = rows[:38], rows[38:]
    # the batch adds one more exact copy of doc 5 and a near-dup of doc 6
    batch = batch + [
        dict(rows[5], url="https://latemirror.example/copy5"),
        _row(6, "https://latenear.example/v6", f"title {_words(6, 3)}",
             _words(6, 30) + " lateextra", _words(56, 25)),
    ]
    schema = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    inc = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_inc")))
    b = IndexBuilder(spark, inc, NEAR_CFG)
    b.build(spark.createDataFrame(first, schema))
    b.ingest_updates(spark.createDataFrame(batch, schema))
    full = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_full")))
    IndexBuilder(spark, full, NEAR_CFG).build(
        spark.createDataFrame(first + batch, schema))
    assert _rows_of(inc, "postings", POSTING_COLS) == \
        _rows_of(full, "postings", POSTING_COLS)
    assert _rows_of(inc, "dedup_drops",
                    ["doc_id", "keep_doc_id", "reason"]) == \
        _rows_of(full, "dedup_drops", ["doc_id", "keep_doc_id", "reason"])
    # the late exact copy deduped against the EXISTING doc 5 (whichever
    # of the pair has the larger doc_id is the exact-drop), and the late
    # near-dup clustered with the existing doc 6
    led = _ledger(inc)
    m5 = {doc_id_for_url("https://latemirror.example/copy5"),
          doc_id_for_url("https://site5.example/page")}
    assert led[max(m5)] == (min(m5), "exact")
    n6 = {doc_id_for_url("https://latenear.example/v6"),
          doc_id_for_url("https://site6.example/page")}
    assert led[max(n6)] == (min(n6), "near")


def test_delete_survivor_resurrects_loser(spark, tmp_path_factory):
    rows = planted_rows()
    schema = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_del")))
    b = IndexBuilder(spark, store, NEAR_CFG)
    b.build(spark.createDataFrame(rows, schema))
    led = _ledger(store)
    # doc 3's exact-mirror cluster: survivor = min doc_id of the group
    mirror_ids = {doc_id_for_url(f"https://mirror{m}.example/copy3")
                  for m in range(3)} | {
                      doc_id_for_url("https://site3.example/page")}
    survivor = min(mirror_ids)
    losers = mirror_ids - {survivor}
    assert all(led[lo][0] == survivor for lo in losers)
    url_of = {doc_id_for_url(r["url"]): r["url"] for r in rows}
    b.delete_docs([url_of[survivor]])
    new_led = _ledger(store)
    new_survivor = min(losers)
    assert new_survivor not in new_led
    assert all(new_led[lo][0] == new_survivor
               for lo in losers - {new_survivor})
    # ≡ a full rebuild over the surviving source rows
    ref = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_dref")))
    IndexBuilder(spark, ref, NEAR_CFG).build(spark.createDataFrame(
        [r for r in rows if r["url"] != url_of[survivor]], schema))
    assert _rows_of(store, "postings", POSTING_COLS) == \
        _rows_of(ref, "postings", POSTING_COLS)
