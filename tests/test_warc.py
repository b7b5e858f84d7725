"""WARC source (X81): spec-shaped synthetic WARC files (plain, whole-
file gzip, multi-member gzip — the Common Crawl form), record-type
skipping, truncated-tail tolerance, and end-to-end WARC → index →
query."""
from __future__ import annotations

import gzip

import pytest

from semantic_search_engine_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
)


def _record(wtype: str, url: str | None, date: str, body: bytes,
            http: bool = True) -> bytes:
    if http:
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   b"\r\n" + body)
    else:
        payload = body
    headers = ["WARC/1.0", f"WARC-Type: {wtype}",
               f"WARC-Date: {date}",
               f"WARC-Record-ID: <urn:uuid:{wtype}-{date}>"]
    if url:
        headers.append(f"WARC-Target-URI: {url}")
    headers.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(headers) + "\r\n\r\n").encode() + payload + \
        b"\r\n\r\n"


BODY1 = b"<html><title>t1</title><body>alpha beta</body></html>"
BODY2 = b"<html><title>t2</title><body>gamma delta</body></html>"


def _warc() -> bytes:
    return (
        _record("warcinfo", None, "2024-01-01T00:00:00Z",
                b"software: test", http=False)
        + _record("request", "http://a.example/x", "2024-01-01T00:00:01Z",
                  b"GET /x HTTP/1.1")
        + _record("response", "http://a.example/x",
                  "2024-01-01T00:00:01Z", BODY1)
        + _record("response", "http://b.example/y",
                  "2024-01-02T10:30:00Z", BODY2)
    )


def test_parse_plain():
    recs, skipped = parse_warc_bytes(_warc())
    assert skipped == 2  # warcinfo + request
    assert [r["url"] for r in recs] == ["http://a.example/x",
                                        "http://b.example/y"]
    assert recs[0]["html"] == BODY1
    assert recs[1]["html"] == BODY2
    assert recs[1]["warc_ts"].hour == 10 and recs[1]["warc_ts"].minute == 30


def test_parse_gzip_whole_and_multimember():
    whole = gzip.compress(_warc())
    assert parse_warc_bytes(whole)[0] == parse_warc_bytes(_warc())[0]
    # Common Crawl form: each record its own gzip member, concatenated
    multi = b"".join(gzip.compress(_record(
        "response", f"http://m.example/{i}", "2024-03-01T00:00:00Z",
        BODY1)) for i in range(3))
    recs, _ = parse_warc_bytes(multi)
    assert [r["url"] for r in recs] == [f"http://m.example/{i}"
                                        for i in range(3)]


def test_truncated_tail_keeps_parsed_prefix():
    data = _warc()
    truncated = data[:-30]  # cuts into the final record's payload
    recs, _ = parse_warc_bytes(truncated)
    assert [r["url"] for r in recs] == ["http://a.example/x"]


def test_read_warc_and_index_end_to_end(spark, tmp_path):
    p1 = tmp_path / "crawl-0.warc"
    p1.write_bytes(_warc())
    p2 = tmp_path / "crawl-1.warc.gz"
    p2.write_bytes(gzip.compress(_record(
        "response", "http://c.example/z", "2024-02-01T00:00:00Z",
        b"<html><body>epsilon zeta eta</body></html>")))

    df = read_warc(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"http://a.example/x", "http://b.example/y",
                         "http://c.example/z"}
    assert bytes(rows["http://a.example/x"]["html"]) == BODY1
    assert rows["http://a.example/x"]["text"] is None

    stats = {r["warc_path"]: (r["n_records"], r["n_skipped"])
             for r in read_warc(spark, str(tmp_path),
                                with_stats=True).collect()}
    assert sum(n for n, _ in stats.values()) == 3
    assert sum(s for _, s in stats.values()) == 2

    # the reader's output is the build's input schema
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore
    cfg = EngineConfig(n_doc_buckets=2, n_term_buckets=2,
                       shuffle_partitions=2, block_size=8)
    store = HadoopTableStore(spark, str(tmp_path / "wh"))
    IndexBuilder(spark, store, cfg).build(df.drop("warc_path"))
    eng = QueryEngine(spark, store, cfg)
    hits = eng.top_k("gamma delta", k=5)
    meta = {r["doc_id"]: r["url"]
            for r in store.read("doc_meta").collect()}
    assert meta[hits[0][0]] == "http://b.example/y"
