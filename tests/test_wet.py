"""WET writer: record round-trip through the WARC parser, end-to-end
write→read over Spark, byte determinism, warcinfo header handling."""
from __future__ import annotations

import datetime as dt
import gzip

from semantic_search_engine_spark.sources.warc import (
    parse_warc_bytes, read_warc, wet_record_bytes, write_wet)

TS = dt.datetime(2024, 5, 1, 12, 0, 0)


def test_wet_record_roundtrips_through_parser():
    raw = wet_record_bytes("https://x.example/a", TS, "hello wét ✓")
    recs, skipped = parse_warc_bytes(raw, record_types=("conversion",))
    assert skipped == 0 and len(recs) == 1
    r = recs[0]
    assert r["url"] == "https://x.example/a"
    assert r["warc_ts"] == TS
    assert r["html"].decode("utf-8") == "hello wét ✓"
    # default (response-only) parse skips conversion records
    recs2, skipped2 = parse_warc_bytes(raw)
    assert recs2 == [] and skipped2 == 1


def test_wet_record_bytes_deterministic():
    a = wet_record_bytes("https://x.example/a", TS, "t")
    b = wet_record_bytes("https://x.example/a", TS, "t")
    assert a == b
    assert a != wet_record_bytes("https://x.example/b", TS, "t")


def test_write_wet_read_warc_end_to_end(spark, tmp_path):
    docs = [(f"https://s.example/p{i}", TS + dt.timedelta(minutes=i),
             f"text body {i}") for i in range(25)]
    df = spark.createDataFrame(
        docs, "url string, warc_ts timestamp, text string").repartition(3)
    out = str(tmp_path / "wet")
    audit = write_wet(df, out)
    assert len(audit) == 3 and sum(n for _, n in audit) == 25
    back = read_warc(spark, out, record_types=("conversion",))
    got = {(r.url, r.warc_ts, r.text) for r in back.collect()}
    assert got == set(docs)
    assert all(r.html is None for r in back.collect())
    # the warcinfo header record is present and skipped on read
    stats = read_warc(spark, out, with_stats=True,
                      record_types=("conversion",)).collect()
    assert all(r.n_skipped == 1 for r in stats)


def test_write_wet_reexport_clears_stale_parts(spark, tmp_path):
    """Re-exporting into the same directory with FEWER partitions must
    not leave the previous run's extra part files mixed into the
    round-trip read."""
    docs = [(f"https://s.example/p{i}", TS, f"text {i}") for i in range(8)]
    df = spark.createDataFrame(
        docs, "url string, warc_ts timestamp, text string")
    out = str(tmp_path / "wet")
    write_wet(df.repartition(4), out)
    audit = write_wet(df.repartition(1), out)
    assert len(audit) == 1 and audit[0][1] == 8
    back = read_warc(spark, out, record_types=("conversion",)).collect()
    assert len(back) == 8  # stale part-00001..3 would double-count


def test_write_wet_deterministic_bytes(spark, tmp_path):
    docs = [("https://s.example/a", TS, "alpha"),
            ("https://s.example/b", TS, "beta")]
    df = spark.createDataFrame(
        docs, "url string, warc_ts timestamp, text string").coalesce(1)
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    (p1, n1), = write_wet(df, d1)
    (p2, n2), = write_wet(df, d2)
    assert n1 == n2 == 2
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    # identical except the warcinfo record, which embeds the filename
    # (same here) — so fully identical
    assert b1 == b2
    # gzip members decompress to the same records in the same order
    assert gzip.decompress(b1) == gzip.decompress(b2)


def test_write_wet_null_url_rows_dropped(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, TS, "x"), ("https://s.example/a", TS, "y")],
        "url string, warc_ts timestamp, text string").coalesce(1)
    audit = write_wet(df, str(tmp_path / "w"))
    assert audit[0][1] == 1
