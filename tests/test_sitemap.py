"""Sitemap ingestion: namespaced/plain parsing, index kind, gzip,
malformed bodies, the Spark entries frame, and the lastmod→recrawl
composition."""
from __future__ import annotations

import datetime as dt
import gzip

from semantic_search_engine_spark.operators.recrawl import change_rate
from semantic_search_engine_spark.sources.sitemap import (
    parse_sitemap, sitemap_entries, stale_by_lastmod)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url><loc>https://s.example/a</loc><lastmod>2024-05-01</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://s.example/b</loc>
       <lastmod>2024-05-02T10:30:00+02:00</lastmod></url>
  <url><loc>https://s.example/c</loc></url>
</urlset>"""

INDEX = f"""<?xml version="1.0"?>
<sitemapindex {NS}>
  <sitemap><loc>https://s.example/sitemap1.xml</loc>
           <lastmod>2024-04-01</lastmod></sitemap>
  <sitemap><loc>https://s.example/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_namespaced():
    entries, kind = parse_sitemap(URLSET)
    assert kind == "urlset" and len(entries) == 3
    a, b, c = entries
    assert a["url"] == "https://s.example/a"
    assert a["lastmod"] == dt.datetime(2024, 5, 1)
    assert a["changefreq"] == "daily" and a["priority"] == 0.8
    # tz offset normalized to naive UTC
    assert b["lastmod"] == dt.datetime(2024, 5, 2, 8, 30)
    assert c["lastmod"] is None and c["priority"] is None


def test_parse_without_namespace_and_index():
    plain = URLSET.replace(f" {NS}", "")
    assert parse_sitemap(plain)[1] == "urlset"
    entries, kind = parse_sitemap(INDEX)
    assert kind == "sitemapindex"
    assert [e["url"] for e in entries] == [
        "https://s.example/sitemap1.xml", "https://s.example/sitemap2.xml"]
    assert entries[0]["lastmod"] == dt.datetime(2024, 4, 1)


def test_parse_gzip_and_malformed():
    entries, kind = parse_sitemap(gzip.compress(URLSET.encode()))
    assert kind == "urlset" and len(entries) == 3
    assert parse_sitemap(b"<html>not a sitemap</html>")[1] == "invalid"
    assert parse_sitemap(b"\x1f\x8btruncated")[1] == "invalid"
    # a gzip stream cut off mid-body raises EOFError (not OSError) —
    # must stay inside the per-body skip contract, never fail the task
    cut = gzip.compress(URLSET.encode())[:-5]
    assert parse_sitemap(cut)[1] == "invalid"
    assert parse_sitemap(None)[1] == "invalid"
    assert parse_sitemap(b"<urlset><url></url></urlset>") == ([], "urlset")


def test_sitemap_entries_frame(spark):
    df = spark.createDataFrame(
        [("https://s.example/sitemap.xml", URLSET.encode()),
         ("https://s.example/sitemap_index.xml", INDEX.encode()),
         ("https://bad.example/sitemap.xml", b"junk")],
        "sitemap_url string, body binary")
    rows = sitemap_entries(df).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert len(by_kind["urlset"]) == 3
    assert len(by_kind["sitemapindex"]) == 2
    [inv] = by_kind["invalid"]
    assert inv.url is None and "bad.example" in inv.sitemap_url
    assert {r.url for r in by_kind["urlset"]} == {
        "https://s.example/a", "https://s.example/b", "https://s.example/c"}


def test_stale_by_lastmod_composes_with_recrawl(spark):
    t0 = dt.datetime(2024, 1, 1)
    fetches = [("https://s.example/a", t0 + dt.timedelta(days=j), f"v{j}")
               for j in range(3)]
    fetches += [("https://s.example/b", t0 + dt.timedelta(days=j), "same")
                for j in range(3)]
    rates = change_rate(spark.createDataFrame(
        fetches, "url string, warc_ts timestamp, extracted_sha256 string"))
    # sitemap says /a changed AFTER our last fetch (t0+2d); /b before
    sm = f"""<urlset {NS}>
      <url><loc>https://s.example/a</loc><lastmod>2024-01-20</lastmod></url>
      <url><loc>https://s.example/b</loc><lastmod>2024-01-01</lastmod></url>
    </urlset>"""
    entries = sitemap_entries(spark.createDataFrame(
        [("https://s.example/sitemap.xml", sm.encode())],
        "sitemap_url string, body binary"))
    stale = stale_by_lastmod(rates, entries).collect()
    assert [r.url for r in stale] == ["https://s.example/a"]
    assert stale[0].lastmod == dt.datetime(2024, 1, 20)
