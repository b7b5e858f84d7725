"""End-to-end crawl-cycle composition: WARC drop → robots policy →
canonical resolution → index build + query → two-round change-rate →
sitemap lastmod → next-cycle schedule → WET export. Each operator is
pinned in its own suite; this test pins that the surfaces COMPOSE —
column contracts line up with no adapter glue."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.canonical import (
    apply_canonical, resolve_canonical)
from semantic_search_engine_spark.operators.recrawl import (
    change_rate, recrawl_schedule)
from semantic_search_engine_spark.operators.robots import robots_filter
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.sitemap import (
    sitemap_entries, stale_by_lastmod)
from semantic_search_engine_spark.sources.store import HadoopTableStore
from semantic_search_engine_spark.sources.warc import read_warc, write_wet

from test_warc import _record  # spec-shaped synthetic WARC records


def _page(word: str) -> bytes:
    return (f"<html><title>{word}</title><body>crawl cycle {word} "
            f"content</body></html>").encode()


def _round(ts: str, changed: bool) -> bytes:
    suffix = b"-v2" if changed else b""
    return (
        _record("response", "https://good.example/keep", ts,
                _page("zebra"))
        + _record("response", "https://good.example/hot", ts,
                  _page("quokka") + suffix)
        + _record("response", "https://good.example/private/x", ts,
                  _page("hidden"))
        + _record("response", "https://good.example/old-url", ts,
                  _page("moved"))
    )


def test_full_crawl_cycle(spark, tmp_path):
    (tmp_path / "drop").mkdir()
    (tmp_path / "drop" / "r1.warc").write_bytes(
        _round("2024-01-01T00:00:00Z", changed=False))
    (tmp_path / "drop" / "r2.warc").write_bytes(
        _round("2024-01-03T00:00:00Z", changed=True))

    fetches = read_warc(spark, str(tmp_path / "drop"))
    assert fetches.count() == 8  # 4 urls x 2 rounds

    # 1. policy: robots disallows /private for everyone
    robots = spark.createDataFrame(
        [("good.example", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string")
    compliant = robots_filter(fetches, robots, broadcast_robots=True)
    assert compliant.filter(
        F.col("url").contains("/private/")).isEmpty()

    # 2. canonical: /old-url 301s to /keep -> its fetches credit /keep
    claims = spark.createDataFrame(
        [("https://good.example/old-url", "https://good.example/keep")],
        "src_url string, dst_url string")
    canon = apply_canonical(compliant, resolve_canonical(claims),
                            broadcast_mapping=True)
    moved = canon.filter(F.col("url") == "https://good.example/old-url")
    assert {r.canonical_url for r in moved.collect()} == {
        "https://good.example/keep"}

    # 3. index the latest compliant round under canonical urls
    latest = (canon.filter(F.col("warc_ts") == dt.datetime(2024, 1, 3))
              .filter(F.col("url") == F.col("canonical_url"))
              .select("url", "warc_ts", "html", "text", "lang"))
    cfg = EngineConfig(n_doc_buckets=2, n_term_buckets=2,
                       shuffle_partitions=2, block_size=8)
    store = HadoopTableStore(spark, str(tmp_path / "wh"))
    IndexBuilder(spark, store, cfg).build(latest)
    eng = QueryEngine(spark, store, cfg)
    hits = eng.search("quokka", k=3)
    assert [h["url"] for h in hits["results"]] == [
        "https://good.example/hot"]

    # 4. change-rate over both rounds: only /hot changed
    log = compliant.withColumn(
        "extracted_sha256", F.sha2(F.col("html"), 256))
    rates = change_rate(log)
    sched = recrawl_schedule(
        rates, budget=10, as_of=dt.datetime(2024, 1, 10),
        per_host_cap=5).collect()
    assert sched[0].url == "https://good.example/hot"
    assert sched[0].p_stale > 0
    assert all(r.p_stale == 0.0 for r in sched[1:])  # unchanged urls

    # 5. sitemap says /keep changed after our last fetch -> known-stale
    sm = b"""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://good.example/keep</loc>
           <lastmod>2024-01-05</lastmod></url></urlset>"""
    entries = sitemap_entries(spark.createDataFrame(
        [("https://good.example/sitemap.xml", sm)],
        "sitemap_url string, body binary"))
    known = stale_by_lastmod(rates, entries).collect()
    assert [r.url for r in known] == ["https://good.example/keep"]

    # 6. export the indexed round's extracted text as WET
    feats = store.read("doc_features").select("url", "warc_ts", "text")
    audit = write_wet(feats.coalesce(1), str(tmp_path / "wet"))
    assert sum(n for _, n in audit) == latest.count()
    back = read_warc(spark, str(tmp_path / "wet"),
                     record_types=("conversion",))
    assert {r.url for r in back.collect()} == {
        r.url for r in latest.select("url").collect()}


def test_discovery_and_trap_stages_compose(spark, tmp_path):
    """Frontier discovery + trap detection over the same fetch shapes
    the cycle test uses: outlinks from crawled HTML propose new urls,
    trap hosts are excluded from the proposal."""
    from semantic_search_engine_spark.operators.linkgraph import (
        extract_links)
    from semantic_search_engine_spark.operators.recrawl import (
        discover_frontier, trap_hosts)

    html = (b'<html><body>'
            b'<a href="https://fresh.example/new1">one</a>'
            b'<a href="https://fresh.example/new2">two</a>'
            b'<a href="https://good.example/keep">known</a>'
            b'</body></html>')
    docs = spark.createDataFrame(
        [("https://good.example/keep", html)], "url string, html binary")
    links = extract_links(docs)
    fetched = docs.select("url")
    frontier = discover_frontier(links, fetched, budget=10)
    assert {r.url for r in frontier.collect()} == {
        "https://fresh.example/new1", "https://fresh.example/new2"}

    # a trap host's proposals are excluded by anti-joining the flags
    trap_fetches = spark.createDataFrame(
        [(f"https://trap.example/x?s={i}", f"c{i % 2}")
         for i in range(120)], "url string, extracted_sha256 string")
    flags = trap_hosts(trap_fetches, min_urls=100,
                       max_urls_per_content=5.0)
    trap_links = spark.createDataFrame(
        [("https://trap.example/x?s=1", "https://trap.example/x?s=999")],
        "src_url string, dst_url string")
    all_links = links.select("src_url", "dst_url").union(trap_links)
    host = F.lower(F.try_parse_url(F.col("url"), F.lit("HOST")))
    clean = (discover_frontier(all_links, fetched, budget=10)
             .withColumn("_h", host)
             .join(flags.select(F.col("host").alias("_h")), "_h",
                   "left_anti").drop("_h"))
    assert {r.url for r in clean.collect()} == {
        "https://fresh.example/new1", "https://fresh.example/new2"}
