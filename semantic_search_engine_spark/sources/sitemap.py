"""Sitemap ingestion — the sitemaps.org XML protocol (the public
sitemap 0.9 schema every crawler consumes) parsed into a URL frontier
frame, plus the lastmod signal joined back into recrawl scheduling.

A crawl collects ``sitemap.xml`` bodies alongside robots.txt (robots'
``Sitemap:`` lines point at them). Two document kinds exist:
``<urlset>`` (leaf: url entries with optional lastmod / changefreq /
priority) and ``<sitemapindex>`` (pointers to more sitemaps — an
iterative fetch frontier, not recursion inside one job). Parsing
tolerates the namespaced and namespace-less forms seen in the wild,
gzip bodies (``sitemap.xml.gz``), and malformed XML (the body is
skipped and counted, never fails the job).

Plan shape / scale: one Arrow-batched ``mapInPandas`` over the sitemap
bodies (≤ one body per host × sitemap count — metadata-sized next to
the crawl). The lastmod join against the recrawl rate table is one key
join on url. Like robots parsing, a data-dependent XML dialect has no
Catalyst expression; the per-BODY Python kernel is the honest cost,
and it runs over hosts, not documents.
"""
from __future__ import annotations

import datetime
import gzip
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_sitemap", "sitemap_entries", "stale_by_lastmod"]

_ENTRY_SCHEMA = ("sitemap_url string, kind string, url string, "
                 "lastmod timestamp, changefreq string, priority double")


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _parse_ts(text: str | None):
    """W3C datetime (the sitemap lastmod format): date-only or full
    timestamp, optional Z/offset. Returns naive UTC or None."""
    if not text:
        return None
    t = text.strip()
    try:
        ts = datetime.datetime.fromisoformat(t.replace("Z", "+00:00"))
    except ValueError:
        return None
    if ts.tzinfo is not None:
        ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return ts


def parse_sitemap(body: bytes | str | None
                  ) -> tuple[list[dict], str]:
    """Parse one sitemap body → (entries, kind); kind ∈ ``urlset`` /
    ``sitemapindex`` / ``invalid``. Entries carry url, lastmod,
    changefreq, priority (index entries: url + lastmod only). Pure
    function — unit-testable without Spark."""
    import xml.etree.ElementTree as ET

    if body is None:
        return [], "invalid"
    data = body.encode("utf-8") if isinstance(body, str) else bytes(body)
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):
            # BadGzipFile is an OSError; a TRUNCATED stream raises
            # EOFError and corrupt deflate data zlib.error — all three
            # must stay inside the per-body skip contract
            return [], "invalid"
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return [], "invalid"
    kind = _localname(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return [], "invalid"
    child_tag = "url" if kind == "urlset" else "sitemap"
    out = []
    for el in root:
        if _localname(el.tag) != child_tag:
            continue
        fields = {_localname(c.tag): (c.text or "").strip() for c in el}
        loc = fields.get("loc")
        if not loc:
            continue
        prio = None
        if kind == "urlset" and fields.get("priority"):
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None
        out.append({"url": loc,
                    "lastmod": _parse_ts(fields.get("lastmod")),
                    "changefreq": (fields.get("changefreq") or None)
                    if kind == "urlset" else None,
                    "priority": prio})
    return out, kind


def sitemap_entries(sitemaps: DataFrame, url_col: str = "sitemap_url",
                    body_col: str = "body") -> DataFrame:
    """Frontier frame from collected sitemap bodies: one row per
    ``<url>``/``<sitemap>`` entry, ``kind`` saying which (rows from a
    ``sitemapindex`` are further sitemaps to fetch; ``invalid`` bodies
    yield a single NULL-url marker row so the audit can count them)."""
    slim = sitemaps.select(F.col(url_col).alias("sitemap_url"),
                           F.col(body_col).alias("_body"))

    def _kernel(iterator):
        import pandas as pd
        for pdf in iterator:
            rows = []
            for su, body in zip(pdf["sitemap_url"], pdf["_body"]):
                entries, kind = parse_sitemap(body)
                if kind == "invalid":
                    rows.append({"sitemap_url": su, "kind": kind,
                                 "url": None, "lastmod": None,
                                 "changefreq": None, "priority": None})
                    continue
                for e in entries:
                    rows.append({"sitemap_url": su, "kind": kind, **e})
            yield pd.DataFrame(rows, columns=["sitemap_url", "kind",
                                              "url", "lastmod",
                                              "changefreq", "priority"])

    return slim.mapInPandas(_kernel, schema=_ENTRY_SCHEMA)


def stale_by_lastmod(rates: DataFrame, entries: DataFrame) -> DataFrame:
    """Urls the sitemap DECLARES changed since our last fetch: lastmod
    newer than the rate table's ``last_ts``. These are known-stale —
    they skip the probabilistic queue and go straight into the next
    cycle (the lastmod signal is authoritative where present; the
    Poisson estimate covers the urls sitemaps don't list). One key
    join on url."""
    lm = (entries.filter((F.col("kind") == "urlset")
                         & F.col("url").isNotNull()
                         & F.col("lastmod").isNotNull())
          .groupBy("url").agg(F.max("lastmod").alias("_lastmod")))
    return (rates.join(lm, "url")
            .filter(F.col("_lastmod") > F.col("last_ts"))
            .select("url", F.col("_lastmod").alias("lastmod"), "last_ts"))
