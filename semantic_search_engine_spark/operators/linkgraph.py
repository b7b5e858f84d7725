"""Web link-graph operators: href/anchor extraction from raw HTML and a
DataFrame-native PageRank — the query-independent static-rank signal
(Brin & Page '98) that ``QueryEngine.boosted_top_k`` (X56) blends into
BM25, and the anchor-text aggregate every web index folds into a
weighted field (BM25F, X36).

The reference scores query relevance only (`ProductRepository.java`
ts_rank); a web-scale index needs the graph signal too — CommonCrawl
pipelines use exactly this (harmonic/PageRank centrality) to select
pretraining documents.

Scale notes (docs/SCALE.md "Link graph"):

- ``extract_links`` is one Arrow-batched ``mapInPandas`` pass over
  (url, html) — the same shape as the extract UDF, no shuffle; at
  10^12 pages it is embarrassingly parallel and bounded by HTML decode
  bandwidth.
- ``pagerank`` shuffles edges ONCE (hash by src, cached); each
  iteration reshuffles only the rank vector (|V| rows, two exchanges:
  join-on-src + groupBy-dst). The dst aggregation is a plain algebraic
  sum, so partial (map-side) aggregation absorbs in-degree hubs; the
  per-iteration dangling mass is one scalar. Rank lineage is truncated
  every iteration (``localCheckpoint``) so the plan stays O(1) deep.
  At true web scale the string keys would be dictionary-encoded to
  int64 first (one extra join each side); kept as urls here for
  test-scale clarity.
- ``anchor_text_agg`` bounds hub skew explicitly: distinct
  (dst, anchor) pairs, then a per-dst ``row_number`` cap BEFORE the
  concat, so no group materializes more than ``max_anchors`` strings.
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterator
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

LINKS_SCHEMA = StructType([
    StructField("src_url", StringType(), False),
    StructField("dst_url", StringType(), False),
    StructField("anchor", StringType(), True),
    StructField("nofollow", BooleanType(), False),
])

# one <a ...>...</a> element: href value in any quoting form, inner HTML
# up to the first closing tag (anchors don't nest in valid HTML)
_A_RE = re.compile(
    r"<a\s([^>]*?)>(.*?)</a\s*>",
    re.IGNORECASE | re.DOTALL)
_HREF_RE = re.compile(
    r"""href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)
_REL_RE = re.compile(
    r"""rel\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:", "about:")


def _clean_anchor(inner: str, max_len: int = 256) -> str:
    text = _WS_RE.sub(" ", _html.unescape(_TAG_RE.sub(" ", inner))).strip()
    return text[:max_len]


def _attr_value(m: "re.Match | None") -> str | None:
    if m is None:
        return None
    return next(g for g in m.groups()[1:] if g is not None)


def _page_links(src_url: str, html_bytes: bytes | None):
    """(dst_url, anchor, nofollow) triples for one page, document order."""
    if not html_bytes:
        return
    try:
        low = html_bytes.decode("utf-8", errors="replace")
    except Exception:  # pragma: no cover - decode("...","replace") is total
        return
    for m in _A_RE.finditer(low):
        attrs, inner = m.group(1), m.group(2)
        href = _attr_value(_HREF_RE.search(attrs))
        if not href:
            continue
        href = _html.unescape(href).strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        try:
            absu = urljoin(src_url, href)
            parts = urlsplit(absu)
        except ValueError:
            continue
        if parts.scheme not in ("http", "https") or not parts.netloc:
            continue
        dst = urlunsplit((parts.scheme, parts.netloc, parts.path,
                          parts.query, ""))  # drop the fragment
        rel = _attr_value(_REL_RE.search(attrs)) or ""
        nofollow = "nofollow" in rel.lower()
        yield dst, _clean_anchor(inner), nofollow


def extract_links(docs: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(src_url, dst_url, anchor, nofollow) edge list from raw HTML.

    One Arrow-batched ``mapInPandas`` pass (the extract-UDF shape — the
    only sanctioned per-row Python). Relative hrefs resolve against the
    page url; fragments are dropped; javascript:/mailto:/data:/tel:
    and non-http(s) results are skipped; ``rel="nofollow"`` is kept as
    a flag (PageRank callers filter it — this function reports the
    page faithfully). Duplicate links on a page are preserved here and
    collapsed in :func:`pagerank`.
    """
    src = docs.select(F.col(url_col).alias("url"),
                      F.col(html_col).alias("html"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list[str] = []
            dsts: list[str] = []
            anchors: list[str] = []
            nofo: list[bool] = []
            for u, h in zip(pdf["url"], pdf["html"]):
                if u is None:
                    continue
                for dst, anchor, nf in _page_links(u, h):
                    srcs.append(u)
                    dsts.append(dst)
                    anchors.append(anchor)
                    nofo.append(nf)
            yield pd.DataFrame({
                "src_url": pd.Series(srcs, dtype="object"),
                "dst_url": pd.Series(dsts, dtype="object"),
                "anchor": pd.Series(anchors, dtype="object"),
                "nofollow": pd.Series(nofo, dtype="bool"),
            })

    return src.mapInPandas(run, schema=LINKS_SCHEMA)


def pagerank(edges: DataFrame, damping: float = 0.85, n_iter: int = 10,
             src_col: str = "src_url", dst_col: str = "dst_url",
             follow_only: bool = True) -> DataFrame:
    """PageRank over an edge list → (url, rank), Σrank = 1.

    Fixed-iteration power method with the standard uniform teleport and
    dangling-mass redistribution: nodes with no out-edges donate their
    whole rank to the uniform vector each step (Page et al. '99 §2.5).
    Parallel edges collapse to one (unweighted graph) and self-loops
    are dropped. ``follow_only`` honors ``rel=nofollow`` when the edge
    list carries the :func:`extract_links` flag.

    Plan: edges shuffle once (pre-joined with out-degree, cached); per
    iteration only the |V|-row rank vector moves — one join-on-src
    exchange, one groupBy-dst sum (partial aggregation absorbs hub
    in-degree skew), one scalar collect for dangling mass. Lineage is
    truncated each step with ``localCheckpoint`` so the logical plan
    stays flat across iterations.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if follow_only and "nofollow" in edges.columns:
        edges = edges.filter(~F.col("nofollow"))
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .filter(F.col("src") != F.col("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("url"))
             .union(e.select(F.col("dst").alias("url")))
             .distinct())
    nodes = nodes.repartition("url").persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(1.0))

    out_deg = e.groupBy("src").count()
    # edges weighted by 1/out_degree — the one big shuffle, done once
    ew = (e.join(out_deg, "src")
          .select("src", "dst",
                  (F.lit(1.0) / F.col("count")).alias("inv_deg"))
          .repartition("src").persist())
    ew.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    has_out = out_deg.select(F.col("src").alias("url"))
    for _ in range(n_iter):
        dangling = (ranks.join(has_out, "url", "left_anti")
                    .agg(F.sum("rank")).collect()[0][0]) or 0.0
        contrib = (ew.join(ranks.withColumnRenamed("url", "src"), "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") * F.col("inv_deg"))
                        .alias("in_rank")))
        base = (1.0 - damping) / n + damping * dangling / n
        new = (nodes.join(contrib.withColumnRenamed("dst", "url"),
                          "url", "left")
               .select("url",
                       (F.lit(base) + F.lit(damping)
                        * F.coalesce(F.col("in_rank"), F.lit(0.0)))
                       .alias("rank")))
        prev, ranks = ranks, new.localCheckpoint()
        prev.unpersist()
    nodes.unpersist()
    ew.unpersist()
    return ranks


def anchor_text_agg(links: DataFrame, max_anchors: int = 32,
                    follow_only: bool = False) -> DataFrame:
    """(url, anchor_text): the distinct anchor strings pointing AT each
    url, capped and concatenated — the classic BM25F "anchors" field
    (anchor text describes the target better than the target does).

    Skew-bounded: distinct (dst, anchor) pairs first, then a per-dst
    ``row_number`` cap BEFORE any concat, so a hub with 10^9 in-links
    contributes at most ``max_anchors`` strings to its group. Order is
    deterministic (lexicographic).
    """
    from pyspark.sql import Window

    if follow_only and "nofollow" in links.columns:
        links = links.filter(~F.col("nofollow"))
    pairs = (links.select(F.col("dst_url").alias("url"),
                          F.col("anchor"))
             .filter(F.col("anchor").isNotNull() & (F.col("anchor") != ""))
             .distinct())
    w = Window.partitionBy("url").orderBy("anchor")
    capped = (pairs.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= max_anchors))
    return (capped.groupBy("url")
            .agg(F.concat_ws(" ", F.sort_array(F.collect_list("anchor")))
                 .alias("anchor_text")))
