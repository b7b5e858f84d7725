"""Redirect / rel=canonical resolution — collapsing a crawl's redirect
graph to one canonical URL per chain.

A web crawl records directed claims "src is really dst" (HTTP 301/302/
308 targets, ``<link rel=canonical>``, HTML meta refresh). Indexing and
dedup want the TERMINAL url of each chain: a→b→c means a and b should
credit c. Each source declares (at most, after :func:`functionalize`)
one target, so the claims form a functional graph: every weakly-
connected structure is a tree of tails hanging off either a single
sink (a url with no outgoing claim — the normal case) or a cycle
(broken/spam redirect loops).

Resolution is pointer doubling: round k maps every url to its
2^k-th successor, so a chain of length L resolves in ⌈log2 L⌉ rounds —
O(log L) shuffles, never a per-hop walk. Browsers cap redirect chains
at ~20 hops; the default ``max_doublings=8`` covers 256-hop tails.
Urls whose pointer still lands on a url WITH an outgoing claim after
the cap sit on (or drain into) a cycle: they get a deterministic
component representative (the component-min url via the dedup stage's
min-label clustering, `operators/dedup.py:cluster_pairs`) and
``resolved=false`` — operationally these are broken structures a
pipeline quarantines, and the flag says exactly that; the
representative only needs to be stable so grouping is consistent.

Plan shape / scale: the claims table is the redirect fraction of the
crawl (~10% of fetches), three slim columns. Each doubling round is one
self-join keyed on the pointer (hash shuffle of the claims-sized frame)
with truncated lineage; the cycle residue is tiny in practice and pays
the clustering rounds only on itself. :func:`apply_canonical` is one
key join against the corpus — broadcast when the mapping is small,
sort-merge on the url-bucketed layout otherwise. No Python rows
anywhere.

Reference parity note: the reference service has no crawler, so this is
web-pipeline extension surface (like `operators/recrawl.py`), not
SURVEY §2 parity.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cluster_pairs

__all__ = ["functionalize", "resolve_canonical", "apply_canonical"]


def functionalize(edges: DataFrame, src_col: str = "src_url",
                  dst_col: str = "dst_url") -> DataFrame:
    """One outgoing claim per url: self-claims dropped (a self-redirect
    IS a sink declaration), conflicting targets resolved to the
    lexicographic min so the graph is functional and deterministic.
    Returns (url, next)."""
    src, dst = F.col(src_col), F.col(dst_col)
    return (edges.filter(src != dst)
            .groupBy(src.alias("url"))
            .agg(F.min(dst).alias("next")))


def resolve_canonical(edges: DataFrame, src_col: str = "src_url",
                      dst_col: str = "dst_url", max_doublings: int = 8,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """(url, canonical_url, resolved) for every url in the claims graph.

    ``resolved=true``: canonical_url is the chain's terminal sink.
    ``resolved=false``: the url sits on / drains into a redirect cycle
    (or a tail longer than 2^``max_doublings`` hops); canonical_url is
    the deterministic component representative described in the module
    docstring. Sinks themselves resolve to self.
    """
    f = functionalize(edges, src_col, dst_col).localCheckpoint(eager=True)
    domain = f.select("url")  # urls with an outgoing claim

    # pointer doubling: p(u) starts as f(u) = f^(2^0); composing p with
    # ITSELF each round squares the hop count (p ← p∘p = f^(2^k)), so a
    # chain of length L saturates in ⌈log2 L⌉ rounds. A pointer that
    # leaves the domain is final and carries through unchanged.
    p = f.select("url", F.col("next").alias("ptr"))
    for _ in range(max(0, int(max_doublings))):
        hop = p.select(F.col("url").alias("ptr"),
                       F.col("ptr").alias("_next2"))
        stepped = (p.join(hop, "ptr", "left")
                   .select("url",
                           F.coalesce("_next2", "ptr").alias("ptr"),
                           F.col("ptr").alias("_prev"))
                   .localCheckpoint(eager=True))
        done = stepped.filter(F.col("ptr") != F.col("_prev")).isEmpty()
        p = stepped.drop("_prev")
        if done:
            break

    # resolved: pointer landed on a url with no outgoing claim (a sink)
    dom = domain.withColumnRenamed("url", "ptr").withColumn(
        "_in_dom", F.lit(True))
    flagged = (p.join(dom, "ptr", "left")
               .withColumn("resolved", F.col("_in_dom").isNull())
               .drop("_in_dom"))
    ok = flagged.filter("resolved").select(
        "url", F.col("ptr").alias("canonical_url"),
        F.lit(True).alias("resolved"))

    # cycle residue: cluster the ORIGINAL claims restricted to
    # unresolved sources (consecutive hops keep the structure connected
    # — the 2^k pointers alone can split a cycle into gcd(2^k, L)
    # orbits) and label each component with its min url.
    residue_urls = flagged.filter(~F.col("resolved")).select("url")
    residue_pairs = (f.join(residue_urls, "url")
                     .select(F.col("url").alias("key_a"),
                             F.col("next").alias("key_b")))
    bad = (cluster_pairs(residue_pairs, checkpoint_dir=checkpoint_dir)
           .join(residue_urls, F.col("key") == F.col("url"))
           .select("url", F.col("cluster").alias("canonical_url"),
                   F.lit(False).alias("resolved")))

    # pure sinks (urls only ever claimed INTO) are their own canonical
    sinks = (edges.select(F.col(dst_col).alias("url")).distinct()
             .join(domain, "url", "left_anti")
             .select("url", F.col("url").alias("canonical_url"),
                     F.lit(True).alias("resolved")))
    return ok.unionByName(bad).unionByName(sinks)


def apply_canonical(docs: DataFrame, resolved: DataFrame,
                    url_col: str = "url",
                    broadcast_mapping: bool = False) -> DataFrame:
    """Adds ``canonical_url`` to a corpus frame: the resolved target
    for urls in the mapping, the url itself otherwise (most urls never
    redirect). One key join; broadcast it when the mapping fits."""
    m = resolved.select(F.col("url").alias(url_col),
                        F.col("canonical_url").alias("_canon"))
    if broadcast_mapping:
        m = F.broadcast(m)
    return (docs.join(m, url_col, "left")
            .withColumn("canonical_url",
                        F.coalesce("_canon", F.col(url_col)))
            .drop("_canon"))
