"""URL canonicalization — the crawl-frontier normalization every web
pipeline runs before dedup and doc-id assignment (the RFC 3986 §6
"normalization and comparison" ladder plus the tracking-param strip
every production crawler adds; Common Crawl's URL index applies the
same class of rules). The reference stores raw URLs; at 10^12 docs the
SAME page reached via `HTTP://WWW.Example.com:80/a/../b?utm_source=x`
and `http://www.example.com/b` must collapse to one doc id (E4) or the
exact-dedup pass (X60) misses it.

All pure Catalyst expressions on one scan — no UDF, no shuffle:

- scheme + host lowercased; default ports stripped (:80 http, :443
  https); trailing dots of the host removed
- dot-segments resolved (``/a/./b/../c`` -> ``/a/c``, RFC 3986 §5.2.4)
  via a bounded expression ladder (paths deeper than the ladder keep
  their residue — documented, counted by ``n_unresolved`` in tests)
- duplicate slashes collapsed; empty path -> ``/``
- query: tracking params dropped (utm_*, gclid, fbclid, ...), the rest
  SORTED by key (order-insensitive compare), ``?`` dropped when empty
- fragment always dropped (never sent to the server)

``canonicalize_urls(df, url_col)`` adds ``url_canon``;
``canonical_dup_groups`` groups rows whose canonical forms collide —
feed to the X60 dedup/MERGE stage.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_url_expr", "canonicalize_urls",
           "canonical_dup_groups", "TRACKING_PARAMS"]

#: the de-facto standard strip list (Google Analytics, Google/Facebook/
#: Microsoft click ids, Mailchimp) — extend per deployment
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign",
                   "utm_term", "utm_content", "gclid", "fbclid",
                   "msclkid", "mc_cid", "mc_eid")

#: dot-segment ladder depth: /../ patterns deeper than this keep their
#: residue (web paths are shallow; 8 covers practically everything)
_DOT_DEPTH = 8


def _norm_path(path: Column) -> Column:
    # collapse //+, resolve /./ then /<seg>/../ a bounded number of
    # times (each rung removes ONE segment pair; regexp_replace has no
    # fixpoint mode, so the ladder is explicit and bounded)
    p = F.regexp_replace(path, "/{2,}", "/")
    p = F.regexp_replace(p, "(/\\.)+(/|$)", "/")
    for _ in range(_DOT_DEPTH):
        p = F.regexp_replace(p, "/(?!\\.\\./)[^/]+/\\.\\.(/|$)", "/")
    # a leading /../ that cannot go higher resolves to /
    for _ in range(_DOT_DEPTH):
        p = F.regexp_replace(p, "^/\\.\\.(/|$)", "/")
    return F.when(p == "", F.lit("/")).otherwise(p)


def canonical_url_expr(url_col: str = "url") -> Column:
    """The canonical form as one Catalyst expression tree; see module
    docstring. NULL and unparseable (no host) urls yield NULL."""
    u = F.col(url_col)
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.regexp_replace(
        F.try_parse_url(u, F.lit("HOST")), "\\.+$", ""))
    port = F.try_parse_url(u, F.lit("AUTHORITY"))
    # parse_url has no PORT key portable across dialects: recover it
    # from the authority suffix
    port = F.regexp_extract(port, ":(\\d+)$", 1)
    default = ((scheme == "http") & (port == "80")) | \
              ((scheme == "https") & (port == "443"))
    portpart = F.when((port == "") | default, F.lit("")) \
        .otherwise(F.concat(F.lit(":"), port))
    path = _norm_path(F.coalesce(F.try_parse_url(u, F.lit("PATH")),
                                 F.lit("/")))
    # query: split, drop tracking keys + empties, sort by (key, value)
    rawq = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    parts = F.filter(
        F.split(rawq, "&"),
        lambda kv: (kv != "") & ~F.lower(
            F.regexp_extract(kv, "^([^=]*)", 1)).isin(
            list(TRACKING_PARAMS)))
    q = F.array_join(F.array_sort(parts), "&")
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    out = F.concat(scheme, F.lit("://"), host, portpart, path, qpart)
    return F.when(u.isNull() | host.isNull() | (host == "")
                  | scheme.isNull(), F.lit(None)).otherwise(out)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "url_canon") -> DataFrame:
    return df.withColumn(out_col, canonical_url_expr(url_col))


def canonical_dup_groups(df: DataFrame, url_col: str = "url",
                         min_size: int = 2) -> DataFrame:
    """(url_canon, n, urls) for canonical forms reached by >= min_size
    distinct raw urls — the candidate list the X60 dedup MERGE consumes.
    One hash aggregation on the canonical string."""
    c = canonicalize_urls(df, url_col)
    return (c.filter(F.col("url_canon").isNotNull())
            .groupBy("url_canon")
            .agg(F.countDistinct(url_col).alias("n"),
                 F.sort_array(F.collect_set(url_col)).alias("urls"))
            .filter(F.col("n") >= min_size))
