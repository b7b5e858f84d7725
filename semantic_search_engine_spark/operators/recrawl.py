"""Recrawl scheduling — per-URL change-rate estimation over crawl fetch
history, and cross-snapshot corpus deltas.

A production crawl of 10^12 pages cannot refetch everything each cycle;
it budgets fetches by how likely each page is to have changed. The
classic public model (Cho & Garcia-Molina, "Estimating Frequency of
Change", ACM TOIT 3(3), 2003) treats page change as a Poisson process
with rate λ and estimates λ from *sampled* observations — n revisits of
which X showed a changed page. The naive X/n underestimates (multiple
changes between visits collapse into one observation); the paper's
bias-corrected estimator is

    λ̂ = -log((n - X + 0.5) / (n + 0.5)) / Ī

changes per unit time, with Ī the average revisit interval. Staleness
probability after t time units without a fetch is 1 - exp(-λ̂ t); the
scheduler orders the fetch budget by it.

Input shape: the engine's own pre-dedup fetch log — `doc_features_raw`
keeps one row per (url, warc_ts) fetch with the `extracted_sha256`
content fingerprint computed inside the extract UDF (no text re-read
here; this module touches only the three slim columns). Any
(url, ts, sha) frame works, e.g. a WARC-derived fetch log
(`sources/warc.py`).

Plan shape / scale: `change_rate` is ONE hash exchange on url — the
`lag` window partitions by url and the follow-up groupBy reuses that
partitioning (Catalyst sees the child distribution satisfied; no second
shuffle). At 10^12 urls × ~10 fetches that is one shuffle of three slim
columns, partial-agg absorbed. `recrawl_schedule` is a top-k
(TakeOrdered, never a full sort materialization); `corpus_delta` is one
sort-merge full-outer join on url plus a small per-host aggregate.
Everything is pure codegen — no Python rows anywhere.

Reference parity note: the reference service has no crawler (it ingests
a product CSV — data-pipeline/pipeline.py), so this operator is part of
the web-scale pipeline extension surface, not §2 parity.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["change_rate", "staleness", "recrawl_schedule", "corpus_delta",
           "discover_frontier", "host_crawl_stats", "trap_hosts",
           "delta_by_host"]

_SEC_PER_DAY = 86400.0


def _host(col: Column) -> Column:
    """Lowercased host of a url column — the ONE definition the
    schedule / frontier / trap / churn paths all share, so a future
    host-normalization change (e.g. trailing-dot stripping) lands
    everywhere at once instead of silently diverging per path."""
    return F.lower(F.try_parse_url(col, F.lit("HOST")))


def _cap_per_host(df: DataFrame, order: list, cap: int,
                  url_col: str = "url") -> DataFrame:
    """Politeness cap: keep the best ``cap`` rows per host under
    ``order``. One extra hash exchange keyed on host; a host's
    candidate set is its url count, so no skew treatment beyond AQE."""
    w = Window.partitionBy(_host(F.col(url_col))).orderBy(*order)
    return (df.withColumn("_hrank", F.row_number().over(w))
            .filter(F.col("_hrank") <= int(cap))
            .drop("_hrank"))


def change_rate(fetches: DataFrame, url_col: str = "url",
                ts_col: str = "warc_ts",
                sha_col: str = "extracted_sha256") -> DataFrame:
    """Per-url Poisson change-rate estimate from a fetch log.

    Returns (url, n_fetches, n_changes, first_ts, last_ts,
    lambda_per_day). ``n_changes`` counts revisits whose fingerprint
    differs from the previous fetch (ties on ``ts_col`` are broken by
    ``sha_col`` so the lag is deterministic). ``lambda_per_day`` is the
    Cho–Garcia-Molina bias-corrected MLE; NULL when the url has fewer
    than two fetches or zero observation span (nothing to estimate
    from — callers supply a prior, see :func:`staleness`).
    """
    url, ts, sha = F.col(url_col), F.col(ts_col), F.col(sha_col)
    w = Window.partitionBy("url").orderBy("_ts", "_sha")
    lagged = fetches.select(
        url.alias("url"), ts.alias("_ts"), sha.alias("_sha")
    ).withColumn("_prev", F.lag("_sha").over(w))
    agg = lagged.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(((F.col("_prev").isNotNull())
               & (F.col("_prev") != F.col("_sha"))).cast("long"))
        .alias("n_changes"),
        F.min("_ts").alias("first_ts"),
        F.max("_ts").alias("last_ts"),
    )
    n_int = (F.col("n_fetches") - F.lit(1)).cast("double")
    span_days = (F.unix_timestamp("last_ts").cast("double")
                 - F.unix_timestamp("first_ts").cast("double")) / _SEC_PER_DAY
    avg_interval = span_days / n_int
    lam = (-F.log((n_int - F.col("n_changes").cast("double") + F.lit(0.5))
                  / (n_int + F.lit(0.5)))
           / avg_interval)
    return agg.withColumn(
        "lambda_per_day",
        F.when((n_int > 0) & (span_days > 0), lam))


def staleness(rates: DataFrame, as_of,
              default_lambda_per_day: float | None = None) -> DataFrame:
    """Adds ``p_stale`` — probability the page changed since its last
    fetch, evaluated at ``as_of`` (a timestamp literal or column; passed
    explicitly so schedules are reproducible). Urls with no estimate
    (single fetch) use ``default_lambda_per_day`` when given, else NULL
    p_stale (they sort last; a crawler typically gives first-seen pages
    their own budget tier instead of a fake rate)."""
    as_of_c = as_of if isinstance(as_of, Column) else F.lit(as_of)
    age_days = ((F.unix_timestamp(as_of_c.cast("timestamp")).cast("double")
                 - F.unix_timestamp("last_ts").cast("double"))
                / _SEC_PER_DAY)
    lam = F.col("lambda_per_day")
    if default_lambda_per_day is not None:
        lam = F.coalesce(lam, F.lit(float(default_lambda_per_day)))
    return rates.withColumn(
        "p_stale",
        F.when(lam.isNotNull() & (age_days >= 0),
               F.lit(1.0) - F.exp(-lam * age_days)))


def recrawl_schedule(rates: DataFrame, budget: int, as_of,
                     default_lambda_per_day: float | None = None,
                     per_host_cap: int | None = None) -> DataFrame:
    """The ``budget`` urls most worth refetching at ``as_of``: highest
    ``p_stale`` first, url as the deterministic tie-break. A top-k
    (orderBy+limit → TakeOrdered), never a global sort of the url
    space.

    ``per_host_cap`` is the politeness knob: at most that many urls per
    host enter the cycle (a single stale-heavy host must not eat the
    fetch budget, and crawlers rate-limit per host anyway). Costs one
    extra hash exchange keyed on host; a host's candidate set is its
    url count, so no skew treatment is needed beyond what the window
    already gets from AQE."""
    cand = (staleness(rates, as_of, default_lambda_per_day)
            .filter(F.col("p_stale").isNotNull()))
    if per_host_cap is not None:
        cand = _cap_per_host(cand, [F.desc("p_stale"), F.asc("url")],
                             per_host_cap)
    return (cand.orderBy(F.desc("p_stale"), F.asc("url"))
            .limit(int(budget))
            .select("url", "p_stale", "lambda_per_day", "last_ts"))


def discover_frontier(links: DataFrame, fetched: DataFrame,
                      ranks: DataFrame | None = None,
                      budget: int | None = None,
                      per_host_cap: int | None = None,
                      src_col: str = "src_url", dst_col: str = "dst_url"
                      ) -> DataFrame:
    """New-URL discovery: outlink targets the crawl has never fetched,
    ranked by the link mass pointing at them.

    ``links``: the edge list `operators/linkgraph.py:extract_links`
    produces. ``fetched``: frame with a ``url`` column (the corpus).
    ``ranks``: optional (url, rank) from ``pagerank`` — when given,
    candidates order by ``inlink_rank`` (the summed rank of their
    linkers: a page recommended by important pages outranks one with
    many low-value inlinks); otherwise by linking-HOST count then
    inlink count (host diversity is the cheap spam counter — 10^4
    inlinks from one domain is one vote). ``per_host_cap`` /
    ``budget`` bound the cycle exactly as in :func:`recrawl_schedule`.

    Plan: one anti-join of the slim edge list against the corpus urls,
    one groupBy dst (the (dst, src-host) distinct inside is bounded by
    distinct pairs; swap `countDistinct` for `approx_count_distinct`
    at web scale if a mega-inlinked url's pair set ever dominates),
    plus a broadcast-or-merge join against the KB-to-GB rank table.
    Returns (url, n_inlinks, n_hosts, inlink_rank).
    """
    src, dst = F.col(src_col), F.col(dst_col)
    cand = (links.select(src.alias("_src"), dst.alias("url"))
            .join(fetched.select("url"), "url", "left_anti"))
    if ranks is not None:
        r = ranks.select(F.col("url").alias("_src"),
                         F.col("rank").alias("_r"))
        cand = cand.join(r, "_src", "left")
    else:
        cand = cand.withColumn("_r", F.lit(None).cast("double"))
    agg = (cand.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct(_host(F.col("_src"))).alias("n_hosts"),
        F.sum("_r").alias("inlink_rank")))
    order = ([F.desc("inlink_rank")] if ranks is not None
             else [F.desc("n_hosts"), F.desc("n_inlinks")]) + \
        [F.asc("url")]
    if per_host_cap is not None:
        agg = _cap_per_host(agg, order, per_host_cap)
    out = agg.orderBy(*order)
    if budget is not None:
        out = out.limit(int(budget))
    return out


def corpus_delta(old: DataFrame, new: DataFrame, url_col: str = "url",
                 sha_col: str = "extracted_sha256") -> DataFrame:
    """Per-url diff of two crawl snapshots: status ∈ added / removed /
    changed / unchanged (by content fingerprint). One full-outer
    sort-merge join on url; input frames need one row per url (apply
    the per-url dedup first, as the build does)."""
    o = old.select(F.col(url_col).alias("url"),
                   F.col(sha_col).alias("_old_sha"))
    n = new.select(F.col(url_col).alias("url"),
                   F.col(sha_col).alias("_new_sha"))
    joined = o.join(n, "url", "full_outer")
    status = (F.when(F.col("_old_sha").isNull(), F.lit("added"))
              .when(F.col("_new_sha").isNull(), F.lit("removed"))
              .when(F.col("_old_sha") != F.col("_new_sha"),
                    F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return joined.select("url", status.alias("status"))


def host_crawl_stats(fetches: DataFrame, url_col: str = "url",
                     sha_col: str = "extracted_sha256") -> DataFrame:
    """Per-host crawl-shape statistics: (host, n_urls, n_contents,
    urls_per_content, query_frac, avg_depth). The signals crawl-trap
    detection reads — a session-id or calendar trap mints unbounded
    urls over few distinct contents (urls_per_content explodes),
    usually with query strings (query_frac) or deep generated paths
    (avg_depth). One groupBy host over two slim columns; the distinct
    counts are per-host exact (swap to approx_count_distinct at web
    scale if a single mega-host dominates, same note as frontier
    discovery)."""
    url = F.col(url_col)
    host = _host(url)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("/"))
    has_q = F.try_parse_url(url, F.lit("QUERY")).isNotNull()
    depth = F.size(F.filter(F.split(path, "/"),
                            lambda s: s != F.lit("")))
    per_url = fetches.select(
        host.alias("host"), url.alias("_url"),
        F.col(sha_col).alias("_sha"), has_q.alias("_q"),
        depth.alias("_d"))
    return (per_url.groupBy("host").agg(
        F.countDistinct("_url").alias("n_urls"),
        F.countDistinct("_sha").alias("n_contents"),
        (F.sum(F.col("_q").cast("long")) / F.count(F.lit(1)))
        .alias("query_frac"),
        F.avg("_d").alias("avg_depth"))
        .withColumn("urls_per_content",
                    F.col("n_urls") / F.col("n_contents")))


def trap_hosts(fetches: DataFrame, min_urls: int = 100,
               max_urls_per_content: float = 5.0,
               url_col: str = "url",
               sha_col: str = "extracted_sha256") -> DataFrame:
    """Hosts whose url space is exploding over duplicated content — the
    crawl-trap tripwire. Thresholds are the operational knobs: a host
    needs ``min_urls`` distinct urls before the ratio means anything
    (small hosts with one mirrored page are not traps), and
    ``max_urls_per_content`` is how many urls per distinct content a
    legitimate site plausibly mints (faceted navigation sits around
    2-4; session-id traps reach thousands). Feed the result to the
    frontier/schedule as an anti-join, and to `operators/urlnorm.py`
    as the queue of hosts needing parameter-stripping rules."""
    return (host_crawl_stats(fetches, url_col, sha_col)
            .filter((F.col("n_urls") >= int(min_urls))
                    & (F.col("urls_per_content")
                       > float(max_urls_per_content))))


def delta_by_host(delta: DataFrame) -> DataFrame:
    """Churn report: per (host, status) url counts over a
    :func:`corpus_delta` frame — the shape a crawl operator watches
    between snapshots."""
    return (delta.groupBy(_host(F.col("url")).alias("host"), "status")
            .agg(F.count(F.lit(1)).alias("n_urls")))
