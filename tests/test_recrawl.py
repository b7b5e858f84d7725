"""Recrawl scheduling: change-rate estimator vs a DuckDB oracle,
closed-form checks, schedule semantics, snapshot deltas, plan shape."""
from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.recrawl import (
    change_rate, corpus_delta, delta_by_host, recrawl_schedule, staleness)

T0 = dt.datetime(2024, 1, 1)


def _fetch_log() -> pd.DataFrame:
    """Deterministic synthetic fetch history: url_i fetched (i % 7) + 1
    times at i-dependent intervals; content flips on a fixed pattern."""
    rows = []
    for i in range(40):
        n = (i % 7) + 1
        interval = dt.timedelta(days=(i % 5) + 1)
        for j in range(n):
            # change the fingerprint on fetches where (i + j) % 3 == 0
            version = sum(1 for k in range(j + 1) if (i + k) % 3 == 0)
            rows.append({
                "url": f"https://site{i % 9}.example/page{i}",
                "warc_ts": T0 + j * interval,
                "extracted_sha256": f"sha-{i}-v{version}",
            })
    return pd.DataFrame(rows)


ORACLE_SQL = """
WITH lagged AS (
  SELECT url, warc_ts, extracted_sha256 AS sha,
         lag(extracted_sha256) OVER (
             PARTITION BY url ORDER BY warc_ts, extracted_sha256) AS prev
  FROM fetches
), agg AS (
  SELECT url, count(*) AS n_fetches,
         sum(CASE WHEN prev IS NOT NULL AND prev <> sha
                  THEN 1 ELSE 0 END) AS n_changes,
         min(warc_ts) AS first_ts, max(warc_ts) AS last_ts
  FROM lagged GROUP BY url
)
SELECT url, n_fetches, n_changes,
       CASE WHEN n_fetches > 1 AND epoch(last_ts) > epoch(first_ts) THEN
         -ln(((n_fetches - 1) - n_changes + 0.5) / ((n_fetches - 1) + 0.5))
           / (((epoch(last_ts) - epoch(first_ts)) / 86400.0)
              / (n_fetches - 1))
       END AS lambda_per_day
FROM agg ORDER BY url
"""


def test_change_rate_matches_duckdb_oracle(spark):
    pdf = _fetch_log()
    got = (change_rate(spark.createDataFrame(pdf))
           .orderBy("url").toPandas())
    con = duckdb.connect()
    con.register("fetches", pdf)
    want = con.execute(ORACLE_SQL).fetchdf()
    assert list(got["url"]) == list(want["url"])
    assert list(got["n_fetches"]) == list(want["n_fetches"])
    assert list(got["n_changes"]) == list(want["n_changes"])
    for g, w in zip(got["lambda_per_day"], want["lambda_per_day"]):
        if pd.isna(w):
            assert pd.isna(g)
        else:
            assert g == pytest.approx(w, rel=1e-9)


def test_estimator_closed_form(spark):
    # 5 fetches, 1 day apart, changed on 2 of the 4 revisits:
    # lambda = -ln((4 - 2 + .5)/(4 + .5)) / 1.0
    rows = [("u", T0 + dt.timedelta(days=j), f"s{v}")
            for j, v in zip(range(5), [0, 0, 1, 1, 2])]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "extracted_sha256 string")
    [r] = change_rate(df).collect()
    assert r.n_fetches == 5 and r.n_changes == 2
    assert r.lambda_per_day == pytest.approx(-math.log(2.5 / 4.5), rel=1e-12)


def test_never_changed_is_rate_zero_and_single_fetch_null(spark):
    rows = ([("stable", T0 + dt.timedelta(days=j), "same") for j in range(4)]
            + [("once", T0, "x")])
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "extracted_sha256 string")
    out = {r.url: r for r in change_rate(df).collect()}
    assert out["stable"].lambda_per_day == pytest.approx(0.0, abs=1e-15)
    assert out["once"].lambda_per_day is None


def test_schedule_orders_by_staleness_and_respects_budget(spark):
    rows = []
    # fast: changes every revisit; slow: never changes; both last fetched T0+3d
    for j in range(4):
        rows.append(("https://a.example/fast", T0 + dt.timedelta(days=j),
                     f"v{j}"))
        rows.append(("https://a.example/slow", T0 + dt.timedelta(days=j),
                     "same"))
    rows.append(("https://a.example/new", T0 + dt.timedelta(days=3), "n"))
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "extracted_sha256 string")
    rates = change_rate(df)
    as_of = T0 + dt.timedelta(days=10)
    sched = recrawl_schedule(rates, budget=5, as_of=as_of).collect()
    # single-fetch url has no estimate -> excluded without a prior
    assert [r.url for r in sched] == ["https://a.example/fast",
                                      "https://a.example/slow"]
    assert sched[0].p_stale > 0.9 and sched[1].p_stale == 0.0
    # with a default prior the first-seen url competes
    sched2 = recrawl_schedule(rates, budget=1, as_of=as_of,
                              default_lambda_per_day=10.0).collect()
    assert len(sched2) == 1 and sched2[0].url == "https://a.example/new"


def test_staleness_monotone_in_age(spark):
    rows = [("u", T0 + dt.timedelta(days=j), f"v{j}") for j in range(3)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "extracted_sha256 string")
    rates = change_rate(df)
    p1 = staleness(rates, T0 + dt.timedelta(days=3)).collect()[0].p_stale
    p2 = staleness(rates, T0 + dt.timedelta(days=4)).collect()[0].p_stale
    assert 0.0 < p1 < p2 < 1.0


def test_corpus_delta_and_host_report(spark):
    old = spark.createDataFrame(
        [("https://h1.example/a", "s1"), ("https://h1.example/b", "s2"),
         ("https://h2.example/c", "s3")],
        "url string, extracted_sha256 string")
    new = spark.createDataFrame(
        [("https://h1.example/a", "s1"), ("https://h1.example/b", "s2x"),
         ("https://h2.example/d", "s4")],
        "url string, extracted_sha256 string")
    delta = {r.url: r.status for r in corpus_delta(old, new).collect()}
    assert delta == {"https://h1.example/a": "unchanged",
                     "https://h1.example/b": "changed",
                     "https://h2.example/c": "removed",
                     "https://h2.example/d": "added"}
    rep = {(r.host, r.status): r.n_urls
           for r in delta_by_host(corpus_delta(old, new)).collect()}
    assert rep == {("h1.example", "unchanged"): 1,
                   ("h1.example", "changed"): 1,
                   ("h2.example", "removed"): 1,
                   ("h2.example", "added"): 1}


def test_change_rate_single_exchange(spark):
    """The lag window and the groupBy share the url partitioning: the
    whole estimator is ONE hash exchange."""
    df = spark.createDataFrame(_fetch_log())
    plan = change_rate(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_per_host_cap_politeness(spark):
    # hog.example has 5 always-changing urls; quiet.example has 1
    rows = []
    for i in range(5):
        for j in range(3):
            rows.append((f"https://hog.example/p{i}",
                         T0 + dt.timedelta(days=j), f"v{i}-{j}"))
    for j in range(3):
        rows.append(("https://quiet.example/only",
                     T0 + dt.timedelta(days=j), f"q{j}"))
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "extracted_sha256 string")
    rates = change_rate(df)
    as_of = T0 + dt.timedelta(days=9)
    uncapped = recrawl_schedule(rates, budget=3, as_of=as_of).collect()
    assert all("hog.example" in r.url for r in uncapped)
    capped = recrawl_schedule(rates, budget=3, as_of=as_of,
                              per_host_cap=2).collect()
    hosts = [("hog" if "hog" in r.url else "quiet") for r in capped]
    assert hosts.count("hog") == 2 and hosts.count("quiet") == 1


FRONTIER_ORACLE = """
WITH cand AS (
  SELECT l.src_url, l.dst_url FROM links l
  WHERE l.dst_url NOT IN (SELECT url FROM fetched)
)
SELECT dst_url AS url, count(*) AS n_inlinks,
       count(DISTINCT lower(split_part(split_part(src_url, '://', 2),
                                       '/', 1))) AS n_hosts
FROM cand GROUP BY dst_url
ORDER BY n_hosts DESC, n_inlinks DESC, url ASC
"""


def test_discover_frontier_matches_duckdb_oracle(spark):
    import duckdb as _ddb
    from semantic_search_engine_spark.operators.recrawl import (
        discover_frontier)
    links = []
    for i in range(30):
        links.append((f"https://h{i % 4}.example/src{i}",
                      f"https://new{i % 6}.example/page"))
    for i in range(10):  # already-fetched targets must be excluded
        links.append((f"https://h{i % 4}.example/src{i}",
                      "https://old.example/known"))
    links_pdf = pd.DataFrame(links, columns=["src_url", "dst_url"])
    fetched_pdf = pd.DataFrame(
        {"url": ["https://old.example/known"]
         + [f"https://h{i}.example/src{i}" for i in range(4)]})
    got = discover_frontier(
        spark.createDataFrame(links_pdf),
        spark.createDataFrame(fetched_pdf)).toPandas()
    con = _ddb.connect()
    con.register("links", links_pdf)
    con.register("fetched", fetched_pdf)
    want = con.execute(FRONTIER_ORACLE).fetchdf()
    assert list(got["url"]) == list(want["url"])
    assert list(got["n_inlinks"]) == list(want["n_inlinks"])
    assert list(got["n_hosts"]) == list(want["n_hosts"])
    assert got["inlink_rank"].isna().all()  # no ranks given


def test_discover_frontier_rank_ordering_and_caps(spark):
    from semantic_search_engine_spark.operators.recrawl import (
        discover_frontier)
    links = spark.createDataFrame(
        [("https://big.example/", "https://n.example/by-big"),
         ("https://tiny1.example/", "https://n.example/by-tiny"),
         ("https://tiny2.example/", "https://n.example/by-tiny"),
         ("https://tiny3.example/", "https://n.example/by-tiny"),
         ("https://big.example/", "https://m.example/other")],
        "src_url string, dst_url string")
    fetched = spark.createDataFrame(
        [("https://big.example/",)], "url string")
    ranks = spark.createDataFrame(
        [("https://big.example/", 0.9), ("https://tiny1.example/", 0.01),
         ("https://tiny2.example/", 0.01), ("https://tiny3.example/", 0.01)],
        "url string, rank double")
    # host-diversity order: by-tiny (3 hosts) first
    plain = discover_frontier(links, fetched).collect()
    assert plain[0].url == "https://n.example/by-tiny"
    # rank order: the single big-rank inlink wins
    ranked = discover_frontier(links, fetched, ranks=ranks).collect()
    assert ranked[0].url in ("https://n.example/by-big",
                             "https://m.example/other")
    assert ranked[0].inlink_rank == pytest.approx(0.9)
    # politeness: one url per host with budget 2 -> two distinct hosts
    capped = discover_frontier(links, fetched, per_host_cap=1,
                               budget=2).collect()
    assert len(capped) == 2
    assert len({r.url.split("/")[2] for r in capped}) == 2


HOST_STATS_ORACLE = """
SELECT lower(split_part(split_part(url, '://', 2), '/', 1)) AS host,
       count(DISTINCT url) AS n_urls,
       count(DISTINCT extracted_sha256) AS n_contents
FROM fetches GROUP BY 1 ORDER BY 1
"""


def test_host_crawl_stats_matches_duckdb_oracle(spark):
    import duckdb as _ddb
    from semantic_search_engine_spark.operators.recrawl import (
        host_crawl_stats)
    pdf = _fetch_log()
    got = (host_crawl_stats(spark.createDataFrame(pdf))
           .orderBy("host").toPandas())
    con = _ddb.connect()
    con.register("fetches", pdf)
    want = con.execute(HOST_STATS_ORACLE).fetchdf()
    assert list(got["host"]) == list(want["host"])
    assert list(got["n_urls"]) == list(want["n_urls"])
    assert list(got["n_contents"]) == list(want["n_contents"])
    for _, r in got.iterrows():
        assert r["urls_per_content"] == pytest.approx(
            r["n_urls"] / r["n_contents"])


def test_trap_hosts_flags_session_id_explosion(spark):
    from semantic_search_engine_spark.operators.recrawl import (
        host_crawl_stats, trap_hosts)
    t = T0
    rows = []
    # trap: 120 urls with session ids, only 3 distinct contents
    for i in range(120):
        rows.append((f"https://trap.example/item?sid={i:04d}", t,
                     f"content-{i % 3}"))
    # healthy: 120 urls, 120 contents
    for i in range(120):
        rows.append((f"https://ok.example/page/{i}", t, f"unique-{i}"))
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "extracted_sha256 string")
    flagged = trap_hosts(df, min_urls=100, max_urls_per_content=5.0)
    assert [r.host for r in flagged.collect()] == ["trap.example"]
    stats = {r.host: r for r in host_crawl_stats(df).collect()}
    assert stats["trap.example"].urls_per_content == pytest.approx(40.0)
    assert stats["trap.example"].query_frac == pytest.approx(1.0)
    assert stats["ok.example"].query_frac == pytest.approx(0.0)
    assert stats["ok.example"].avg_depth == pytest.approx(2.0)
    # below min_urls the same ratio is NOT flagged
    small = df.filter(F.col("url").contains("sid=000"))  # 10 trap urls
    assert trap_hosts(small, min_urls=100).isEmpty()
