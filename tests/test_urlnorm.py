"""URL canonicalization (X76): RFC 3986 normalization ladder +
tracking-param strip, pinned case-by-case and against a Python
urllib-based oracle on generated variants."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.operators.urlnorm import (
    canonical_dup_groups,
    canonicalize_urls,
)

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.com/a", "http://www.example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com.", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com//a///b", "http://example.com/a/b"),
    ("http://example.com/a/./b", "http://example.com/a/b"),
    ("http://example.com/a/../b", "http://example.com/b"),
    ("http://example.com/a/b/../../c", "http://example.com/c"),
    ("http://example.com/../a", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?utm_source=x&a=1", "http://example.com/a?a=1"),
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/a?gclid=9&fbclid=8", "http://example.com/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?x=1#frag", "http://example.com/a?x=1"),
    (None, None),
    ("not a url", None),
]


def test_canonical_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i int, url string")
    got = {r["i"]: r["url_canon"]
           for r in canonicalize_urls(df).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_idempotent(spark):
    """canon(canon(u)) == canon(u) — the defining property."""
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES) if u], "i int, url string")
    once = canonicalize_urls(df).select(
        "i", "url_canon").withColumnRenamed("url_canon", "url")
    twice = {r["i"]: r["url_canon"]
             for r in canonicalize_urls(once.filter("url is not null"))
             .collect()}
    first = {r["i"]: r["url"] for r in once.collect() if r["url"]}
    assert twice == first


def test_dup_groups(spark):
    variants = [
        "http://A.com/x?b=2&a=1",
        "http://a.com:80/x?a=1&b=2",
        "http://a.com/y/../x?a=1&b=2&utm_source=z",
        "http://a.com/x?a=1",         # different query -> different group
        "http://b.com/x?a=1&b=2",     # different host
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    groups = {r["url_canon"]: (r["n"], list(r["urls"]))
              for r in canonical_dup_groups(df).collect()}
    assert list(groups) == ["http://a.com/x?a=1&b=2"]
    n, urls = groups["http://a.com/x?a=1&b=2"]
    assert n == 3 and set(urls) == set(variants[:3])
