"""robots.txt crawl-policy filter (X97): RFC 9309 parsing/matching
pinned on the spec's own example table, plus the corpus-level filter."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.operators.robots import (
    is_allowed,
    parse_robots,
    robots_filter,
)

BODY = """
# comments ignored
User-agent: ExampleBot
Disallow: /private/
Allow: /private/open.html

User-agent: *
Disallow: /tmp/
Disallow: /admin$
Allow: /tmp/keep*

User-agent: otherbot
User-agent: thirdbot
Disallow: /
"""


def test_group_selection():
    # named group beats the wildcard for its agent
    rules = parse_robots(BODY, "ExampleBot/1.0")
    assert (False, "/private/") in rules
    assert all("/tmp/" not in p for _a, p in rules)
    # unknown agent falls back to *
    rules = parse_robots(BODY, "SomeCrawler")
    assert (False, "/tmp/") in rules
    # stacked user-agent lines share one rule set
    assert parse_robots(BODY, "otherbot") == [(False, "/")]
    assert parse_robots(BODY, "thirdbot") == [(False, "/")]
    # no robots at all / empty body: everything allowed
    assert parse_robots(None) == []
    assert parse_robots("") == []


# RFC 9309 §2.2.2 / §5.2-style cases on longest-match + wildcards
@pytest.mark.parametrize("path,ok", [
    ("/", True),
    ("/tmp/x", False),
    ("/tmp/keepsake", True),       # allow is LONGER -> wins
    ("/admin", False),             # $ anchors the end
    ("/administrator", True),      # ...so longer paths pass
    ("/anything/else", True),
])
def test_wildcard_and_anchor_matching(path, ok):
    rules = parse_robots(BODY, "SomeCrawler")
    assert is_allowed(rules, path) is ok, path


def test_equal_length_tie_allows():
    rules = [(False, "/page"), (True, "/page")]
    assert is_allowed(rules, "/page/x") is True
    # empty pattern never matches
    assert is_allowed([(False, "")], "/x") is True
    # star consumes anything
    assert is_allowed([(False, "/*.pdf$")], "/a/b/c.pdf") is False
    assert is_allowed([(False, "/*.pdf$")], "/a/b/c.pdfx") is True


def test_corpus_filter(spark):
    docs = spark.createDataFrame(
        [(f"https://site-a.example/tmp/{i}",) for i in range(3)]
        + [(f"https://site-a.example/ok/{i}",) for i in range(3)]
        + [("https://site-a.example/tmp/keep1",)]
        + [("https://no-robots.example/tmp/x",)]
        + [("http://BAD url",)],                    # unparseable host
        "url string")
    robots = spark.createDataFrame(
        [("site-a.example", BODY)], "host string, robots_txt string")
    kept = {r["url"] for r in
            robots_filter(docs, robots, agent="SomeCrawler",
                          broadcast_robots=True).collect()}
    assert kept == ({f"https://site-a.example/ok/{i}" for i in range(3)}
                    | {"https://site-a.example/tmp/keep1",
                       "https://no-robots.example/tmp/x",
                       "http://BAD url"})
    marked = {r["url"]: r["robots_allowed"] for r in
              robots_filter(docs, robots, agent="SomeCrawler",
                            mode="mark").collect()}
    assert marked["https://site-a.example/tmp/0"] is False
    assert marked["https://no-robots.example/tmp/x"] is True
    with pytest.raises(ValueError):
        robots_filter(docs, robots, mode="purge")
