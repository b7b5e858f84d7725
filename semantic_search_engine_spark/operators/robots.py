"""robots.txt crawl-policy filtering — RFC 9309 (the Robots Exclusion
Protocol) as a corpus operator: given the per-host robots.txt bodies a
crawl collected, drop (or mark) every document whose URL the policy
disallows for your user agent. Common Crawl honors robots at fetch
time; a DERIVED corpus re-checks at curation time because policies
change and takedown requests reference them.

Parsing/matching follows RFC 9309 precisely where it speaks:
- group selection: the groups whose user-agent token is the LONGEST
  match for the product token win; no match falls back to ``*``; no
  ``*`` group means everything is allowed (§2.2.1).
- rule matching: longest-path-match wins; on equal length allow beats
  disallow (§2.2.2); ``*`` matches any char sequence and ``$`` anchors
  the end; an empty pattern never matches; no matching rule = allowed.

Plan shape: robots bodies join docs BY HOST (both sides hash-shuffle
on the 10-byte host key — or broadcast when the host table is small);
rule evaluation is one Arrow kernel that parses each DISTINCT host's
policy once per batch and evaluates compiled patterns — per-doc Python
is a compiled-regex match, the honest cost of a data-dependent
pattern language (there is no Catalyst expression for RFC 9309
longest-match semantics)."""
from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots", "is_allowed", "robots_filter"]


def parse_robots(content: str | None, agent: str = "*"
                 ) -> list[tuple[bool, str]]:
    """The (allow, path-pattern) rules governing ``agent``: rules from
    the group(s) with the longest user-agent token matching ``agent``
    (case-insensitive substring of the product token per §2.2.1),
    falling back to the ``*`` group; [] = everything allowed."""
    if not content:
        return []
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    open_agents = True
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not open_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            open_agents = True
        elif key in ("allow", "disallow"):
            if cur_agents:
                cur_rules.append((key == "allow", val))
                open_agents = False
        # crawl-delay / sitemap etc.: not access rules, ignored
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    def match_len(a: str) -> int:
        if a == "*":
            return 0
        return len(a) if a in agent_l else -1

    # all groups at the winning specificity merge (§2.2.1: multiple
    # groups for the same agent combine); "*" has specificity 0, a
    # named match its token length, so named groups beat the wildcard
    specs = [(max(match_len(a) for a in agents), rules)
             for agents, rules in groups]
    best = max((s for s, _r in specs), default=-1)
    if best < 0:
        return []
    return [r for s, rules in specs if s == best for r in rules]


@lru_cache(maxsize=4096)
def _compile(pattern: str) -> "re.Pattern":
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "$":
            out.append("$")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out))


def is_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Longest-match wins; equal length -> allow wins; no match ->
    allowed. Empty patterns never match (§2.2.2)."""
    best_len, best_allow = -1, True
    for allow, pat in rules:
        if not pat:
            continue
        if _compile(pat).match(path):
            plen = len(pat)
            if plen > best_len or (plen == best_len and allow):
                best_len, best_allow = plen, allow
    return best_allow


def robots_filter(docs: DataFrame, robots: DataFrame, agent: str = "*",
                  url_col: str = "url", mode: str = "drop",
                  broadcast_robots: bool = False) -> DataFrame:
    """Apply per-host robots policies to the corpus. ``robots``:
    (host, robots_txt). Hosts with no robots row allow everything.
    mode='drop' returns the compliant corpus; mode='mark' adds
    ``robots_allowed``."""
    if mode not in ("drop", "mark"):
        raise ValueError(f"mode must be 'drop' or 'mark', got {mode!r}")
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")),
                      F.lit("/"))
    r = robots.select(F.lower(F.col("host")).alias("_h"),
                      F.col("robots_txt").alias("_robots"))
    if broadcast_robots:
        r = F.broadcast(r)
    joined = (docs
              .withColumn("_h", host).withColumn("_p", path)
              .join(r, "_h", "left"))

    def _kernel(iterator):
        import pandas as pd
        for pdf in iterator:
            cache: dict = {}
            allowed = []
            for body, p in zip(pdf["_robots"], pdf["_p"]):
                if body is None:
                    allowed.append(True)
                    continue
                rules = cache.get(body)
                if rules is None:
                    rules = cache[body] = parse_robots(body, agent)
                allowed.append(is_allowed(rules, p or "/"))
            out = pdf.drop(columns=["_h", "_p", "_robots"])
            out["robots_allowed"] = allowed
            yield out

    from pyspark.sql.types import StructType

    # StructType.add MUTATES in place — copy before extending, or the
    # caller's docs.schema grows a column per call
    schema = StructType(list(docs.schema.fields)).add(
        "robots_allowed", "boolean")
    marked = joined.mapInPandas(_kernel, schema=schema)
    if mode == "mark":
        return marked
    return marked.filter(F.col("robots_allowed")).drop("robots_allowed")
