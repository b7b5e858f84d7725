"""Fuzzy term matching via a SymSpell-style deletion index, plus
prefix-based term suggestion.

The reference's search box has no typo tolerance (Postgres offers it
via pg_trgm similarity); search engines standardly bolt it onto the
term dictionary. The scalable construction is Wolf Garbe's symmetric
delete spelling correction (public algorithm): precompute, for every
dictionary term, all variants obtainable by deleting up to ``max_edit``
characters; a query term matches a dictionary term within edit
distance d iff their deletion neighborhoods intersect (both sides
include the original string). The candidate join is exact-match on the
variant string — a broadcast-able lookup, never a scan of the
dictionary — and true Damerau-Levenshtein distance verifies the small
candidate set afterwards.

Scale: the deletes table is O(|dictionary| · L^d) rows of short
strings (~21x the dictionary at d=1 for 20-char terms) — a static
by-product of the build, partitioned by variant hash so a query term's
~L+1 variants prune to their buckets. Query-side state is one term's
variant list; no driver-side dictionary.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["delete_variants", "build_deletes_df", "damerau_levenshtein",
           "fuzzy_candidates"]


def delete_variants(term: str, max_edit: int = 1) -> list[str]:
    """The deletion neighborhood of ``term`` (the term itself included),
    distinct, in deterministic sorted order."""
    out = {term}
    frontier = {term}
    for _ in range(max_edit):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        frontier = nxt - out
        out |= nxt
    return sorted(out)


def damerau_levenshtein(a: str, b: str, cap: int = 3) -> int:
    """Optimal-string-alignment distance (the SymSpell verifier), capped:
    returns ``cap + 1`` early when the distance provably exceeds cap."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la == 0 or lb == 0:
        return la + lb  # <= cap by the length guard above
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = cap + 1
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                cur[j] = min(cur[j], prev2[j - 2] + cost)
            lo = min(lo, cur[j])
        if lo > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[lb]


def build_deletes_df(term_stats: DataFrame, max_edit: int = 1,
                     max_term_len: int = 32) -> DataFrame:
    """term_stats (term, df) → the deletes table
    (variant, term, df).

    Pure JVM expressions: the deletion neighborhood is generated with
    ``sequence`` + ``transform`` (substring concatenation) and exploded —
    no Python in the build path. Terms longer than ``max_term_len`` are
    skipped (their neighborhoods explode combinatorially and real
    dictionaries cap lookup length the same way). d=1 is generated
    directly; d=2 re-applies the transform to the d=1 set.
    """
    base = (term_stats.select("term", "df")
            .filter(F.length("term") <= max_term_len))
    # index-parameterized substring concat reads clearest as one SQL
    # lambda: every i-th-character deletion of `term`, plus term itself
    d1 = base.select(
        "term", "df",
        F.array_union(
            F.array(F.col("term")),
            F.expr("transform(sequence(1, length(term)), i -> "
                   "concat(substring(term, 1, i-1), "
                   "substring(term, i+1, length(term))))")
        ).alias("_vars"))
    if max_edit >= 2:
        d1 = d1.select(
            "term", "df",
            F.array_distinct(F.flatten(F.expr(
                "transform(_vars, v -> array_union(array(v), "
                "transform(sequence(1, greatest(length(v), 1)), i -> "
                "concat(substring(v, 1, i-1), "
                "substring(v, i+1, length(v))))))"))).alias("_vars"))
    return (d1.select("term", "df",
                      F.explode(F.array_distinct("_vars")).alias("variant"))
            .select("variant", "term", "df"))


def fuzzy_candidates(spark: SparkSession, deletes: DataFrame,
                     query_term: str, max_edit: int = 1,
                     limit: int = 16) -> list[tuple[str, int, int]]:
    """Dictionary terms within ``max_edit`` of ``query_term``:
    [(term, distance, df)] ordered (distance ASC, df DESC, term ASC).

    One job: the query term's ≤ L+1 deletion variants broadcast-join the
    deletes table on exact variant match (parquet pushdown via
    ``variant IN``), candidates dedupe, and true Damerau-Levenshtein
    verifies driver-side over the (small) candidate list.
    """
    qvars = delete_variants(query_term.lower(), max_edit)
    cands = (deletes.filter(F.col("variant").isin(qvars))
             .select("term", "df").distinct().collect())
    out = []
    for r in cands:
        d = damerau_levenshtein(query_term.lower(), r["term"],
                                cap=max_edit)
        if d <= max_edit:
            out.append((r["term"], d, int(r["df"])))
    out.sort(key=lambda x: (x[1], -x[2], x[0]))
    return out[:limit]
