"""Percolator (X70): compile + reverse-match vs a direct Python oracle
that evaluates every (doc, query) pair with the same parser/tokenizer —
full cross-check, no sampling."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.operators.percolate import (
    compile_percolator,
    percolate,
)
from semantic_search_engine_spark.plans.boolean import parse_websearch
from semantic_search_engine_spark.textproc import (
    phrase_match_count,
    token_positions,
    tokenize,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick quick fox"),
    (2, "brown dog sleeps all day"),
    (3, "a lazy fox and a lazy dog share a den"),
    (4, "nothing relevant here at all"),
    (5, "fox dog fox dog fox"),
    (6, "the brown fox is not lazy today"),
    (7, "dogs and foxes"),            # plural: no stem in simple analyzer
    (8, "quick brown fox"),
    (9, ""),
]

QUERIES = [
    (100, "quick fox"),
    (101, "fox OR dog"),
    (102, '"brown fox"'),
    (103, "fox -lazy"),
    (104, 'dog -"lazy dog"'),
    (105, "den"),
    (106, "cat OR mouse"),
    (107, '"quick quick"'),
    (108, "fox dog -brown"),
    (109, "zzznope"),
]


def _py_matches(text: str, query: str) -> bool:
    clauses = parse_websearch(query)
    toks = tokenize(text)
    present = set(toks)
    pos = token_positions(text)
    for c in clauses:
        if not all(t in present for t in c.req_terms):
            continue
        if any(t in present for t in c.neg_terms):
            continue
        if not all(phrase_match_count(pos, list(p)) > 0
                   for p in c.req_phrases):
            continue
        if any(phrase_match_count(pos, list(p)) > 0
               for p in c.neg_phrases):
            continue
        return True
    return False


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    return docs, queries


def test_percolate_full_cross_check(spark, frames):
    docs, queries = frames
    compiled = compile_percolator(queries)
    assert compiled.filter("error is not null").count() == 0
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, compiled).collect()}
    want = {(d, q) for d, t in DOCS for q, s in QUERIES
            if _py_matches(t, s)}
    assert got == want
    assert (0, 100) in want and (3, 103) not in want  # sanity anchors


def test_compile_errors_for_unsupported(spark):
    qdf = spark.createDataFrame(
        [(1, "fox*"), (2, "/fo+x/"), (3, '""'), (4, "ok")],
        "query_id long, query string")
    rows = compile_percolator(qdf).collect()
    errs = {r["query_id"]: r["error"] for r in rows
            if r["error"] is not None}
    assert set(errs) == {1, 2, 3}
    assert "wildcard" in errs[1] and "wildcard" in errs[2]
    ok = [r for r in rows if r["query_id"] == 4]
    assert len(ok) == 1 and ok[0]["error"] is None


def test_error_queries_never_match(spark, frames):
    docs, _ = frames
    qdf = docs.sparkSession.createDataFrame(
        [(1, "fox*"), (2, "fox")], "query_id long, query string")
    got = {r["query_id"] for r in
           percolate(docs, compile_percolator(qdf)).collect()}
    assert got == {2}


def test_rarest_anchor_with_term_stats(spark, frames):
    docs, _ = frames
    qdf = spark.createDataFrame([(1, "fox den")],
                                "query_id long, query string")
    ts = spark.createDataFrame([("fox", 1000), ("den", 2)],
                               "term string, df long")
    (row,) = compile_percolator(qdf, term_stats=ts).collect()
    assert row["anchor"] == "den"  # rarest wins
    # absent-from-index term has df 0 -> even better anchor
    ts2 = spark.createDataFrame([("fox", 1000)], "term string, df long")
    (row2,) = compile_percolator(qdf, term_stats=ts2).collect()
    assert row2["anchor"] == "den"
    # matches are anchor-independent
    got = {(r["doc_id"], r["query_id"]) for r in percolate(
        docs, compile_percolator(qdf, term_stats=ts)).collect()}
    want = {(d, 1) for d, t in DOCS if _py_matches(t, "fox den")}
    assert got == want and want == {(3, 1)}


def test_or_clauses_compile_to_multiple_rows(spark):
    qdf = spark.createDataFrame([(7, "a OR b c")],
                                "query_id long, query string")
    rows = compile_percolator(qdf).collect()
    assert sorted(tuple(r["req_terms"]) for r in rows) == \
        [("a",), ("b", "c")]
