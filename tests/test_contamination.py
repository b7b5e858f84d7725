"""Benchmark decontamination (X82): eval n-gram hashing, contaminated-doc
detection, and drop/mark policies, pinned against a hash-free Python
string oracle on planted eval passages."""
from __future__ import annotations

import re

import pytest

from semantic_search_engine_spark.operators.contamination import (
    contaminated_docs,
    decontaminate,
    eval_ngram_hashes,
)

N = 5  # window size for tests (production default is 13)

EVAL = [
    (100, "alpha beta gamma delta epsilon zeta"),        # 6 tokens
    (101, "one two three four"),                         # 4 = whole-seq
    (102, "tiny bit"),                                   # < min_tokens
    (103, "nowhere appearing benchmark answer text ok"),
]
DOCS = [
    # contains eval 100's full passage (2 windows of 5 within 6 tokens)
    (0, "intro words alpha beta gamma delta epsilon zeta outro"),
    # contains only 5 of eval 100's 6 tokens -> exactly 1 window
    (1, "alpha beta gamma delta epsilon other stuff here"),
    # contains eval 101 verbatim (shorter than N -> whole-seq hash)
    (2, "prefix one two three four suffix words"),
    # contains eval 101's tokens but NOT contiguously -> no match
    (3, "one two xx three four and more filler tokens"),
    # clean
    (4, "completely clean document with no benchmark overlap at all"),
    # contains eval 102 (but eval 102 is below min_tokens -> ignored)
    (5, "tiny bit of text that should never be flagged"),
    (6, None),
]


def _tok(t):
    return re.findall(r"[a-z0-9]+", t.lower()) if t else []


def _windows_at(toks, length):
    if len(toks) < length:
        return set()
    return {" ".join(toks[s:s + length])
            for s in range(0, len(toks) - length + 1)}


def _oracle_pairs(docs, evals, n, min_tokens=4):
    """(doc_id, eval_id) -> (n_matching, n_eval_windows); each eval
    example matches at its effective window length min(n, len)."""
    out = {}
    for eid, etext in evals:
        etoks = _tok(etext)
        if len(etoks) < min_tokens:
            continue
        length = min(n, len(etoks))
        ew = _windows_at(etoks, length)
        for did, dtext in docs:
            hit = ew & _windows_at(_tok(dtext), length)
            if hit:
                out[(did, eid)] = (len(hit), len(ew))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    return docs, ev


def test_pairs_match_string_oracle(frames):
    docs, ev = frames
    got = {(r["doc_id"], r["eval_id"]):
           (r["n_matching_windows"], r["n_eval_windows"])
           for r in contaminated_docs(docs, ev, n=N).collect()}
    assert got == _oracle_pairs(DOCS, EVAL, N)


def test_overlap_frac_and_first_start(frames):
    docs, ev = frames
    rows = {(r["doc_id"], r["eval_id"]): r
            for r in contaminated_docs(docs, ev, n=N).collect()}
    full = rows[(0, 100)]
    assert full["n_matching_windows"] == 2
    assert full["n_eval_windows"] == 2
    assert full["overlap_frac"] == pytest.approx(1.0)
    # doc 0: "intro words alpha ..." -> first matching window at token 2
    assert full["first_match_start"] == 2
    partial = rows[(1, 100)]
    assert partial["n_matching_windows"] == 1
    assert partial["overlap_frac"] == pytest.approx(0.5)
    assert partial["first_match_start"] == 0


def test_short_eval_whole_sequence_matches(frames):
    docs, ev = frames
    rows = {(r["doc_id"], r["eval_id"])
            for r in contaminated_docs(docs, ev, n=N).collect()}
    assert (2, 101) in rows        # verbatim short eval matches
    assert (3, 101) not in rows    # non-contiguous tokens do not


def test_sub_min_tokens_eval_ignored(frames):
    docs, ev = frames
    h = eval_ngram_hashes(ev, n=N).collect()
    assert all(r["eval_id"] != 102 for r in h)
    rows = contaminated_docs(docs, ev, n=N).collect()
    assert all(r["eval_id"] != 102 for r in rows)


def test_drop_policy(frames):
    docs, ev = frames
    kept = sorted(r["doc_id"]
                  for r in decontaminate(docs, ev, n=N).collect())
    dirty = {d for (d, _e) in _oracle_pairs(DOCS, EVAL, N)}
    assert kept == sorted(d for (d, _t) in DOCS if d not in dirty)
    # original columns survive untouched
    assert decontaminate(docs, ev, n=N).columns == docs.columns


def test_mark_policy(frames):
    docs, ev = frames
    out = {r["doc_id"]: r
           for r in decontaminate(docs, ev, n=N, mode="mark").collect()}
    assert len(out) == len(DOCS)
    oracle = _oracle_pairs(DOCS, EVAL, N)
    dirty = {d for (d, _e) in oracle}
    for did, _t in DOCS:
        r = out[did]
        assert r["is_contaminated"] == (did in dirty)
        assert (set(r["matched_eval_ids"])
                == {e for (d, e) in oracle if d == did})
        assert (r["n_matching_windows"]
                == sum(m for (d, _e), (m, _w) in oracle.items()
                       if d == did))


def test_min_windows_threshold(frames):
    docs, ev = frames
    # doc 1 has exactly 1 matching window; min_windows=2 keeps it
    kept = {r["doc_id"]
            for r in decontaminate(docs, ev, n=N,
                                   min_windows=2).collect()}
    assert 1 in kept and 0 not in kept


def test_clean_corpus_noop(spark, frames):
    _docs, ev = frames
    clean = spark.createDataFrame(
        [(9, "nothing here relates to any benchmark content at all")],
        "doc_id long, text string")
    assert contaminated_docs(clean, ev, n=N).count() == 0
    assert decontaminate(clean, ev, n=N).count() == 1
    marked = decontaminate(clean, ev, n=N, mode="mark").collect()[0]
    assert marked["is_contaminated"] is False
    assert list(marked["matched_eval_ids"]) == []


def test_mode_validation(frames):
    docs, ev = frames
    with pytest.raises(ValueError):
        decontaminate(docs, ev, mode="purge")
