"""Repeated-span dedup (X77): window hashing, maximal-span merging, and
Lee-et-al-style keeper removal, pinned against a direct Python oracle
on planted shared passages."""
from __future__ import annotations

import re

import pytest

from semantic_search_engine_spark.operators.spandup import (
    remove_repeated_spans,
    repeated_ngram_spans,
)

N = 5  # window size for tests (production default is 50)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
DOCS = [
    (0, f"unique zero one two {SHARED} tail0 tail1"),
    (1, f"start {SHARED} middle other words here now"),
    (2, "totally distinct content with no overlap at all ok"),
    (3, f"{SHARED}"),                        # the bare passage
    (4, "self self self self self self self self self"),  # self-repeat
    (5, "short doc"),                        # < N tokens: no windows
    (6, None),
]


def _tok(t):
    return re.findall(r"[a-z0-9]+", t.lower()) if t else []


def _py_windows(docs, n):
    out = {}
    for d, t in docs:
        toks = _tok(t)
        for s in range(0, max(0, len(toks) - n + 1)):
            out.setdefault(" ".join(toks[s:s + n]), []).append((d, s))
    return out


def _py_spans(docs, n):
    """(doc, start, length) maximal merged duplicated spans."""
    wins = _py_windows(docs, n)
    dup_pos = {}
    for _k, occ in wins.items():
        if len(occ) >= 2:
            for d, s in occ:
                dup_pos.setdefault(d, set()).add(s)
    spans = set()
    for d, starts in dup_pos.items():
        ss = sorted(starts)
        run_start, prev = ss[0], ss[0]
        for s in ss[1:]:
            if s == prev + 1:
                prev = s
                continue
            spans.add((d, run_start, prev - run_start + n))
            run_start = prev = s
        spans.add((d, run_start, prev - run_start + n))
    return spans


def _py_removed(docs, n):
    """doc -> kept token list under the keeper rule."""
    wins = _py_windows(docs, n)
    drop: dict[int, set] = {}
    for _k, occ in wins.items():
        if len(occ) < 2:
            continue
        keeper = min(occ)
        for d, s in occ:
            if (d, s) == keeper:
                continue
            toks = _tok(dict(docs)[d])
            drop.setdefault(d, set()).update(
                range(s, min(s + n, len(toks))))
    out = {}
    for d, t in docs:
        toks = _tok(t)
        if not toks:
            continue
        dd = drop.get(d, set())
        out[d] = [tok for i, tok in enumerate(toks) if i not in dd]
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_spans_match_oracle(spark, docs_df):
    got = {(r["doc_id"], r["start"], r["length"])
           for r in repeated_ngram_spans(docs_df, n=N).collect()}
    want = _py_spans(DOCS, N)
    assert got == want
    # the 8-token shared passage surfaces as ONE maximal span of 8
    assert any(d == 3 and ln == 8 for d, _s, ln in got)
    # the self-repeating doc is caught without any cross-doc partner
    assert any(d == 4 for d, _s, _l in got)


def test_removal_matches_oracle(spark, docs_df):
    got = {r["doc_id"]: (list(r["tokens_kept"]), r["n_tokens"],
                         r["n_removed"])
           for r in remove_repeated_spans(docs_df, n=N).collect()}
    want = _py_removed(DOCS, N)
    assert set(got) == set(want)
    for d, toks in want.items():
        kept, n_tokens, n_removed = got[d]
        assert kept == toks, d
        assert n_tokens == len(_tok(dict(DOCS)[d]))
        assert n_removed == n_tokens - len(kept)
    # exactly one copy of the shared passage survives corpus-wide
    total = sum(" ".join(k).count(SHARED) for k, _n, _r in got.values())
    assert total == 1
    # untouched docs pass through complete
    assert got[2][2] == 0 and got[2][0] == _tok(DOCS[2][1])
    assert got[5][0] == ["short", "doc"]


def test_no_duplicates_yields_empty(spark):
    df = spark.createDataFrame(
        [(0, "one two three four five six"),
         (1, "seven eight nine ten eleven twelve")],
        "doc_id long, text string")
    assert repeated_ngram_spans(df, n=N).count() == 0
    got = {r["doc_id"]: r["n_removed"]
           for r in remove_repeated_spans(df, n=N).collect()}
    assert got == {0: 0, 1: 0}
