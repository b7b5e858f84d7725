"""Gopher/MassiveText quality + repetition rules (X86): the signal
kernel pinned against an independently-written Python oracle on planted
pathological documents, and the threshold filter's pass/fail logic."""
from __future__ import annotations

from collections import Counter

import pytest

from semantic_search_engine_spark.operators.gopher import (
    GOPHER_THRESHOLDS,
    gopher_filter,
    gopher_signals,
)


def _good_text():
    # 72 words, sane lengths, stopwords present, and every position
    # carries a unique token so no n-gram ever repeats
    stops = ["the", "of", "and", "that", "with", "have"]
    words = []
    for i in range(36):
        words.append(stops[i % len(stops)])
        words.append(f"tok{i:02d}abc")
    lines = [" ".join(words[i:i + 12]) for i in range(0, 72, 12)]
    return "\n".join(lines)


DOCS = [
    ("good", _good_text()),
    ("short", "only four words here"),
    ("bullets", "\n".join(["• item one of the list"] * 3
                          + ["- item two be here"] * 3
                          + ["regular line to end with"])),
    ("ellipsis", "the first line trails off...\n"
                 "and this one too…\n"
                 "but this of that line does not end so"),
    ("dup_lines", "\n".join(["this line repeats itself verbatim"] * 6
                            + ["a unique line of the text"])),
    ("dup_ngrams", ("the cat sat on the mat " * 12)
                   + "with some other unique words of note"),
    ("symbols", "# " * 30 + "the of and words..."),
    ("empty", ""),
    ("none", None),
]


# -------------------------------------------------- independent oracle

def _oracle(text):
    if text is None:
        return None
    w = text.split()
    n = len(w)
    o = {"n_words": n}
    if n == 0:
        return o
    tc = sum(map(len, w))
    o["mean_word_len"] = tc / n
    o["symbol_to_word_ratio"] = (
        (text.count("#") + text.count("...") + text.count("…")) / n)
    o["alpha_word_frac"] = sum(
        any(ch.isalpha() for ch in x) for x in w) / n
    lows = [x.lower().strip(".,;:!?\"'()[]") for x in w]
    o["n_gopher_stopwords"] = sum(
        s in lows for s in ("the", "be", "to", "of", "and", "that",
                            "have", "with"))
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    paras = [p.strip() for p in text.split("\n\n") if p.strip()]
    if lines:
        o["bullet_line_frac"] = sum(
            l[:1] in "•-*" for l in lines) / len(lines)
        o["ellipsis_line_frac"] = sum(
            l.endswith("...") or l.endswith("…")
            for l in lines) / len(lines)
    for key, items in (("line", lines), ("para", paras)):
        if not items:
            continue
        c = Counter(items)
        o[f"dup_{key}_frac"] = sum(
            c[i] >= 2 for i in items) / len(items)
        tot = sum(map(len, items))
        if tot:
            o[f"dup_{key}_char_frac"] = sum(
                len(i) for i in items if c[i] >= 2) / tot
    for m in range(2, 11):
        col = (f"top_{m}gram_char_frac" if m <= 4
               else f"dup_{m}gram_char_frac")
        if n < m:
            o[col] = 0.0
            continue
        grams = Counter(tuple(w[i:i + m]) for i in range(n - m + 1))
        if m <= 4:
            g, cnt = max(grams.items(),
                         key=lambda kv: (kv[1], sum(map(len, kv[0]))))
            o[col] = cnt * sum(map(len, g)) / tc
        else:
            o[col] = min(1.0, sum(cnt * sum(map(len, g))
                                  for g, cnt in grams.items()
                                  if cnt >= 2) / tc)
    return o


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "url string, text string")


def test_signals_match_oracle(docs):
    got = {r["url"]: r.asDict() for r in gopher_signals(docs).collect()}
    assert set(got) == {u for u, _ in DOCS}
    for u, text in DOCS:
        want = _oracle(text)
        row = got[u]
        if want is None:
            assert all(v is None for k, v in row.items() if k != "url")
            continue
        for k, v in want.items():
            if isinstance(v, float):
                assert row[k] == pytest.approx(v, abs=1e-12), (u, k)
            else:
                assert row[k] == v, (u, k)


def test_filter_pass_fail(docs):
    got = {r["url"]: r for r in gopher_filter(docs).collect()}
    assert got["good"]["gopher_pass"] is True
    assert got["good"]["failed_rules"] == []
    assert "min_words" in got["short"]["failed_rules"]
    assert "dup_line_frac" in got["dup_lines"]["failed_rules"]
    assert "symbol_to_word" in got["symbols"]["failed_rules"]
    # the repeated 6-gram phrase blows the dup-ngram family
    assert any(r.startswith("dup_") and "gram" in r
               for r in got["dup_ngrams"]["failed_rules"])
    # NULL text fails (min_words un-evaluable -> fail, not pass)
    assert got["none"]["gopher_pass"] is False
    assert got["empty"]["gopher_pass"] is False


def test_bullet_and_ellipsis_rules(docs):
    got = {r["url"]: r for r in gopher_filter(docs).collect()}
    # bullets doc: 6/7 bullet lines = 0.857 <= 0.9 -> passes that rule
    assert "bullet_lines" not in got["bullets"]["failed_rules"]
    # ellipsis doc: 2/3 = 0.667 > 0.3 -> fails
    assert "ellipsis_lines" in got["ellipsis"]["failed_rules"]


def test_custom_thresholds(docs):
    tight = {"min_words": ("n_words", ">=", 1000)}
    got = gopher_filter(docs, thresholds=tight).collect()
    assert all(not r["gopher_pass"] for r in got)
