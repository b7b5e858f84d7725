"""Stupid-Backoff n-gram LM perplexity (SURVEY.md §2.3 X63): the CCNet
quality stage, pinned against a single-node count-and-score oracle."""
from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.lm import (
    StupidBackoffLM,
    filter_by_perplexity,
    score_docs,
    train_bigram_lm,
)

SF_DIR = "/root/testdata/sf0.01"
ALPHA = 0.4


def _tok(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def lm(docs):
    return train_bigram_lm(docs)


@pytest.fixture(scope="module")
def py_model(docs):
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for r in docs.select("text").collect():
        if r["text"] is None:
            continue
        t = _tok(r["text"])
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    return uni, big, sum(uni.values())


def _py_score(tokens: list[str], uni, big, total) -> float:
    def s1(w):
        return math.log(uni.get(w, 1) / total) if uni.get(w, 0) == 0 \
            else math.log(uni[w] / total)

    lp = 0.0
    for i, w in enumerate(tokens):
        if i == 0:
            lp += s1(w)
        elif (tokens[i - 1], w) in big:
            lp += math.log(big[(tokens[i - 1], w)]
                           / uni[tokens[i - 1]])
        else:
            lp += math.log(ALPHA) + s1(w)
    return lp


def test_train_counts_match_python(lm, py_model):
    uni, big, total = py_model
    assert lm.total_tokens == total
    got_uni = {r["w"]: r["c"] for r in lm.unigrams.collect()}
    assert got_uni == uni
    got_big = {(r["prev"], r["w"]): (r["c"], r["c_prev"])
               for r in lm.bigrams.collect()}
    assert {k: v[0] for k, v in got_big.items()} == big
    # pre-joined denominators are the prev-word unigram counts
    assert all(v[1] == uni[k[0]] for k, v in got_big.items())


def test_scores_match_python_oracle(docs, lm, py_model):
    uni, big, total = py_model
    got = {int(r["doc_id"]): (r["n_tokens"], r["logscore"], r["ppl"])
           for r in score_docs(docs, lm).collect()}
    checked = 0
    for r in docs.select("doc_id", "text").collect():
        if r["text"] is None or not _tok(r["text"]):
            assert int(r["doc_id"]) not in got
            continue
        toks = _tok(r["text"])
        n, lp, ppl = got[int(r["doc_id"])]
        assert n == len(toks)
        want = _py_score(toks, uni, big, total)
        assert lp == pytest.approx(want, rel=1e-9)
        assert ppl == pytest.approx(math.exp(-want / len(toks)), rel=1e-9)
        checked += 1
    assert checked > 100


def test_scores_deterministic_across_runs(docs, lm):
    a = {int(r["doc_id"]): r["logscore"]
         for r in score_docs(docs, lm).collect()}
    b = {int(r["doc_id"]): r["logscore"]
         for r in score_docs(docs.repartition(7), lm).collect()}
    assert a == b  # bit-identical: position-ordered fold


def test_oov_and_backoff_paths(spark, docs, lm, py_model):
    uni, big, total = py_model
    # two seen words that are never adjacent + one OOV word
    seen = sorted(uni)
    a, b = seen[0], seen[-1]
    if (a, b) in big:  # pick a guaranteed non-adjacent pair
        b = next(w for w in reversed(seen) if (a, w) not in big)
    probe = spark.createDataFrame(
        [(1, f"{a} {b}"), (2, "zzzzqqqqxxxx"), (3, None)],
        "doc_id long, text string")
    got = {int(r["doc_id"]): r["logscore"]
           for r in score_docs(probe, lm).collect()}
    want_1 = (math.log(uni[a] / total)
              + math.log(ALPHA) + math.log(uni[b] / total))
    assert got[1] == pytest.approx(want_1, rel=1e-12)
    assert got[2] == pytest.approx(math.log(1 / total), rel=1e-12)
    assert 3 not in got  # null text unscored


def test_perplexity_gate(docs, lm):
    scored = score_docs(docs, lm)
    med = scored.approxQuantile("ppl", [0.5], 0.0)[0]
    kept = filter_by_perplexity(docs, lm, med)
    n_kept = kept.count()
    n_scored = scored.count()
    assert 0 < n_kept < n_scored
    # every survivor really scores at or under the threshold
    surv = {int(r["doc_id"]) for r in kept.select("doc_id").collect()}
    for r in scored.collect():
        if int(r["doc_id"]) in surv:
            assert r["ppl"] <= med + 1e-12
