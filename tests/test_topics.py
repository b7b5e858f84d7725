"""Keyword-taxonomy topic labeling (X95): scores and argmax labels
pinned against a Python oracle; composes with temperature sampling."""
from __future__ import annotations

import re

import pytest

from semantic_search_engine_spark.operators.topics import (
    label_topics,
    topic_scores,
)

TAX = {
    "sports": ["football", "goal", "league", "match"],
    "tech": ["software", "gpu", "kernel", "compiler"],
    "food": ["recipe", "oven", "flour", "bake"],
}

DOCS = [
    (0, "the football match ended with a late goal in the league"),
    (1, "the compiler emits gpu kernel code for the software stack"),
    (2, "Bake the flour mix in the oven; the recipe needs an oven"),
    (3, "a football article about gpu software and one goal"),  # mixed
    (4, "nothing from any taxonomy appears in this one"),
    (5, ""),
    (6, None),
]


def _tok(t):
    return re.findall(r"[a-z0-9]+", t.lower()) if t else []


def _py_scores(text):
    toks = _tok(text)
    if not toks:
        return None
    return {t: sum(1 for w in toks if w in set(k)) / len(toks)
            for t, k in TAX.items()}


def _py_label(text, min_score=0.0):
    s = _py_scores(text)
    if s is None:
        return None, None
    top = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return top if top[1] > min_score else (None, None)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_match_oracle(docs):
    got = {r["doc_id"]: r for r in topic_scores(docs, TAX).collect()}
    for did, text in DOCS:
        want = _py_scores(text)
        for t in TAX:
            g = got[did][f"score_{t}"]
            if want is None:
                assert g is None, (did, t)
            else:
                assert g == pytest.approx(want[t], abs=1e-12), (did, t)


def test_labels_match_oracle(docs):
    got = {r["doc_id"]: (r["topic"], r["topic_score"])
           for r in label_topics(docs, TAX).collect()}
    for did, text in DOCS:
        wt, ws = _py_label(text)
        assert got[did][0] == wt, did
        if ws is not None:
            assert got[did][1] == pytest.approx(ws, abs=1e-12)
    # mixed doc: 2 sports tokens vs 2 tech tokens out of 9 -> tie,
    # lexicographically first topic wins
    assert got[3][0] == "sports"
    assert got[4] == (None, None)


def test_min_score_gate(docs):
    got = {r["doc_id"]: r["topic"]
           for r in label_topics(docs, TAX, min_score=0.3).collect()}
    # doc 0: 4 matches / 11 tokens = 0.364 > 0.3 -> labeled
    assert got[0] == "sports"
    # doc 3: 4/9 = 0.444 for neither single topic (2/9 each) -> NULL
    assert got[3] is None


def test_taxonomy_validation(docs):
    with pytest.raises(ValueError):
        label_topics(docs, {})
    with pytest.raises(ValueError):
        label_topics(docs, {"empty": []})


def test_composes_with_temperature_sampling(spark):
    from semantic_search_engine_spark.operators.mixture import (
        temperature_sample,
    )
    rows = [(i, "football goal match league" if i % 4 else
             "compiler gpu kernel software") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labeled = label_topics(docs, TAX)
    sampled = temperature_sample(labeled, "topic", 0.0, 20,
                                 id_col="doc_id")
    by = {r["topic"]: 0 for r in sampled.collect()}
    for r in sampled.collect():
        by[r["topic"]] += 1
    assert by == {"sports": 10, "tech": 10}
