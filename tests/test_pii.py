"""PII scrubbing (X85): counts and redaction pinned against Python re
with the identical patterns, plus precision cases (what must NOT
match)."""
from __future__ import annotations

import re

import pytest

from semantic_search_engine_spark.operators.pii import (
    PII_PATTERNS,
    pii_signals,
    redact_pii,
    scrub_pii,
)

DOCS = [
    (0, "contact me at jane.doe+spam@example.co.uk or on "
        "+1 555-123-4567 anytime"),
    (1, "server at 192.168.1.100 and 8.8.8.8; port 8080 stays"),
    (2, "card 4111111111111111 leaked; order #123456789012345"),
    (3, "prices: 19.99 USD, year 2024, zip 94103 — no pii here"),
    (4, "multi: a@b.io c@d.org and (020) 7946 0958 plus 10.0.0.1"),
    (5, ""),
    (6, None),
]


def _py_count(text, pat):
    return len(re.findall(pat, text)) if text else 0


def _py_redact(text):
    if text is None:
        return None
    for _n, pat, repl in PII_PATTERNS:
        text = re.sub(pat, repl, text)
    return text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_counts_match_python(docs):
    got = {r["doc_id"]: r for r in pii_signals(docs).collect()}
    for did, text in DOCS:
        for name, pat, _repl in PII_PATTERNS:
            assert got[did][f"n_{name}"] == _py_count(text, pat), \
                (did, name)
        assert got[did]["n_pii_total"] == sum(
            _py_count(text, p) for _n, p, _r in PII_PATTERNS)


def test_redaction_matches_python(docs):
    got = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    for did, text in DOCS:
        assert got[did] == _py_redact(text), did


def test_precision_no_false_positives(docs):
    row = {r["doc_id"]: r for r in pii_signals(docs).collect()}[3]
    assert row["n_pii_total"] == 0
    clean = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert clean[3] == DOCS[3][1]          # untouched
    assert "port 8080 stays" in clean[1]   # port number survives


def test_recall_expected_matches(docs):
    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert "<EMAIL>" in red[0] and "jane" not in red[0]
    assert "<PHONE>" in red[0]
    assert red[1].count("<IP>") == 2
    assert "<NUMBER>" in red[2] and "4111111111111111" not in red[2]
    assert red[4].count("<EMAIL>") == 2


def test_scrub_drop_threshold(docs):
    kept = {r["doc_id"] for r in scrub_pii(docs, drop_over=2).collect()}
    # doc 4 has 4 PII hits (2 emails + phone + ip) -> dropped
    assert 4 not in kept
    assert {0, 1, 2, 3, 5, 6} <= kept
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[0]["n_email"] == 1          # audit columns survive
    assert "<EMAIL>" in out[0]["text"]
    assert out[6]["text"] is None          # NULL passthrough
