"""Click-model relevance (operators/clickmodel.py, X118).

The load-bearing pin is the position-bias demonstration: impressions
generated from a KNOWN examination × relevance model, where raw CTR
ranks the documents wrongly and COEC recovers the planted relevance
order. Plus closed-form value checks, the confidence gate, the grade
grid, and composition with rank_eval/mining (the judgments the model
emits must be consumable downstream unchanged).
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from semantic_search_engine_spark.operators.clickmodel import (
    coec_relevance,
    implicit_judgments,
    position_ctr,
)

IMP_SCHEMA = "query_id long, doc_id long, position int, clicked int"


def _simulate(spark, cells):
    """cells: list of (query_id, doc_id, position, n_impressions,
    n_clicks) — expanded to one row per impression with exact click
    counts (deterministic: no sampling noise)."""
    rows = []
    for q, d, pos, n, c in cells:
        assert c <= n
        rows.extend([(q, d, pos, 1)] * c + [(q, d, pos, 0)] * (n - c))
    return spark.createDataFrame(rows, IMP_SCHEMA)


def test_position_ctr_closed_form(spark):
    imp = _simulate(spark, [(1, 10, 1, 10, 5),
                            (2, 20, 1, 10, 3),
                            (1, 11, 2, 10, 2)])
    got = {r["position"]: (r["n_impressions"], r["n_clicks"], r["ctr"])
           for r in position_ctr(imp).collect()}
    assert got[1] == (20, 5 + 3, pytest.approx(8 / 20))
    assert got[2] == (10, 2, pytest.approx(2 / 10))


def test_coec_corrects_position_bias(spark):
    """Examination model: positions 1/2/3 examined with propensity
    1.0/0.5/0.25; doc A (relevance 0.3) always shown at rank 1, doc B
    (relevance 0.8) always at rank 3. Raw CTR ranks A over B; COEC
    ranks B over A — the whole point of the model."""
    n = 400
    # clicks = examination * relevance * n, exact integers
    cells = [
        (1, 100, 1, n, int(1.00 * 0.3 * n)),   # A: ctr .30
        (1, 200, 3, n, int(0.25 * 0.8 * n)),   # B: ctr .08
    ]
    # background traffic pinning the position curve: eight queries each
    # rotating a relevance-0.5 doc through all three positions, so A/B
    # are a small share of their own position's pooled CTR (COEC's
    # ratio recovery assumes the item doesn't dominate the curve)
    exam = {1: 1.00, 2: 0.50, 3: 0.25}
    for i in range(8):
        for pos in (1, 2, 3):
            cells.append((10 + i * 3 + pos, 300 + i, pos, n,
                          int(exam[pos] * 0.5 * n)))
    imp = _simulate(spark, cells)
    rel = {(r["query_id"], r["doc_id"]): r
           for r in coec_relevance(imp).collect()}
    a, b = rel[(1, 100)], rel[(1, 200)]
    raw_ctr_a = a["n_clicks"] / a["n_impressions"]
    raw_ctr_b = b["n_clicks"] / b["n_impressions"]
    assert raw_ctr_a > raw_ctr_b          # the bias
    assert b["coec"] > a["coec"]          # the correction
    # and the corrected ratio reflects the planted relevance ratio
    # (B/A = 0.8/0.3) far better than the raw one does
    assert b["coec"] / a["coec"] == pytest.approx(0.8 / 0.3, rel=0.15)


def test_coec_closed_form_exact(spark):
    """Hand-computable instance: verify coec to exact fractions."""
    cells = [(1, 10, 1, 4, 2),   # pos1 curve: (2+1)/(4+4)
             (2, 20, 1, 4, 1),
             (1, 11, 2, 4, 1)]   # pos2 curve: 1/4
    imp = _simulate(spark, cells)
    rel = {(r["query_id"], r["doc_id"]): r
           for r in coec_relevance(imp).collect()}
    ctr1, ctr2 = Fraction(3, 8), Fraction(1, 4)
    want_a = Fraction(2) / (4 * ctr1)
    assert rel[(1, 10)]["coec"] == pytest.approx(float(want_a))
    assert rel[(1, 10)]["expected_clicks"] == pytest.approx(
        float(4 * ctr1))
    assert rel[(1, 11)]["coec"] == pytest.approx(float(Fraction(1)
                                                       / (4 * ctr2)))


def test_zero_ctr_position_pairs_dropped(spark):
    """A pair only ever shown at positions nobody clicks carries no
    signal — it must be absent, not scored 0/0."""
    imp = _simulate(spark, [(1, 10, 5, 20, 0),    # pos 5: zero clicks
                            (2, 20, 1, 20, 10)])  # keeps pos-1 curve > 0
    keys = {(r["query_id"], r["doc_id"])
            for r in coec_relevance(imp).collect()}
    assert (1, 10) not in keys and (2, 20) in keys


def test_judgment_grades_and_confidence_gate(spark):
    n = 100
    cells = [
        (1, 100, 1, n, 50),      # coec 1.0 vs pooled curve -> mid grade
        (1, 101, 1, n, 0),       # never clicked -> grade 0
        (1, 102, 1, 4, 4),       # high coec but only 4 impressions
        (2, 200, 1, n, 100),     # coec 2.0-ish -> top grade
    ]
    imp = _simulate(spark, cells)
    jud = {(r["query_id"], r["doc_id"]): r
           for r in implicit_judgments(imp, min_impressions=10).collect()}
    assert (1, 102) not in jud               # confidence gate
    assert jud[(1, 101)]["grade"] == 0
    assert jud[(2, 200)]["grade"] > jud[(1, 100)]["grade"] > 0
    assert all(0 <= r["grade"] <= 4 for r in jud.values())


def test_missing_column_refusal(spark):
    bad = spark.createDataFrame([(1, 2, 3)],
                                "query_id long, doc_id long, position int")
    with pytest.raises(ValueError, match="clicked"):
        position_ctr(bad)


def test_composes_with_rank_eval_and_mining(spark):
    """The emitted judgments drive rank_eval and the X117 miner without
    any adaptation: the clicked-enough doc is the positive, the shown-
    but-unclicked doc becomes the mined hard negative."""
    from semantic_search_engine_spark.operators.mining import (
        training_triples,
    )
    from semantic_search_engine_spark.operators.rank_eval import rank_eval

    n = 100
    imp = _simulate(spark, [(1, 10, 1, n, 80),
                            (1, 11, 2, n, 0),
                            (2, 20, 1, n, 70)])
    jud = implicit_judgments(imp, min_impressions=10)
    results = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 4.0), (2, 20, 3.0), (2, 21, 2.0)],
        "query_id int, doc_id long, score double")
    per_q = {r["query_id"]: r
             for r in rank_eval(results, jud, k=10).collect()}
    assert per_q[1]["precision"] > 0 and per_q[1]["mrr"] == 1.0
    triples = {(r["query_id"], r["pos_doc_id"], r["neg_doc_id"])
               for r in training_triples(results, jud, n_neg=3).collect()}
    assert (1, 10, 11) in triples            # clicked pos, unclicked neg
    assert (2, 20, 21) in triples            # unjudged retrieved doc
