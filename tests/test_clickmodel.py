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
    ips_policy_estimate,
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


# ------------------------------------------------ IPS policy estimate
def _balanced_log(spark, n=400):
    """Impression log where every position's traffic has the SAME
    average relevance, so the pooled CTR curve is EXACTLY proportional
    to the examination propensities (1.0/0.5/0.25) and the IPS
    arithmetic is closed-form. Two relevance levels (0.8, 0.2) rotate
    through all three positions under distinct query_ids; query 1 is
    the pair whose policy swap the tests evaluate."""
    exam = {1: 1.00, 2: 0.50, 3: 0.25}
    cells = [(1, 100, 1, n, int(exam[1] * 0.2 * n)),   # A rel .2 at pos1
             (1, 200, 3, n, int(exam[3] * 0.8 * n))]   # B rel .8 at pos3
    qid = 10
    for rel, doc in ((0.8, 300), (0.2, 301)):
        for pos in (1, 2, 3):
            cells.append((qid, doc + 10 * pos, pos, n,
                          int(exam[pos] * rel * n)))
            qid += 1
    # rebalance positions 1 and 3 so every position's mean relevance is
    # 0.5: query 1's A (rel .2) sits at pos1 and B (rel .8) at pos3, so
    # add a rel-.8 pos1 doc and a rel-.2 pos3 doc
    cells.append((qid, 400, 1, n, int(exam[1] * 0.8 * n))); qid += 1
    cells.append((qid, 401, 3, n, int(exam[3] * 0.2 * n)))
    return _simulate(spark, cells), exam, n, cells


def test_ips_identity_policy_reproduces_logged_ctr(spark):
    imp, exam, n, cells = _balanced_log(spark)
    # identity: every (query, doc) ranked exactly where it was shown
    ident = spark.createDataFrame(
        [(q, d, p) for q, d, p, _n, _c in cells],
        "query_id long, doc_id long, rank int")
    row = ips_policy_estimate(imp, ident).collect()[0]
    assert row["ips_ctr"] == pytest.approx(row["logged_ctr"], rel=1e-12)
    # identity weights are all 1 ⇒ the self-normalized estimator
    # coincides with both (Σw = n_impressions)
    assert row["snips_ctr"] == pytest.approx(row["logged_ctr"],
                                             rel=1e-12)
    assert row["n_impressions"] == sum(c[3] for c in cells)


def test_ips_predicts_swap_gain_closed_form(spark):
    """Swapping query 1's mis-ordered pair (rel-.2 doc at rank 1,
    rel-.8 doc at rank 3) must be predicted to GAIN clicks, and the
    estimate must match the closed-form examination arithmetic."""
    imp, exam, n, cells = _balanced_log(spark)
    swapped = [(q, d, {1: 3, 3: 1}.get(p, p) if q == 1 else p)
               for q, d, p, _n, _c in cells]
    new = spark.createDataFrame(swapped,
                                "query_id long, doc_id long, rank int")
    row = ips_policy_estimate(imp, new).collect()[0]
    # closed form: clicks reweighted by exam(new)/exam(old) — exact
    # because the balanced log makes the CTR curve proportional to exam
    w = {1: exam[3] / exam[1], 3: exam[1] / exam[3]}
    est_clicks = sum(c * (w[p] if q == 1 else 1.0)
                     for q, d, p, _n, c in cells)
    n_imp = sum(c[3] for c in cells)
    assert row["ips_ctr"] == pytest.approx(est_clicks / n_imp, rel=1e-9)
    assert row["ips_ctr"] > row["logged_ctr"]   # the swap is a win
    assert row["ess"] > 0


def test_ips_unranked_docs_get_zero_examination(spark):
    imp, exam, n, cells = _balanced_log(spark)
    # new policy ranks NOTHING for query 1 → its clicks contribute 0
    rest = [(q, d, p) for q, d, p, _n, _c in cells if q != 1]
    new = spark.createDataFrame(rest,
                                "query_id long, doc_id long, rank int")
    row = ips_policy_estimate(imp, new).collect()[0]
    kept = sum(c for q, _d, _p, _n2, c in cells if q != 1)
    n_imp = sum(c[3] for c in cells)
    assert row["ips_ctr"] == pytest.approx(kept / n_imp, rel=1e-9)


def test_ips_accepts_score_ranked_policy(spark):
    """A score column works like everywhere else (rank derived by
    score DESC, doc_id ASC per query — note row_number yields DENSE
    per-query ranks 1..m, so the explicit-rank equivalent of score=-p
    is each query's docs renumbered in position order)."""
    imp, exam, n, cells = _balanced_log(spark)
    dense = []
    byq: dict[int, list] = {}
    for q, d, p, _n, _c in cells:
        byq.setdefault(q, []).append((p, d))
    for q, docs in byq.items():
        for r, (_p, d) in enumerate(sorted(docs), start=1):
            dense.append((q, d, r))
    explicit = spark.createDataFrame(
        dense, "query_id long, doc_id long, rank int")
    scored = spark.createDataFrame(
        [(q, d, float(-p)) for q, d, p, _n, _c in cells],
        "query_id long, doc_id long, score double")
    a = ips_policy_estimate(imp, explicit).collect()[0]
    b = ips_policy_estimate(imp, scored).collect()[0]
    assert b["ips_ctr"] == pytest.approx(a["ips_ctr"], rel=1e-12)


def test_snips_closed_form_on_swap(spark):
    """SNIPS = sum(clicked*w) / sum(w) over ALL impressions — verify to
    closed form on the swap policy and that it lands between the two
    unnormalized readings when the new policy examines more traffic."""
    imp, exam, n, cells = _balanced_log(spark)
    swapped = [(q, d, {1: 3, 3: 1}.get(p, p) if q == 1 else p)
               for q, d, p, _n, _c in cells]
    new = spark.createDataFrame(swapped,
                                "query_id long, doc_id long, rank int")
    row = ips_policy_estimate(imp, new).collect()[0]
    w = {1: exam[3] / exam[1], 3: exam[1] / exam[3]}
    num = sum(c * (w[p] if q == 1 else 1.0)
              for q, d, p, _n, c in cells)
    den = sum(_n * (w[p] if q == 1 else 1.0)
              for q, d, p, _n, _c in cells)
    assert row["snips_ctr"] == pytest.approx(num / den, rel=1e-9)
