"""Click-model relevance from impression logs (X118) — the implicit-
judgment leg of the evaluation/training loop.

The reference logs searches (``data-pipeline/database.py:63-69``) but
judges quality by eyeball; real deployments close the loop from CLICKS.
Raw click-through rate is position-biased — users examine rank 1 far
more than rank 5 (the examination hypothesis, Craswell et al. '08,
"An experimental comparison of click position-bias models") — so a
mediocre doc pinned at rank 1 out-CTRs a good doc at rank 5. The
standard correction is COEC, Clicks Over Expected Clicks (Zhang &
Jones '07, "Comparing click logs and editorial labels"): normalize a
(query, doc)'s clicks by the clicks EXPECTED from the positions it was
shown at, where the expectation is the fleet-wide CTR-by-position
curve. COEC ≈ 1 means "as clicked as an average result shown at those
positions"; > 1 means better than position explains.

Input is the impression log every serving frontend writes, one row per
(search, result) cell::

    query_id bigint   -- normalized-query key (hash the analyzer-grid
                         text upstream, e.g. xxhash64(norm_query))
    doc_id   bigint
    position int      -- 1-based rank at which the doc was shown
    clicked  int      -- 0/1 (or a count; summed either way)

Outputs compose with :mod:`.rank_eval` and :mod:`.mining` — the whole
loop becomes: serve (logs) → :func:`implicit_judgments` → ``rank_eval``
(quality dashboard) + ``training_triples`` (X117) → retrain (X112 LTR /
X115 / X116).

Scale notes (10^9 impressions/day)
----------------------------------
- :func:`position_ctr` is one map-side-combined groupBy on ``position``
  — output ≤ serving depth rows, broadcast everywhere else.
- :func:`coec_relevance` is ONE shuffle keyed (query_id, doc_id) after
  the broadcast propensity join; counts combine map-side. Head queries
  skew the QUERY key, not the (query, doc) pair key — each group is
  one doc's cells, bounded by that doc's impression count per
  aggregation slice, and sums are associative so the combiner absorbs
  the volume.
- Everything is pure JVM expressions — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["position_ctr", "coec_relevance", "implicit_judgments",
           "ips_policy_estimate"]

_COLS = ("query_id", "doc_id", "position", "clicked")


def _checked(impressions: DataFrame) -> DataFrame:
    missing = [c for c in _COLS if c not in impressions.columns]
    if missing:
        raise ValueError(f"impressions log is missing columns {missing}; "
                         f"expected {list(_COLS)}")
    return impressions.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("position").cast("int").alias("position"),
        F.col("clicked").cast("double").alias("clicked"))


def position_ctr(impressions: DataFrame) -> DataFrame:
    """The examination-propensity curve: (position, n_impressions,
    n_clicks, ctr) — fleet-wide CTR at each display position, the
    denominator model COEC normalizes by. One groupBy on a key with ≤
    serving-depth distinct values."""
    return (_checked(impressions)
            .groupBy("position")
            .agg(F.count(F.lit(1)).alias("n_impressions"),
                 F.sum("clicked").alias("n_clicks"))
            .withColumn("ctr", F.col("n_clicks") / F.col("n_impressions"))
            .orderBy("position"))


def coec_relevance(impressions: DataFrame) -> DataFrame:
    """Position-debiased relevance per (query_id, doc_id): (query_id,
    doc_id, n_impressions, n_clicks, expected_clicks, coec).

    ``coec = Σ clicks / Σ ctr(position shown)`` — the doc's clicks over
    the clicks an average result would have collected from the same
    display positions. Pairs whose every impression landed on a
    zero-CTR position have no signal and are dropped (expected = 0;
    0/0 says nothing about relevance)."""
    imp = _checked(impressions)
    prop = position_ctr(imp).select("position", "ctr")
    return (imp.join(F.broadcast(prop), "position")
            .groupBy("query_id", "doc_id")
            .agg(F.count(F.lit(1)).alias("n_impressions"),
                 F.sum("clicked").alias("n_clicks"),
                 F.sum("ctr").alias("expected_clicks"))
            .filter(F.col("expected_clicks") > 0)
            .withColumn("coec",
                        F.col("n_clicks") / F.col("expected_clicks")))


def implicit_judgments(impressions: DataFrame,
                       min_impressions: int = 10,
                       thresholds: tuple = (0.5, 1.0, 1.5, 2.0)
                       ) -> DataFrame:
    """COEC bucketed into the graded-judgment shape rank_eval (X66) and
    the miners (X117) consume: (query_id, doc_id, grade), grade = how
    many of ``thresholds`` the pair's COEC reaches (default grid:
    ≥2× expected clicks → grade 4, ≥1× → grade 2, never clicked → 0).
    ``min_impressions`` drops low-traffic pairs whose COEC is noise —
    the standard confidence gate."""
    thr = sorted(float(t) for t in thresholds)
    rel = (coec_relevance(impressions)
           .filter(F.col("n_impressions") >= int(min_impressions)))
    grade = sum((F.col("coec") >= F.lit(t)).cast("int") for t in thr)
    return rel.select("query_id", "doc_id",
                      grade.alias("grade"),
                      "coec", "n_impressions")


def ips_policy_estimate(impressions: DataFrame,
                        new_ranking: DataFrame) -> DataFrame:
    """Offline (counterfactual) evaluation of a NEW ranking policy from
    clicks logged under the OLD one — inverse propensity scoring under
    the position-based model (Joachims et al. '17, "Unbiased
    learning-to-rank with biased feedback"): a logged click on (q, d)
    shown at ``position`` counts ``exam(new_rank)/exam(old_position)``
    clicks for the new policy, where the examination propensity is the
    fleet CTR-by-position curve normalized to position 1 (the standard
    PBM proxy; valid insofar as average relevance is position-balanced
    in the log). Answers "would the reranker (X116) / new LTR model
    (X112) raise CTR?" BEFORE an A/B test.

    ``new_ranking``: (query_id, doc_id, rank) — or score, ranked by the
    engine's (score DESC, doc_id ASC) tie-break. (query, doc) pairs the
    new policy does not rank get examination 0 (never shown → never
    clicked).

    Returns ONE row: (n_impressions, n_clicks, logged_ctr, ips_ctr,
    snips_ctr, ess) — ``ips_ctr`` is the new policy's estimated clicks
    per logged impression on the same query traffic (identity ranking ⇒
    ips_ctr == logged_ctr exactly); ``snips_ctr`` is the
    self-normalized estimator (Swaminathan & Joachims '15: Σ clicked·w
    / Σ w over ALL impressions) — biased but lower-variance, and robust
    to the new policy examining more or less total traffic than the old
    one; ``ess`` the effective sample size of the clicked, reweighted
    rows ((Σw)²/Σw², Kong '92) — the confidence diagnostic; a high
    estimate carried by a tiny ESS is noise.

    Scale: one broadcast of the ≤-depth propensity curve joined twice,
    one (query_id, doc_id) equi-join to the new ranking (both sides
    keyed alike), one map-side-combined global aggregate. Pure JVM.
    """
    from .mining import _with_rank

    imp = _checked(impressions)
    prop = position_ctr(imp).select("position", "ctr")
    # normalize to exam(1) = 1.0 — a pure scale choice; it cancels in
    # the ratio but keeps the weights interpretable
    base = prop.orderBy("position").limit(1).select(
        F.col("ctr").alias("_base"))
    exam = (prop.crossJoin(F.broadcast(base))
            .select("position",
                    F.when(F.col("_base") > 0,
                           F.col("ctr") / F.col("_base"))
                    .otherwise(F.lit(0.0)).alias("exam")))
    new = _with_rank(new_ranking).select(
        "query_id", "doc_id", F.col("rank").alias("new_rank"))
    j = (imp.join(F.broadcast(exam), "position")
         .withColumnRenamed("exam", "exam_old")
         .join(new, ["query_id", "doc_id"], "left")
         .join(F.broadcast(exam.withColumnRenamed("position",
                                                  "new_rank")
                           .withColumnRenamed("exam", "exam_new")),
               "new_rank", "left")
         # unranked under the new policy, or ranked past any logged
         # display depth (no curve sample) → examined with prob. 0
         .withColumn("exam_new", F.coalesce("exam_new", F.lit(0.0)))
         .withColumn("w", F.when(F.col("exam_old") > 0,
                                 F.col("exam_new") / F.col("exam_old"))
                     .otherwise(F.lit(0.0))))
    return j.agg(
        F.count(F.lit(1)).alias("n_impressions"),
        F.sum("clicked").cast("long").alias("n_clicks"),
        (F.sum("clicked") / F.count(F.lit(1))).alias("logged_ctr"),
        (F.sum(F.col("clicked") * F.col("w"))
         / F.count(F.lit(1))).alias("ips_ctr"),
        F.when(F.sum("w") > 0,
               F.sum(F.col("clicked") * F.col("w")) / F.sum("w"))
        .otherwise(F.lit(0.0)).alias("snips_ctr"),
        F.when(F.sum(F.col("clicked") * F.col("w") * F.col("w")) > 0,
               F.pow(F.sum(F.col("clicked") * F.col("w")), 2)
               / F.sum(F.col("clicked") * F.col("w") * F.col("w")))
        .otherwise(F.lit(0.0)).alias("ess"))
