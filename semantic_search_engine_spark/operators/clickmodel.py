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

__all__ = ["position_ctr", "coec_relevance", "implicit_judgments"]

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
