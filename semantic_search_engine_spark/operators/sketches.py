"""Sketch-based corpus analytics — the mergeable-summary layer every
web-scale pipeline runs next to its index (distinct hosts per crawl,
vocabulary size per language, doc-length quantiles, overlap between two
crawl snapshots). All built on Spark 4's native Apache DataSketches
aggregates (``hll_sketch_agg`` / ``kll_sketch_agg_*`` /
``theta_sketch_agg`` — JVM-side, map-side-combined, mergeable), so every
function here is ONE aggregation with partial combine: the shuffle
carries |groups| sketch blobs (KB each), never the data.

Why sketches and not exact at 10^12 docs:
- exact ``countDistinct`` is a full shuffle of the distinct keys;
  HLL is a fixed-size blob per group, mergeable across days/shards —
  yesterday's sketch unions with today's without re-reading yesterday.
- exact quantiles need a global sort; KLL answers any quantile to
  rank-error eps with a KB summary.
- overlap between two corpora (|A ∩ B|, Jaccard) is a join; Theta
  sketches estimate intersection/union WITHOUT co-locating the sets —
  the crawl-vs-crawl dedup-rate estimator before committing to the
  real MinHash pass (operators/dedup.py).

Determinism: DataSketches HLL/Theta hash values, not arrival order —
estimates are reproducible across partitionings (pinned in tests).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_counts", "quantile_summary", "set_overlap"]


def distinct_counts(df: DataFrame, keys: list[str], col: str,
                    lg_k: int = 12) -> DataFrame:
    """Per-group approximate distinct count of ``col`` with the sketch
    kept for LATER union (the mergeability is the point: per-day rows
    union into per-month without rescanning). Returns
    (*keys, n_distinct, sketch). ``lg_k=12`` ⇒ ~1.6% relative standard
    error, 4 KB per group; HLL is EXACT while the group's cardinality
    stays in sparse mode (≲ a few hundred) — small groups cost nothing
    in accuracy."""
    sk = F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    out = df.groupBy(*keys).agg(sk)
    return out.select(
        *keys,
        F.hll_sketch_estimate("sketch").cast("long").alias("n_distinct"),
        "sketch")


def quantile_summary(df: DataFrame, keys: list[str], col: str,
                     probabilities: list[float] = (0.5, 0.9, 0.99),
                     k: int = 200) -> DataFrame:
    """Per-group KLL quantiles of a numeric column — doc-length /
    quality-score distributions per language without a sort. Returns
    (*keys, n, q_<p> ...). ``k=200`` ⇒ ~1.65% rank error (the
    DataSketches default)."""
    sk = F.kll_sketch_agg_double(F.col(col).cast("double"),
                                 F.lit(k)).alias("_kll")
    out = df.groupBy(*keys).agg(sk)
    cols = [F.kll_sketch_get_n_double("_kll").alias("n")]
    for p in probabilities:
        name = f"q_{str(p).replace('.', '_')}"
        cols.append(F.kll_sketch_get_quantile_double(
            "_kll", F.lit(float(p))).alias(name))
    return out.select(*keys, *cols)


def set_overlap(df_a: DataFrame, df_b: DataFrame, col: str,
                lg_k: int = 14) -> dict:
    """Estimate |A|, |B|, |A ∩ B|, |A ∪ B| and Jaccard between two
    corpora's values of ``col`` via Theta sketches — TWO independent
    scans (no join, no co-location; the operands can live in different
    warehouses) and a driver-side set operation on two KB-sized blobs.
    This is the cheap "how much does crawl N+1 duplicate crawl N"
    estimate that decides whether the full MinHash near-dup pass
    (operators/dedup.py) is worth scheduling."""
    a = df_a.agg(F.theta_sketch_agg(F.col(col), F.lit(lg_k))
                 .alias("s")).collect()[0]["s"]
    b = df_b.agg(F.theta_sketch_agg(F.col(col), F.lit(lg_k))
                 .alias("s")).collect()[0]["s"]
    spark = df_a.sparkSession
    two = spark.createDataFrame([(bytearray(a), bytearray(b))],
                                "a binary, b binary")
    row = two.select(
        F.theta_sketch_estimate("a").alias("n_a"),
        F.theta_sketch_estimate("b").alias("n_b"),
        F.theta_sketch_estimate(F.theta_union("a", "b")).alias("n_union"),
        F.theta_sketch_estimate(
            F.theta_intersection("a", "b")).alias("n_inter"),
    ).collect()[0]
    n_union = float(row["n_union"])
    # union and intersection are estimated by DIFFERENT sketch
    # operations (min-theta union vs intersection), so their ratio can
    # exceed 1 by estimation noise on near-identical sets — clamp
    return {
        "n_a": float(row["n_a"]),
        "n_b": float(row["n_b"]),
        "n_union": n_union,
        "n_intersection": float(row["n_inter"]),
        "jaccard": min(1.0, float(row["n_inter"]) / n_union)
        if n_union else 0.0,
    }
