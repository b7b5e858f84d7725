"""Sketch analytics (X71): HLL distinct counts (exact in sparse mode,
mergeable), KLL quantiles (rank-error bound vs exact), Theta set
overlap (Jaccard error bound vs exact) — over the driver's `documents`
table and synthetic data."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.sketches import (
    distinct_counts,
    quantile_summary,
    set_overlap,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_distinct_counts_exact_in_sparse_mode(spark, docs):
    got = {r["lang"]: r["n_distinct"]
           for r in distinct_counts(docs, ["lang"], "source").collect()}
    want = {r["lang"]: r["n"]
            for r in docs.groupBy("lang")
            .agg(F.countDistinct("source").alias("n")).collect()}
    # cardinality of `source` per lang is tiny -> HLL sparse mode = exact
    assert got == want


def test_distinct_counts_error_bound_large(spark):
    # per parity group: even ids mod even 50000 stay even (odd stay
    # odd) -> exactly 25000 distinct values per group
    df = spark.range(200_000).selectExpr("id % 50000 as v",
                                         "id % 2 as g")
    got = {r["g"]: r["n_distinct"]
           for r in distinct_counts(df, ["g"], "v").collect()}
    for g, n in got.items():
        # lg_k=12 RSE ~1.6%; allow ~5 sigma (estimates are
        # deterministic given the data, so this never flakes)
        assert abs(n - 25_000) / 25_000 < 0.08, (g, n)


def test_sketches_merge_to_whole(spark):
    """union_agg over per-shard sketches == sketch of the whole — the
    mergeability contract (per-day rows roll into per-month)."""
    df = spark.range(100_000).selectExpr("id % 33333 as v",
                                         "id % 4 as shard")
    whole = df.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("v", F.lit(12))).alias("e")).collect()[0]["e"]
    merged = (df.groupBy("shard")
              .agg(F.hll_sketch_agg("v", F.lit(12)).alias("s"))
              .agg(F.hll_sketch_estimate(F.hll_union_agg("s"))
                   .alias("e")).collect()[0]["e"])
    assert merged == whole


def test_distinct_counts_partitioning_invariant(spark):
    df = spark.range(50_000).selectExpr("id % 9999 as v", "1 as g")
    a = distinct_counts(df.repartition(2), ["g"], "v").collect()[0]
    b = distinct_counts(df.repartition(16), ["g"], "v").collect()[0]
    assert a["n_distinct"] == b["n_distinct"]


def test_quantile_summary_rank_error(spark, docs):
    got = {r["lang"]: r for r in quantile_summary(
        docs, ["lang"], "n_chars", probabilities=[0.5, 0.9]).collect()}
    pdf = docs.select("lang", "n_chars").toPandas()
    for lang, grp in pdf.groupby("lang"):
        vals = sorted(grp["n_chars"])
        n = len(vals)
        assert got[lang]["n"] == n
        for p, colname in [(0.5, "q_0_5"), (0.9, "q_0_9")]:
            q = got[lang][colname]
            # KLL guarantees the returned value's RANK is within eps of
            # p (eps ~1.65% at k=200); check rank, not value
            rank = sum(1 for v in vals if v <= q) / n
            assert abs(rank - p) <= 0.04, (lang, p, rank)


def test_set_overlap_estimates_jaccard(spark):
    # A = [0, 60k), B = [30k, 90k) -> |∩| = 30k, |∪| = 90k, J = 1/3
    a = spark.range(0, 60_000).selectExpr("id as v")
    b = spark.range(30_000, 90_000).selectExpr("id as v")
    got = set_overlap(a, b, "v")
    assert abs(got["n_a"] - 60_000) / 60_000 < 0.05
    assert abs(got["n_b"] - 60_000) / 60_000 < 0.05
    assert abs(got["n_intersection"] - 30_000) / 30_000 < 0.10
    assert abs(got["n_union"] - 90_000) / 90_000 < 0.05
    assert abs(got["jaccard"] - 1 / 3) < 0.05


def test_set_overlap_disjoint_and_identical(spark):
    a = spark.range(0, 5_000).selectExpr("id as v")
    b = spark.range(10_000, 15_000).selectExpr("id as v")
    d = set_overlap(a, b, "v")
    assert d["n_intersection"] == 0.0 and d["jaccard"] == 0.0
    s = set_overlap(a, a, "v")
    assert s["jaccard"] == pytest.approx(1.0)
