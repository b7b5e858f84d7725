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


# ---------------------------------------------------------------------------
# frequency sketches: Count-Min + Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def zipf_values(spark):
    """Deterministic Zipf-ish stream: value v_i appears ~1000/i times
    for i in 1..40, plus 2000 unique noise values."""
    rows = []
    for i in range(1, 41):
        rows += [(f"hot_{i:02d}",)] * (1000 // i)
    rows += [(f"noise_{j}",) for j in range(2000)]
    return spark.createDataFrame(rows, "v string").repartition(8)


def _exact_counts(df):
    # NOT heavy_hitters_exact(k=huge): orderBy().limit(k) sizes a
    # priority queue of k slots — collect the groupBy directly
    import pyspark.sql.functions as F
    return {r["v"]: r["n"] for r in
            df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}


def test_count_min_never_undercounts(spark, zipf_values):
    from semantic_search_engine_spark.operators.sketches import (
        count_min_estimate, count_min_table)
    cm = count_min_table(zipf_values, "v", depth=4, width=1024)
    true = _exact_counts(zipf_values)
    probes = spark.createDataFrame(
        [(v,) for v in list(true)[:50]] + [("absent_value",)], "v string")
    est = {r["value"]: r["est"]
           for r in count_min_estimate(cm, probes, "v").collect()}
    n = sum(true.values())
    for v, e in est.items():
        t = true.get(v, 0)
        assert e >= t, (v, e, t)
        assert e <= t + 0.02 * n, (v, e, t)  # 2e/width ≈ 0.5%, slack 2%


def test_count_min_mergeable(spark, zipf_values):
    """Union of two half-stream tables re-summed cell-wise == the
    one-pass table."""
    from semantic_search_engine_spark.operators.sketches import (
        count_min_table)
    import pyspark.sql.functions as F
    half_a = zipf_values.withColumn("r", F.monotonically_increasing_id())
    a = half_a.filter(F.col("r") % 2 == 0).select("v")
    b = half_a.filter(F.col("r") % 2 == 1).select("v")
    merged = (count_min_table(a, "v").unionByName(count_min_table(b, "v"))
              .groupBy("depth", "bucket", "width", "seed")
              .agg(F.sum("cnt").alias("cnt")))
    one = count_min_table(zipf_values, "v")
    m = {(r["depth"], r["bucket"]): r["cnt"] for r in merged.collect()}
    o = {(r["depth"], r["bucket"]): r["cnt"] for r in one.collect()}
    assert m == o


def test_count_min_rejects_mixed_or_empty_tables(spark, zipf_values):
    """The self-describing parameters make a silent width/seed
    mismatch impossible: mixed tables and empty tables fail loudly."""
    from semantic_search_engine_spark.operators.sketches import (
        count_min_estimate, count_min_table)
    probes = spark.createDataFrame([("hot_01",)], "v string")
    mixed = count_min_table(zipf_values, "v", width=1024).unionByName(
        count_min_table(zipf_values, "v", width=2048))
    with pytest.raises(ValueError, match="mixes"):
        count_min_estimate(mixed, probes, "v")
    empty = count_min_table(
        spark.createDataFrame([], "v string"), "v")
    with pytest.raises(ValueError, match="empty"):
        count_min_estimate(empty, probes, "v")


def test_heavy_hitters_recovers_head(spark, zipf_values):
    from semantic_search_engine_spark.operators.sketches import (
        heavy_hitters)
    true = _exact_counts(zipf_values)
    out = heavy_hitters(zipf_values, "v", k=10, capacity=128)
    rows = out.collect()
    got = {r["value"] for r in rows}
    err = rows[0]["err"]
    # assert only what the MG contract GUARANTEES: a value whose true
    # count clears the 11th-ranked value's by more than err must be in
    # the top-10 (adjacent head values within err of each other may
    # legitimately swap under a different partitioning)
    ranked = sorted(true, key=lambda v: (-true[v], v))
    cutoff = true[ranked[10]]  # 11th value's true count
    guaranteed = {v for v in ranked[:10] if true[v] - cutoff > err}
    assert guaranteed, "fixture too flat to test anything"
    assert guaranteed <= got, (guaranteed - got, err)
    assert len(rows) == 10
    for r in rows:
        t = true[r["value"]]
        assert r["est"] <= t <= r["est"] + r["err"], (r, t)


def test_heavy_hitters_exact_when_capacity_suffices(spark, zipf_values):
    from semantic_search_engine_spark.operators.sketches import (
        heavy_hitters)
    true = _exact_counts(zipf_values)
    out = heavy_hitters(zipf_values, "v", k=15, capacity=5000).collect()
    assert all(r["err"] == 0 for r in out)
    for r in out:
        assert r["est"] == true[r["value"]]


def test_heavy_hitters_null_and_empty(spark):
    from semantic_search_engine_spark.operators.sketches import (
        heavy_hitters)
    df = spark.createDataFrame([(None,), ("a",), ("a",), ("b",)],
                               "v string")
    rows = heavy_hitters(df, "v", k=5, capacity=8).collect()
    assert [(r["value"], r["est"]) for r in rows] == [("a", 2), ("b", 1)]
    empty = spark.createDataFrame([], "v string")
    assert heavy_hitters(empty, "v", k=5).count() == 0
