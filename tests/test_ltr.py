"""Linear learning-to-rank (operators/ltr.py + QueryEngine LTR, X112).

The ridge fit distributes exactly (Gram matrix + moment vector are plain
sums), so it is pinned against numpy's closed-form solve; the serving
path is pinned for window discipline (pure-JVM scoring over a hydrated
top-window) and for actually re-ordering results the way the trained
model says.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.ltr import (
    fit_linear_ltr,
    ltr_rescore,
    ltr_score_col,
)


def _train_df(spark, x, y, names):
    rows = [tuple(map(float, xi)) + (float(yi),) for xi, yi in zip(x, y)]
    schema = ", ".join(f"{n} double" for n in names) + ", label double"
    return spark.createDataFrame(rows, schema)


def test_fit_recovers_exact_linear_model(spark):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 3))
    y = 2.0 * x[:, 0] - 3.0 * x[:, 1] + 0.5 * x[:, 2] + 1.25
    w = fit_linear_ltr(_train_df(spark, x, y, ["f1", "f2", "f3"]),
                       ["f1", "f2", "f3"])
    assert math.isclose(w["f1"], 2.0, abs_tol=1e-9)
    assert math.isclose(w["f2"], -3.0, abs_tol=1e-9)
    assert math.isclose(w["f3"], 0.5, abs_tol=1e-9)
    assert math.isclose(w["_intercept"], 1.25, abs_tol=1e-9)


def test_fit_matches_numpy_ridge(spark):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(400, 4))
    y = x @ np.array([1.0, -2.0, 0.0, 3.0]) + rng.normal(
        scale=0.3, size=400)
    lam = 2.5
    names = [f"f{i}" for i in range(4)]
    w = fit_linear_ltr(_train_df(spark, x, y, names), names, l2=lam)
    # numpy closed form with unpenalized intercept
    xb = np.hstack([x, np.ones((len(x), 1))])
    reg = np.eye(5) * lam
    reg[-1, -1] = 0.0
    want = np.linalg.solve(xb.T @ xb + reg, xb.T @ y)
    got = np.array([w[n] for n in names] + [w["_intercept"]])
    assert np.allclose(got, want, rtol=0, atol=1e-9)


def test_fit_no_intercept_and_refusals(spark):
    x = np.array([[1.0], [2.0], [3.0]])
    y = np.array([2.0, 4.0, 6.0])
    w = fit_linear_ltr(_train_df(spark, x, y, ["f"]), ["f"],
                       fit_intercept=False)
    assert math.isclose(w["f"], 2.0, abs_tol=1e-12)
    assert w["_intercept"] == 0.0
    with pytest.raises(ValueError, match="at least one feature"):
        fit_linear_ltr(_train_df(spark, x, y, ["f"]), [])
    empty = _train_df(spark, x, y, ["f"]).filter("f > 100")
    with pytest.raises(ValueError, match="empty training frame"):
        fit_linear_ltr(empty, ["f"])


def test_score_col_is_jvm_expression_and_handles_nulls(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 3.0), (2, None, 1.0)], "doc_id long, a double, b double")
    w = {"a": 10.0, "b": 1.0, "_intercept": 0.5}
    out = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", ltr_score_col(w).alias("s")).collect()}
    assert out[1] == 10.0 * 2.0 + 3.0 + 0.5
    assert out[2] == 0.0 + 1.0 + 0.5  # NULL feature scores as 0
    # no python UDF in the plan: scoring is codegen arithmetic
    plan = df.select(ltr_score_col(w))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_ltr_rescore_orders_by_model(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 9.0), (2, 5.0, 0.0), (3, 3.0, 3.0)],
        "doc_id long, bm25 double, prior double")
    w = {"bm25": 0.0, "prior": 1.0, "_intercept": 0.0}
    got = [r["doc_id"] for r in ltr_rescore(df, w, 3).collect()]
    assert got == [1, 3, 2]  # pure prior order, not bm25 order


# ---------------------------------------------------------------------------
# engine integration: train on engine features, serve over the window
# ---------------------------------------------------------------------------

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_ltr")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, None)


def test_ltr_features_window_and_columns(built):
    feats = built.ltr_features_df("zipfhead0 zipfhead1", window=25)
    rows = feats.collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert r["bm25"] > 0
        assert r["doc_len"] > 0
        assert 0.0 < r["url_prior"] <= 1.0


def test_ltr_end_to_end_learns_the_label_blend(spark, built):
    """Labels are a known linear blend of the engine's own features;
    the fitted model must recover the blend and the served ranking must
    equal the label ranking — the full train->serve loop with zero
    feature skew (same extractor both sides)."""
    q = "zipfhead0 zipfhead1"
    feats = built.ltr_features_df(q, window=50).cache()
    from pyspark.sql import functions as F
    # doc_len varies across the window (url_prior is constant on this
    # synthetic corpus — every url has the same path depth), so this
    # blend genuinely reorders vs raw BM25
    train = feats.withColumn(
        "label", 0.3 * F.col("bm25") - 0.002 * F.col("doc_len"))
    w = fit_linear_ltr(train, ["bm25", "doc_len"], "label")
    assert math.isclose(w["bm25"], 0.3, abs_tol=1e-6)
    assert math.isclose(w["doc_len"], -0.002, abs_tol=1e-6)
    got = [r["doc_id"]
           for r in built.ltr_top_k_df(q, w, k=10, window=50).collect()]
    want = [r["doc_id"] for r in train
            .orderBy(F.desc("label"), F.asc("doc_id")).limit(10).collect()]
    assert got == want
    # and the learned order differs from raw BM25 order (the prior bites)
    bm25 = [r["doc_id"]
            for r in built.wand_top_k_df(q, k=10).collect()]
    assert got != bm25
    feats.unpersist()


def test_singular_gram_raises_actionable_error(spark):
    """ADVICE r3: collinear features with l2=0 must name the cause and
    the fix (l2>0), not leak a bare numpy LinAlgError."""
    import pytest

    from semantic_search_engine_spark.operators.ltr import fit_linear_ltr

    # f2 is byte-identical to f1: the Gram matrix has two equal rows and
    # the LU factorization hits an exact zero pivot
    rows = spark.createDataFrame(
        [(float(i), float(i), float(i % 3)) for i in range(12)],
        "f1 double, f2 double, label double")
    with pytest.raises(ValueError, match="l2>0"):
        fit_linear_ltr(rows, ["f1", "f2"], label_col="label", l2=0.0)
    # the suggested fix works on the same frame
    w = fit_linear_ltr(rows, ["f1", "f2"], label_col="label", l2=1e-6)
    assert set(w) == {"f1", "f2", "_intercept"}
