"""Linear learning-to-rank: distributed ridge fit + window rescoring (X112).

Elasticsearch's LTR plugin / Solr's ``ltr`` module put a trained model
over the retrieval top-window; the simplest production-grade member of
that family is a pointwise linear model (ridge regression over relevance
labels), and its fit is EXACTLY distributable: the normal equations need
only the Gram matrix ``XᵀX`` (d×d) and the moment vector ``Xᵀy`` (d),
both plain sums over training rows. The fit is therefore one Arrow-batched
``mapInPandas`` pass emitting per-batch partial Gram/moment sums (numpy,
in-batch aggregation — the map-side-combine shape every counting stage
here uses) followed by an elementwise ``groupBy(i).sum`` over d²+d+1
cells, and a d×d solve on the driver. No gradient loop, no MLlib, no
nondeterminism: the solve is LAPACK and the float-summation tree only
affects ulps (tests pin against numpy lstsq at 1e-9).

Feature discipline (the part that matters at 100 TB): features must be
columns the serving path can hydrate for the top-window ONLY — retrieval
scores (BM25), static priors (PageRank, url form, freshness), doc_len —
so scoring cost stays O(window), never a corpus pass. The learned model
is a plain dict of weights; ``ltr_score_col`` turns it into a pure-JVM
column expression (whole-stage codegen, no UDF at serve time).

Reference parity: the reference blends a trained model's signal into SQL
ranking (``ProductRepository.java:71-81`` orders by the model's cosine);
this operator is the same shape with the model trained BY the engine on
the cluster.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL_SCHEMA = "i int, v double"


def fit_linear_ltr(train: DataFrame, feature_cols: list[str],
                   label_col: str = "label", l2: float = 0.0,
                   fit_intercept: bool = True) -> dict[str, float]:
    """Closed-form ridge over (features, label) rows.

    Returns ``{feature: weight, ..., "_intercept": b}``. ``l2`` is the
    ridge strength (never applied to the intercept). The heavy pass is
    distributed; the driver solves a (d+1)×(d+1) system — feature counts
    are tens, so the driver cost is microscopic at any corpus size.
    """
    d = len(feature_cols)
    if d == 0:
        raise ValueError("fit_linear_ltr needs at least one feature")
    cols = [F.col(c).cast("double") for c in feature_cols]
    rows = train.select(*cols, F.col(label_col).cast("double"))
    dd = d + (1 if fit_intercept else 0)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = pdf.iloc[:, :d].to_numpy(dtype=np.float64)
            if fit_intercept:
                x = np.hstack([x, np.ones((len(x), 1))])
            y = pdf.iloc[:, d].to_numpy(dtype=np.float64)
            g = x.T @ x                        # dd×dd partial Gram
            m = x.T @ y                        # dd partial moment
            flat = np.concatenate([g.ravel(), m, [float(len(x))]])
            yield pd.DataFrame({"i": np.arange(flat.size, dtype=np.int32),
                                "v": flat})

    cells = (rows.mapInPandas(partials, schema=_PARTIAL_SCHEMA)
             .groupBy("i").agg(F.sum("v").alias("v")).collect())
    flat = np.zeros(dd * dd + dd + 1, dtype=np.float64)
    for r in cells:
        flat[int(r["i"])] = float(r["v"])
    n = flat[-1]
    if n == 0:
        raise ValueError("fit_linear_ltr got an empty training frame")
    g = flat[:dd * dd].reshape(dd, dd)
    m = flat[dd * dd:dd * dd + dd]
    if l2 > 0.0:
        reg = np.eye(dd) * float(l2)
        if fit_intercept:
            reg[-1, -1] = 0.0  # never shrink the intercept
        g = g + reg
    # Singular/ill-conditioned Gram (collinear or constant features with
    # l2=0, ADVICE r3): LAPACK's solve does not reliably raise here — for
    # an exactly rank-deficient Gram it can silently return a garbage
    # solution (rounding keeps the pivots nonzero). Detect it up front
    # and name the fix; the try/except keeps the belt for the cases where
    # LAPACK does hit an exact zero pivot.
    singular_msg = (
        "fit_linear_ltr: the feature Gram matrix is singular or "
        "numerically rank-deficient — features are collinear, a feature "
        "is constant, or feature scales differ so wildly (the Gram's "
        "condition number is the feature-scale ratio SQUARED) that no "
        "float64 solution has meaningful digits. Pass l2>0 (any small "
        "ridge, e.g. 1e-6), rescale the features, or drop the redundant "
        "one(s).")
    if l2 <= 0.0 and np.linalg.matrix_rank(g) < g.shape[0]:
        raise ValueError(singular_msg)
    try:
        w = np.linalg.solve(g, m)
    except np.linalg.LinAlgError as e:
        raise ValueError(singular_msg) from e
    out = {c: float(w[i]) for i, c in enumerate(feature_cols)}
    out["_intercept"] = float(w[-1]) if fit_intercept else 0.0
    return out


def ltr_score_col(weights: dict[str, float],
                  feature_cols: list[str] | None = None) -> Column:
    """The learned model as a pure-JVM column expression (whole-stage
    codegen at serve time — no UDF): ``Σ w_f · f + b``. Missing feature
    values score as 0 for that feature (coalesce), the standard
    missing-field behavior of ES LTR feature sets."""
    feats = feature_cols if feature_cols is not None \
        else [c for c in weights if c != "_intercept"]
    expr = F.lit(float(weights.get("_intercept", 0.0)))
    for c in feats:
        expr = expr + F.lit(float(weights[c])) * F.coalesce(
            F.col(c).cast("double"), F.lit(0.0))
    return expr


def ltr_rescore(window_df: DataFrame, weights: dict[str, float],
                k: int, feature_cols: list[str] | None = None
                ) -> DataFrame:
    """Re-rank a hydrated top-window by the linear model: input is
    (doc_id, <feature columns>) for the retrieval window — O(window)
    rows by construction — output the model's top-k as
    (doc_id, ltr_score, <features>). Ordering ties break on doc_id like
    every ranked path in this engine."""
    scored = window_df.withColumn(
        "ltr_score", ltr_score_col(weights, feature_cols))
    return (scored.orderBy(F.desc("ltr_score"), F.asc("doc_id"))
            .limit(int(k)))
