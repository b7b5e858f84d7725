"""Freshness / decay document priors (Elasticsearch ``function_score``
decay parity: its ``gauss`` / ``exp`` / ``linear`` kernels with the same
``origin`` / ``scale`` / ``offset`` / ``decay`` semantics — the standard
web-search recency signal; the reference has no notion of it).

A decay prior is a QUERY-INDEPENDENT document score in [0, 1]: 1 at the
origin, exactly ``decay`` at distance ``scale`` past the ``offset``
plateau, shrinking with the kernel's shape beyond. It plugs straight
into the X56 blended-WAND serve path
(``QueryEngine.boosted_top_k_df(static_df=decay_prior(meta, ...))``),
whose bounds only require a non-negative prior — so recency-boosted
retrieval stays EXACT under block-max pruning.

Everything is a closed-form column expression on one scan of doc_meta
(or any (key, timestamp) table): no UDF, no shuffle, no driver data.
At 10^12 docs production would MERGE the prior into doc_meta once per
refresh (X25 CoW) and serve it as a column; the DataFrame form keeps the
prior recomputable per request without a write.

Kernel math (distance ``x = max(0, |ts - origin| - offset)`` seconds):
- ``gauss``:  exp(-x^2 / (2 sigma^2)),  sigma^2 = -scale^2 / (2 ln decay)
- ``exp``:    exp(lambda x),            lambda  = ln(decay) / scale
- ``linear``: max(0, (s - x) / s),      s       = scale / (1 - decay)
(the exact formulas in Elasticsearch's function-score documentation)
"""
from __future__ import annotations

import datetime
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["decay_prior"]

_KERNELS = ("gauss", "exp", "linear")


def _epoch(ts) -> float:
    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        ts = datetime.datetime.fromisoformat(ts)
    if isinstance(ts, datetime.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=datetime.timezone.utc)
        return ts.timestamp()
    raise ValueError(f"origin must be epoch seconds, ISO string or "
                     f"datetime, got {type(ts).__name__}")


def decay_prior(meta: DataFrame, fn: str = "gauss",
                ts_col: str = "warc_ts", key: str = "doc_id",
                origin=None, scale_s: float = 30 * 86400.0,
                offset_s: float = 0.0, decay: float = 0.5) -> DataFrame:
    """(key, prior) decay scores for ``boosted_top_k_df(static_df=...)``.

    ``origin=None`` anchors at the table's NEWEST timestamp (one scalar
    aggregate — deterministic from the data, unlike a wall-clock "now").
    NULL timestamps get prior 0 (an undated page earns no freshness).
    """
    if fn not in _KERNELS:
        raise ValueError(f"fn must be one of {_KERNELS}, got {fn!r}")
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1) — it is the prior "
                         "value AT distance scale")
    if scale_s <= 0 or offset_s < 0:
        raise ValueError("scale_s must be > 0 and offset_s >= 0")
    # TIMESTAMP_NTZ has no direct double cast (Spark 4) — go through
    # TIMESTAMP (session tz; UTC everywhere in this engine) first
    secs = F.col(ts_col).cast("timestamp").cast("double")
    if origin is None:
        row = meta.agg(F.max(secs)).collect()[0]
        o = row[0]
        if o is None:
            raise ValueError(f"{ts_col} is all-NULL; pass origin")
    else:
        o = _epoch(origin)

    x = F.greatest(
        F.lit(0.0),
        F.abs(secs - F.lit(float(o))) - F.lit(float(offset_s)))
    if fn == "gauss":
        two_sigma_sq = -(scale_s ** 2) / math.log(decay)  # = 2 sigma^2
        prior = F.exp(-(x * x) / F.lit(two_sigma_sq))
    elif fn == "exp":
        lam = math.log(decay) / scale_s
        prior = F.exp(F.lit(lam) * x)
    else:  # linear
        s = scale_s / (1.0 - decay)
        prior = F.greatest(F.lit(0.0), (F.lit(s) - x) / F.lit(s))
    return meta.select(
        key,
        F.when(F.col(ts_col).isNull(), F.lit(0.0)).otherwise(prior)
        .alias("prior"))
