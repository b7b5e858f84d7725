"""Mixture balancing by temperature sampling — the multilingual /
multi-domain corpus recipe (mT5, XLM-R: sample group i with probability
proportional to p_i^alpha, p_i the natural share): alpha=1 keeps the
natural distribution, alpha→0 flattens toward uniform, raising the
representation of tail languages/domains without drowning the head.

Complements the X62 curation samplers: ``sample_stratified`` takes the
fractions you give it — this module COMPUTES them from the corpus and a
temperature, with honest integerization (largest-remainder) and
waterfilling (a group smaller than its quota yields its surplus to the
rest, re-split by share).

Plan shape: one groupBy for the group counts (|groups| rows — languages
and domains are small sets, the driver loop over them is metadata
work), then ONE window-rank shuffle keyed by the group column for the
deterministic selection (rank = xxhash64(id, seed) — stable, seedable,
growth-stable like the X62 hash samplers)."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["temperature_shares", "temperature_quotas",
           "temperature_sample"]


def temperature_shares(counts: dict[str, int], alpha: float
                       ) -> dict[str, float]:
    """share_i = p_i^alpha / sum_j p_j^alpha over non-empty groups.
    alpha=1 -> natural shares; alpha=0 -> uniform."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    pos = {g: c for g, c in counts.items() if c > 0}
    total = sum(pos.values())
    if not total:
        return {}
    powed = {g: (c / total) ** alpha for g, c in pos.items()}
    z = sum(powed.values())
    return {g: w / z for g, w in powed.items()}


def temperature_quotas(counts: dict[str, int], alpha: float,
                       budget: int) -> dict[str, int]:
    """Integer per-group quotas summing to min(budget, sum counts):
    largest-remainder rounding of share*budget, then waterfilling —
    a group smaller than its quota is taken whole and its surplus
    re-splits across the remaining groups by their shares."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    left = min(budget, sum(c for c in counts.values() if c > 0))
    quotas = {g: 0 for g in counts}
    while left > 0:
        # shares recompute over the groups with capacity left, from
        # their ORIGINAL counts (their natural p among themselves)
        active = {g: counts[g] for g in counts
                  if counts[g] - quotas[g] > 0}
        if not active:
            break
        shares = temperature_shares(active, alpha)
        # largest-remainder integerization of `left` over `shares`
        raw = {g: shares[g] * left for g in shares}
        base = {g: int(raw[g]) for g in raw}
        rem = left - sum(base.values())
        for g in sorted(raw, key=lambda g: (-(raw[g] - base[g]), g))[:rem]:
            base[g] += 1
        took = 0
        for g, want in base.items():
            give = min(want, counts[g] - quotas[g])
            quotas[g] += give
            took += give
        left -= took
        if took == 0:      # unreachable by construction; hard stop
            break
    return {g: q for g, q in quotas.items() if q > 0}


def temperature_sample(docs: DataFrame, by: str, alpha: float,
                       budget: int, seed: int = 42,
                       id_col: str = "url") -> DataFrame:
    """Deterministic temperature-balanced subsample: exactly the
    ``temperature_quotas`` rows per group, selected by
    xxhash64(id, seed) rank within the group (same id set for the same
    seed regardless of partitioning; a new seed is a fresh draw). NULL
    group keys form their own group."""
    counts = {r[by]: r["n"] for r in
              docs.groupBy(by).agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    quotas = temperature_quotas(counts, alpha, budget)
    if not quotas:
        return docs.limit(0)
    qmap = F.create_map(*[x for g, q in sorted(
        quotas.items(), key=lambda kv: (kv[0] is None, kv[0]))
        for x in (F.lit(g), F.lit(q))])
    w = Window.partitionBy(by).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
    return (docs.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= F.coalesce(qmap[F.col(by)],
                                               F.lit(0)))
            .drop("_rk"))
