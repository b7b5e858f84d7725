"""Leakage-safe train/validation/test splitting.

The LLM-pipeline failure this prevents: a naive per-document hash
split puts two NEAR-DUPLICATE documents on opposite sides of the
train/test boundary, and the held-out set silently overlaps the
training set (Lee et al. 2022 measured the effect; benchmark
decontamination — X82 — handles *external* eval sets, this handles
the corpus's own splits). The fix is standard: split by near-dup
CLUSTER, not by document — every member of a connected component of
the near-dup graph lands in the same split.

Shapes, both shuffle-lean and growth-stable:

* :func:`assign_split` — pure-codegen deterministic hash split (the
  X62 sampler's hash, cumulative thresholds via stacked ``when``), no
  shuffle at all. A document's split is a function of (unit, seed)
  only, so it never changes as the corpus grows — the property a
  rolling crawl needs (yesterday's test docs don't leak into
  tomorrow's train set just because the corpus doubled).
* :func:`leakage_safe_split` — components come from the dedup
  pipeline's :func:`~semantic_search_engine_spark.operators.dedup.
  cluster_pairs` (min-label + pointer jumping, O(log d) rounds); the
  split unit becomes the component id via one left join (docs not in
  any pair are their own singleton component). The join is the only
  shuffle this adds, keyed on the doc key, and the pairs frame is the
  near-dup detector's output the pipeline already computed.

Guarantee (pinned by test): no pair in ``pairs`` ever straddles two
splits; the whole component moves together.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.curate import (
    _HASH_MOD,
    _sample_hash,
)
from semantic_search_engine_spark.operators.dedup import cluster_pairs

__all__ = ["assign_split", "leakage_safe_split", "split_report"]


def _validate_fractions(fractions: dict[str, float]) -> list[tuple]:
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be >= 0")
    # deterministic threshold layout: insertion order of the dict
    out, acc = [], 0.0
    for name, frac in fractions.items():
        acc += frac
        out.append((name, int(round(acc * _HASH_MOD))))
    out[-1] = (out[-1][0], _HASH_MOD)  # close the last bin exactly
    return out


def assign_split(docs: DataFrame, fractions: dict[str, float],
                 unit_col: str = "doc_id", seed: int = 0,
                 out_col: str = "split") -> DataFrame:
    """Add ``out_col`` ∈ fractions.keys() by deterministic hash of
    ``unit_col``: shuffle-free, growth-stable, seed-keyed. Rows with a
    NULL unit get a NULL split (surface them, don't hide them in
    train)."""
    bins = _validate_fractions(fractions)
    # the X62 sampler's hash, SHARED (imported), so split and sampling
    # determinism can never drift apart
    h = _sample_hash(unit_col, seed)
    expr = F.lit(None).cast("string")
    for name, upper in reversed(bins):
        expr = F.when(h < F.lit(upper), F.lit(name)).otherwise(expr)
    expr = F.when(F.col(unit_col).isNull(),
                  F.lit(None).cast("string")).otherwise(expr)
    return docs.withColumn(out_col, expr)


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       fractions: dict[str, float],
                       key: str = "doc_id", seed: int = 0,
                       out_col: str = "split",
                       checkpoint_dir: str | None = None) -> DataFrame:
    """Split by near-dup component: every document in a connected
    component of ``pairs`` (key_a, key_b — any near-dup detector's
    output: MinHash/LSH, SimHash, embedding-cosine) receives the SAME
    split, decided by the hash of the component's min key. Documents
    in no pair are singleton components (their own key).

    The component label is itself a corpus key, so the split stays
    growth-stable at the component level; note the inherent caveat
    that NEW near-dup edges can merge two components and re-label one
    side — exactly the cases where re-splitting is the correct
    behavior (the old labels were leaking).
    """
    comps = cluster_pairs(pairs, checkpoint_dir=checkpoint_dir)
    unit = (docs
            .join(comps.withColumnRenamed("key", key)
                  .withColumnRenamed("cluster", "_comp"),
                  key, "left")
            .withColumn("_unit", F.coalesce("_comp", F.col(key)))
            .drop("_comp"))
    return assign_split(unit, fractions, unit_col="_unit", seed=seed,
                        out_col=out_col).drop("_unit")


def split_report(split_docs: DataFrame, out_col: str = "split",
                 weight_col: str | None = None) -> DataFrame:
    """Realized split sizes: (split, n_docs[, weight]) — compare the
    achieved fractions against the requested ones (hash splits are
    binomially, not exactly, proportional)."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("weight"))
    return split_docs.groupBy(out_col).agg(*aggs)
