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

__all__ = [
    "distinct_counts",
    "quantile_summary",
    "set_overlap",
    "count_min_table",
    "count_min_estimate",
    "heavy_hitters",
    "heavy_hitters_exact",
]


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


# ---------------------------------------------------------------------------
# frequency sketches: Count-Min (point estimates) and Misra-Gries
# (top-k heavy hitters) — the two classic companions to HLL/KLL/Theta
# ---------------------------------------------------------------------------

def _cm_bucket(col, d: int, width: int, seed: int):
    return F.pmod(F.xxhash64(F.concat(col.cast("string"),
                                      F.lit(f":{seed}:{d}"))),
                  F.lit(int(width)))


def count_min_table(df: DataFrame, col: str, depth: int = 4,
                    width: int = 1024, seed: int = 0) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame:
    (depth, bucket, cnt), depth × width cells total. Pure codegen —
    each row explodes into ``depth`` (row-hash, bucket) cells and ONE
    groupBy sums them; map-side partial aggregation collapses the
    shuffle to ≤ depth·width rows per map task regardless of input
    size. Mergeable: two tables built with the same (depth, width,
    seed) union + re-sum cell-wise.

    Accuracy: estimates OVERCOUNT only; with width w and depth d,
    err ≤ e·n/w with probability 1 − e^−d. 4×1024 ⇒ ±0.27%·n at
    ~98% confidence, in 16 K cells.

    The table is SELF-DESCRIBING: (width, seed) ride every row as
    constant columns (and depth is recoverable as max(depth)+1), so
    :func:`count_min_estimate` derives the hash parameters from the
    table instead of trusting the caller to repeat them — a silently
    mismatched width/seed would probe the wrong buckets and UNDERcount
    via the na.fill(0) misses, breaking the one guarantee the sketch
    makes. Merging two tables must therefore groupBy
    (depth, bucket, width, seed) — mixed-parameter unions then fail
    loudly at estimate time instead of blending."""
    cells = F.array(*[
        F.struct(F.lit(d).cast("int").alias("depth"),
                 _cm_bucket(F.col(col), d, width, seed).alias("bucket"))
        for d in range(depth)])
    return (df.filter(F.col(col).isNotNull())
            .select(F.explode(cells).alias("h"))
            .groupBy(F.col("h.depth").alias("depth"),
                     F.col("h.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("width", F.lit(int(width)))
            .withColumn("seed", F.lit(int(seed))))


def count_min_estimate(cm: DataFrame, values: DataFrame,
                       col: str) -> DataFrame:
    """Point-frequency estimates for ``values[col]`` against a
    count-min table: (value, est) with est = min over depth rows;
    est ≥ true count always (never under). The hash parameters are
    READ FROM the table (see :func:`count_min_table`), so they cannot
    silently mismatch. The probe set broadcast-joins the cell table —
    querying costs |values|·depth lookups, not a data scan."""
    params = cm.agg(
        F.max("depth").alias("dmax"),
        F.count_distinct("width", "seed").alias("nparams"),
        F.first("width").alias("width"),
        F.first("seed").alias("seed")).collect()[0]
    if params["dmax"] is None:
        raise ValueError("count-min table is empty")
    if params["nparams"] != 1:
        raise ValueError(
            "count-min table mixes (width, seed) parameter sets — "
            "tables merged with different hash parameters cannot be "
            "queried")
    depth = int(params["dmax"]) + 1
    width, seed = int(params["width"]), int(params["seed"])
    probes = values.select(F.col(col).alias("value")).distinct()
    cells = F.array(*[
        F.struct(F.lit(d).cast("int").alias("depth"),
                 _cm_bucket(F.col("value"), d, width, seed)
                 .alias("bucket"))
        for d in range(depth)])
    probe_cells = probes.select(
        "value", F.explode(cells).alias("h")).select(
        "value", F.col("h.depth").alias("depth"),
        F.col("h.bucket").alias("bucket"))
    # broadcast the CELL table (≤ depth·width tiny rows) — the right
    # side of the left join, which is the side a left-outer
    # BroadcastHashJoin can actually broadcast
    return (probe_cells
            .join(F.broadcast(cm.select("depth", "bucket", "cnt")),
                  ["depth", "bucket"], "left")
            .na.fill({"cnt": 0})
            .groupBy("value")
            .agg(F.min("cnt").alias("est")))


def heavy_hitters(df: DataFrame, col: str, k: int = 20,
                  capacity: int = 256) -> DataFrame:
    """Top-k most frequent values via per-partition Misra-Gries
    summaries (bounded memory: ``capacity`` counters per partition, NOT
    per-partition distinct counts) merged by one tiny groupBy.

    Returns (value, est, err) sorted by est desc: est ≤ true ≤ est +
    err, where err = Σ per-partition decrement totals ≤ n/capacity.
    Any value with true count > err is GUARANTEED to surface (the MG
    property); with capacity ≥ per-partition distinct values the
    summary is exact and err = 0 (pinned by test).

    The kernel is Arrow-batched: per-batch counting is a vectorized
    ``value_counts``; Python work is O(distinct-per-batch), never
    per-row."""
    def kernel(batches):
        import pandas as pd
        counters: dict = {}
        delta = 0
        pid = None
        for pdf in batches:
            if pid is None and len(pdf):
                pid = int(pdf["_pid"].iloc[0])
            for val, c in pdf["_v"].dropna().value_counts().items():
                counters[val] = counters.get(val, 0) + int(c)
            if len(counters) > capacity:
                ranked = sorted(counters.values(), reverse=True)
                dec = ranked[capacity]  # (capacity+1)-th largest
                delta += dec
                counters = {v: c - dec for v, c in counters.items()
                            if c > dec}
        if pid is None:
            return
        yield pd.DataFrame({
            "pid": pid,
            "value": list(counters.keys()) + [None],
            "est": list(counters.values()) + [0],
            "delta": delta,  # repeated per row; read once per pid
        })

    summaries = (df
                 .select(F.col(col).cast("string").alias("_v"),
                         F.spark_partition_id().alias("_pid"))
                 .mapInPandas(
                     kernel,
                     "pid int, value string, est long, delta long"))
    summaries = summaries.localCheckpoint(eager=True)  # read twice below
    total_err = (summaries.groupBy("pid").agg(F.first("delta").alias("d"))
                 .agg(F.sum("d")).collect()[0][0]) or 0
    return (summaries.filter(F.col("value").isNotNull())
            .groupBy("value")
            .agg(F.sum("est").alias("est"))
            .withColumn("err", F.lit(int(total_err)))
            .orderBy(F.desc("est"), F.asc("value"))
            .limit(k))


def heavy_hitters_exact(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """Exact top-k frequencies — the oracle baseline (one full groupBy
    on the value: the shuffle the sketch form avoids)."""
    return (df.filter(F.col(col).isNotNull())
            .select(F.col(col).cast("string").alias("value"))
            .groupBy("value").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("value")).limit(k))
