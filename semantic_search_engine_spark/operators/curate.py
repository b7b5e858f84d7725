"""Training-corpus curation: filter → sample → budget → pack → shard.

The operations an LLM pretraining-data pipeline runs over a curated web
corpus AFTER dedup (operators/dedup.py, X60) and quality/language signals
(the driver-contract text panel): deterministic stratified sampling,
global token-budget selection, sequence packing, and sharded export with a
manifest. Everything here is built from JVM-side expressions plus bounded
Arrow-batched group kernels — no per-row Python, no driver-side loops over
data (CCNet/RefinedWeb/FineWeb describe these stages; the implementations
below are original Spark formulations).

Scale notes (10^12 docs):
- ``quality_signals``/``curate``: pure whole-stage-codegen expressions on
  the scan — filters push into the parquet read, zero shuffles.
- ``sample_stratified``: shuffle-FREE — membership is a pure function of
  ``xxhash64(id, seed)`` against a per-stratum fraction threshold, so the
  sample is reproducible, composable (a 1% sample of a 10% sample is a
  deterministic 0.1% sample), and needs no per-stratum state.
- ``sample_quota``: per-stratum exact-N via a hash-ordered row_number
  window — one shuffle on the stratum key; quota strata are typically few
  (languages, sources), and a skewed giant stratum pays only its own
  window. Use fractions when exactness of N is not required.
- ``select_token_budget``: a global "take the best docs until B tokens"
  is a prefix of a global sort — never materialize that sort. Two bounded
  passes instead: a fixed-width histogram over the priority column (one
  map-side-combined aggregation, ≤ n_bins rows to the driver), a driver
  cumsum picks the boundary bin, then only the boundary bin's rows (≈
  1/n_bins of the data) pay a window. Exact prefix semantics, pinned
  against a single-node oracle.
- ``pack_sequences``: packing is embarrassingly local — docs are hashed
  into buckets and each bucket packs independently with first-fit
  decreasing (one ``applyInPandas`` kernel, numpy inside). Global bin
  packing is NP-hard and irrelevant at corpus scale: waste is bounded by
  the per-bucket tail, and determinism matters more than the last few
  percent of fill.
- ``export_shards``: shard = hash(id) % n — a pure column; the writer
  partitions by it, and the manifest is one aggregation over the same
  expression (never a second scan of the written files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the snowball-ish English stopword head — enough signal for a density
#: ratio; the index analyzer owns the full set (functions/stem.py)
_STOPWORDS = ("the", "of", "and", "to", "in", "a", "is", "that", "for",
              "it", "as", "was", "with", "be", "by", "on", "not", "he",
              "i", "this", "are", "or", "his", "from", "at", "which")


def quality_signals(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features as pure JVM expressions: token count,
    mean token length, type-token ratio, alpha/digit/punct character
    ratios, stopword density. One projection — no shuffle, no Python."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)) \
        .otherwise(F.size(toks))
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(
        F.col(text_col), r"[^.,;:!?'\"()\[\]{}-]", ""))
    lowered = F.transform(toks, lambda t: F.lower(t))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(
        lowered, lambda t: F.array_contains(stop_arr, t)))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den) \
        .otherwise(F.lit(0.0))  # noqa: E731
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        safe(n_chars, F.greatest(n_tok, F.lit(1))
             ).alias("chars_per_token"),
        safe(F.size(F.array_distinct(lowered)), n_tok).alias("ttr"),
        safe(n_alpha, n_chars).alias("alpha_ratio"),
        safe(n_digit, n_chars).alias("digit_ratio"),
        safe(n_punct, n_chars).alias("punct_ratio"),
        safe(n_stop, n_tok).alias("stopword_ratio"),
    )


def curate(docs: DataFrame, text_col: str = "text",
           id_col: str = "doc_id",
           min_tokens: int = 50, max_tokens: int = 100_000,
           langs: list[str] | None = None,
           min_alpha_ratio: float = 0.6,
           max_digit_ratio: float = 0.3,
           min_stopword_ratio: float = 0.0,
           min_ttr: float = 0.1) -> DataFrame:
    """The standard web-corpus quality gate (Gopher/FineWeb-style rules)
    as one filter chain over :func:`quality_signals` — joins the signals
    back so every predicate is a pushable column comparison. Returns the
    surviving rows of ``docs`` (original columns)."""
    sig = quality_signals(docs, text_col, id_col)
    keep = sig.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("digit_ratio") <= max_digit_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("ttr") >= min_ttr)).select(id_col)
    out = docs.join(keep, id_col, "left_semi")
    if langs is not None:
        out = out.filter(F.col("lang").isin(langs))
    return out


# ---------------------------------------------------------------------------
_HASH_MOD = 1 << 30  # fraction resolution: ~1e-9


def _sample_hash(id_col: str, seed: int):
    """Uniform deterministic in [0, _HASH_MOD): pmod of the 64-bit hash.
    Seed folds in so different samples of the same corpus are
    independent."""
    return F.pmod(F.xxhash64(F.col(id_col), F.lit(int(seed))),
                  F.lit(_HASH_MOD))


def sample_stratified(docs: DataFrame, fractions: dict[str, float],
                      by: str = "lang", id_col: str = "doc_id",
                      seed: int = 0,
                      default_fraction: float = 0.0) -> DataFrame:
    """Shuffle-free per-stratum Bernoulli sampling: keep a row iff its
    id-hash falls under the stratum's fraction threshold. Deterministic
    (same corpus+seed ⇒ same sample), stable under corpus growth (a doc's
    membership never changes when other docs arrive — the property a
    rolling crawl needs), and free of any per-stratum shuffle."""
    thresholds = F.create_map(*[
        x for k, v in sorted(fractions.items())
        for x in (F.lit(k), F.lit(int(round(v * _HASH_MOD))))])
    thr = F.coalesce(thresholds[F.col(by)],
                     F.lit(int(round(default_fraction * _HASH_MOD))))
    return docs.filter(_sample_hash(id_col, seed) < thr)


def sample_quota(docs: DataFrame, quotas: dict[str, int],
                 by: str = "lang", id_col: str = "doc_id",
                 seed: int = 0) -> DataFrame:
    """Exact-N per stratum: hash-ordered ``row_number`` ≤ quota. One
    shuffle on the stratum key; rows outside any quota stratum drop.
    The hash order makes the choice uniform AND reproducible — no
    ``ORDER BY rand()``."""
    from pyspark.sql.window import Window

    qmap = F.create_map(*[x for k, v in sorted(quotas.items())
                          for x in (F.lit(k), F.lit(int(v)))])
    w = (Window.partitionBy(by)
         .orderBy(_sample_hash(id_col, seed).asc(), F.col(id_col).asc()))
    return (docs.filter(F.col(by).isin(list(quotas)))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= qmap[F.col(by)])
            .drop("_rn"))


# ---------------------------------------------------------------------------
def select_token_budget(docs: DataFrame, budget_tokens: int,
                        priority_col: str, tokens_col: str = "n_tokens",
                        id_col: str = "doc_id",
                        n_bins: int = 1024) -> DataFrame:
    """Exact global prefix selection: walk docs in
    ``(priority DESC, id ASC)`` order and keep them while the running
    token sum stays ≤ ``budget_tokens`` (stop at the first overflow —
    classic budget-prefix semantics).

    Never sorts the corpus. Pass 1 histograms priority into ``n_bins``
    fixed-width bins (min/max from one aggregation; one map-side-combined
    groupBy, ≤ n_bins rows collected); the driver's descending cumsum
    finds the boundary bin. Bins strictly above it are kept wholesale (a
    pushable range filter); only the boundary bin's rows — ~1/n_bins of
    the corpus, and in the degenerate all-one-priority case everything,
    priced below — pay an exact window walk. NULL priorities sort last
    (kept only if budget remains when the walk reaches them).
    """
    from pyspark.sql.window import Window

    pv = F.col(priority_col).cast("double")  # null-preserving
    # window order: NULL priorities last (below every real value)
    pr = F.coalesce(pv, F.lit(float("-inf")))
    mm = docs.agg(F.min(pv).alias("lo"), F.max(pv).alias("hi"),
                  F.sum(F.col(tokens_col)).alias("total")).collect()[0]
    if mm["total"] is None:
        return docs.limit(0)
    if int(mm["total"]) <= budget_tokens:
        return docs  # whole corpus fits
    lo = float(mm["lo"]) if mm["lo"] is not None else 0.0
    hi = float(mm["hi"]) if mm["hi"] is not None else 0.0
    if not (hi > lo):
        # single priority value (or all-NULL): the boundary bin IS the
        # corpus — fall through to the exact walk over everything (no
        # cheaper exact answer exists for a degenerate priority column)
        bin_expr = F.lit(0)
        n_bins = 1
    else:
        # bin 0 = highest priority. NULL priorities bin with the lowest
        # real value (the window order still puts them after it); the
        # clamp keeps floor()'s input finite (ANSI-safe cast).
        width = (hi - lo) / n_bins
        pb = F.greatest(F.least(F.coalesce(pv, F.lit(lo)), F.lit(hi)),
                        F.lit(lo))
        bin_expr = F.least(
            F.lit(n_bins - 1),
            F.floor((F.lit(hi) - pb) / F.lit(width)).cast("int"))
    hist = (docs.groupBy(bin_expr.alias("_bin"))
            .agg(F.sum(F.col(tokens_col)).alias("toks"))
            .collect())
    by_bin = {int(r["_bin"]): int(r["toks"]) for r in hist}
    run = 0
    boundary = None
    for bi in sorted(by_bin):
        if run + by_bin[bi] > budget_tokens:
            boundary = bi
            break
        run += by_bin[bi]
    if boundary is None:  # numeric edge: everything fits after all
        return docs
    remaining = budget_tokens - run

    tagged = docs.withColumn("_bin", bin_expr)
    keep_whole = tagged.filter(F.col("_bin") < boundary).drop("_bin")
    edge = tagged.filter(F.col("_bin") == boundary).drop("_bin")
    w = (Window.orderBy(pr.desc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    edge_kept = (edge.withColumn("_cum", F.sum(F.col(tokens_col)).over(w))
                 .filter(F.col("_cum") <= remaining).drop("_cum"))
    return keep_whole.unionByName(edge_kept)


# ---------------------------------------------------------------------------
PACK_SCHEMA = ("bucket int, seq_id long, doc_ids array<long>, "
               "seq_tokens long, n_docs int, overflow boolean")


def pack_sequences(docs: DataFrame, max_seq_tokens: int,
                   tokens_col: str = "n_tokens", id_col: str = "doc_id",
                   n_buckets: int = 64) -> DataFrame:
    """Pack docs into training sequences of ≤ ``max_seq_tokens`` tokens:
    hash docs into ``n_buckets`` independent buckets, first-fit-DECREASING
    inside each (deterministic: sort by (tokens DESC, id ASC), place each
    doc in the lowest-indexed bin with room). Docs longer than the
    capacity become single-doc ``overflow`` sequences (the downstream
    tokenizer truncates; packing must not silently drop them).

    Returns (bucket, seq_id, doc_ids, seq_tokens, n_docs, overflow);
    ``seq_id = bucket·2^32 + bin index`` is globally unique and stable.
    FFD waste is ≤ the per-bucket tail; buckets pack in parallel with no
    cross-bucket coordination — the only shuffle is the bucket hash."""
    import numpy as np
    import pandas as pd

    cap = int(max_seq_tokens)

    def pack(pdf: pd.DataFrame):
        if not len(pdf):
            return pd.DataFrame({
                "bucket": pd.Series([], dtype="int32"),
                "seq_id": pd.Series([], dtype="int64"),
                "doc_ids": pd.Series([], dtype="object"),
                "seq_tokens": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int32"),
                "overflow": pd.Series([], dtype="bool")})
        bucket = int(pdf["_bucket"].iloc[0])
        pdf = pdf.sort_values(["_t", "_id"], ascending=[False, True],
                              kind="mergesort")
        toks = pdf["_t"].to_numpy(dtype=np.int64)
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        bins: list[list[int]] = []   # doc indices per bin
        fill: list[int] = []
        overflow: list[bool] = []
        for i in range(len(ids)):
            t = int(toks[i])
            if t > cap:
                bins.append([i])
                fill.append(t)
                overflow.append(True)
                continue
            placed = False
            for bi in range(len(bins)):
                if not overflow[bi] and fill[bi] + t <= cap:
                    bins[bi].append(i)
                    fill[bi] += t
                    placed = True
                    break
            if not placed:
                bins.append([i])
                fill.append(t)
                overflow.append(False)
        return pd.DataFrame({
            "bucket": pd.Series([bucket] * len(bins), dtype="int32"),
            "seq_id": pd.Series(
                [(bucket << 32) | bi for bi in range(len(bins))],
                dtype="int64"),
            "doc_ids": pd.Series([[int(ids[i]) for i in b] for b in bins],
                                 dtype="object"),
            "seq_tokens": pd.Series(fill, dtype="int64"),
            "n_docs": pd.Series([len(b) for b in bins], dtype="int32"),
            "overflow": pd.Series(overflow, dtype="bool")})

    slim = docs.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).cast("long").alias("_t"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(n_buckets)))
        .cast("int").alias("_bucket"))
    return slim.groupBy("_bucket").applyInPandas(pack, schema=PACK_SCHEMA)


# ---------------------------------------------------------------------------
def export_shards(docs: DataFrame, out_dir: str, n_shards: int,
                  id_col: str = "doc_id",
                  tokens_col: str | None = None) -> DataFrame:
    """Deterministic sharded export: shard = hash(id) % n, parquet
    partitioned by shard (each shard is its own directory — the unit a
    training loader maps to a reader). Returns the manifest (shard,
    n_docs[, total_tokens]) computed from the same expression in the same
    pass-shape — never by re-reading the written files."""
    sharded = docs.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(n_shards)))
        .cast("int"))
    (sharded.repartition("shard")
     .write.mode("overwrite").partitionBy("shard").parquet(out_dir))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if tokens_col is not None:
        aggs.append(F.sum(F.col(tokens_col)).alias("total_tokens"))
    return sharded.groupBy("shard").agg(*aggs).orderBy("shard")
