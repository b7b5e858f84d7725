"""Repeated-span detection and removal — the sub-document dedup stage of
LLM training pipelines (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better": removing REPEATED PASSAGES, not just
whole-document dups, measurably improves models; their ExactSubstr tool
uses a suffix array on one big machine). This is the distributed
fixed-granularity form: every length-``n`` token window hashes
(xxhash64 over the joined window), windows whose hash repeats
corpus-wide are duplicated spans, and consecutive duplicated windows
merge into maximal spans — a passage of L >= n shared tokens surfaces
as ONE span of L tokens, exactly like the suffix-array form, for
passages at granularity >= n. Shorter repeats (< n tokens) are below
the resolution by design; 64-bit hashing makes a false positive
~2^-64 per pair, the same trade the MinHash stage (X60) documents.

Plan shape (10^12 docs):
- window hashing is ALL JVM (``transform(sequence(...))`` over the
  token array — the tokenizer is the same Catalyst expression as
  build_lm's); one posexplode; ONE shuffle on the 8-byte hash for the
  duplicate count; one semi/inner join back on the hash. No Python in
  the scan path.
- the keeper rule (the lexicographically first (doc_id, start)
  occurrence survives; every other occurrence is removed) is a
  per-hash min-struct aggregation — deterministic, no coordination.
- interval merging + token dropping is per-doc local work: one
  Arrow-batched ``applyInPandas`` over docs that have any span to
  remove (a semi-join keeps untouched docs out of the kernel).

Output is TOKEN-level (``tokens_kept``), not a fake reconstruction of
the original byte text — the tokenizer lowercases and strips
punctuation, so the original string is not recoverable; LLM training
consumes token streams anyway (X62's ``pack_sequences`` takes exactly
this shape).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["repeated_ngram_spans", "remove_repeated_spans"]


def _tok_expr(text_col: str, max_token_len: int = 64,
              min_token_len: int = 1):
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    return F.filter(toks, lambda t: (F.length(t) >= min_token_len)
                    & (F.length(t) <= max_token_len))


def _windows(df: DataFrame, n: int, text_col: str, id_col: str
             ) -> DataFrame:
    """(id, start, h): xxhash64 of each length-n token window; start is
    0-based token offset."""
    base = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), _tok_expr(text_col).alias("_t"))
            .filter(F.size("_t") >= n))
    wins = F.transform(
        F.sequence(F.lit(1), F.size("_t") - F.lit(n - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice("_t", i, n), " ")))
    return (base.select(id_col, "_t", F.posexplode(wins)
                        .alias("start", "h"))
            .select(id_col, "start", "h"))


def repeated_ngram_spans(docs: DataFrame, n: int = 50,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Maximal duplicated spans: (id, start, length, n_windows) — every
    occurrence (keepers included) of every token window whose hash
    appears >= 2 times corpus-wide (self-repeats within one doc count),
    with consecutive duplicated windows merged per doc. ``length`` is in
    tokens."""
    w = _windows(docs, n, text_col, id_col)
    dup_h = (w.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
             .filter(F.col("_c") >= 2).select("h"))
    dup = w.join(dup_h, "h")
    # merge runs of consecutive starts per doc: run id = start - rank
    from pyspark.sql import Window
    rw = Window.partitionBy(id_col).orderBy("start")
    runs = (dup.withColumn("_rn", F.row_number().over(rw))
            .withColumn("_run", F.col("start") - F.col("_rn")))
    return (runs.groupBy(id_col, "_run")
            .agg(F.min("start").alias("start"),
                 F.count(F.lit(1)).alias("n_windows"))
            .withColumn("length", F.col("n_windows") + F.lit(n - 1))
            .select(id_col, "start", "length", "n_windows"))


def remove_repeated_spans(docs: DataFrame, n: int = 50,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Lee et al.'s removal policy at window granularity: for every
    duplicated window hash, the lexicographically first (id, start)
    occurrence SURVIVES; every other occurrence's tokens are dropped.
    Returns (id, tokens_kept, n_tokens, n_removed) for EVERY doc with
    tokens (untouched docs pass through with n_removed = 0 and never
    enter the Python kernel)."""
    base = (docs.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), _tok_expr(text_col).alias("_t"))
            .filter(F.size("_t") > 0))
    w = _windows(docs, n, text_col, id_col)
    stats = (w.groupBy("h")
             .agg(F.count(F.lit(1)).alias("_c"),
                  F.min(F.struct(F.col(id_col), F.col("start")))
                  .alias("_keep"))
             .filter(F.col("_c") >= 2))
    losers = (w.join(stats, "h")
              .filter(~((F.col(id_col) == F.col(f"_keep.{id_col}"))
                        & (F.col("start") == F.col("_keep.start"))))
              .select(id_col, "start"))
    # per-doc removal intervals [start, start+n)
    iv = (losers.groupBy(id_col)
          .agg(F.sort_array(F.collect_list("start")).alias("_starts")))
    touched = base.join(iv, id_col)

    def _mask(iterator):
        import pandas as pd
        for pdf in iterator:
            ids, kept, ntok, nrem = [], [], [], []
            for did, toks_in, starts in zip(pdf[id_col], pdf["_t"],
                                            pdf["_starts"]):
                toks = list(toks_in)
                drop = [False] * len(toks)
                for s in starts:
                    for i in range(s, min(s + n, len(toks))):
                        drop[i] = True
                ids.append(did)
                kept.append([t for t, d in zip(toks, drop) if not d])
                ntok.append(len(toks))
                nrem.append(sum(drop))
            yield pd.DataFrame({"_id": ids, "tokens_kept": kept,
                                "n_tokens": ntok, "n_removed": nrem})

    masked = (touched.mapInPandas(
        _mask, schema="_id long, tokens_kept array<string>, "
                      "n_tokens int, n_removed int")
        .withColumnRenamed("_id", id_col))
    untouched = (base.join(iv, id_col, "left_anti")
                 .select(id_col, F.col("_t").alias("tokens_kept"),
                         F.size("_t").alias("n_tokens"),
                         F.lit(0).alias("n_removed")))
    return masked.unionByName(untouched)
