"""Benchmark decontamination — the train/test overlap scan every serious
LLM training pipeline runs before training (GPT-3 appendix C: 13-gram
overlap; The Pile and Llama use the same shape). Given the corpus and a
small set of evaluation/benchmark examples, find every document that
shares an ``n``-token window with any eval example, report the overlap,
and drop (or mark) the offenders.

Reuses the repeated-span machinery (X77): the tokenizer and the window
hash are the SAME Catalyst expressions as ``operators.spandup`` — a
passage flagged here hashes identically there, so the two stages compose
(decontaminate, then span-dedup, then pack).

Plan shape at 10^12 docs (this is the whole point):
- the EVAL side is small by construction (10^5 examples x ~10^2 windows
  = ~10^7 8-byte hashes): it is aggregated once and **broadcast**.
- the CORPUS side is one pure-JVM window-hash scan (``transform(
  sequence(...))`` + ``xxhash64`` — no Python, no shuffle of the big
  side) followed by a broadcast semi/inner join. Only the MATCHING
  windows (tiny) ever shuffle, for the per-(doc, eval) rollup.
- eval examples shorter than ``n`` tokens hash as ONE whole-sequence
  window (GPT-3 uses min(13, len) for the same reason) so short
  benchmark prompts still match: the corpus scan emits windows at
  EVERY effective length present in the eval set (at most
  ``n - min_tokens + 1`` extra lengths, flattened in the same
  projection — still one scan, no extra pass); sub-``min_tokens``
  eval rows are ignored as un-matchable noise.

False-positive odds are the xxhash64 trade documented by X60/X77
(~2^-64 per pair); the pinned tests cross-check against a hash-free
string oracle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .spandup import _tok_expr

__all__ = ["eval_ngram_hashes", "contaminated_docs", "decontaminate"]


def _window_hashes(tokens_col: str, n: int):
    """Array of xxhash64 window hashes over a token-array column; a
    sequence shorter than n yields its single whole-sequence hash.
    (CaseWhen branches evaluate lazily per row, so the descending
    ``sequence(1, 0)`` trap for short rows is never taken.)"""
    full = F.xxhash64(F.array_join(F.col(tokens_col), " "))
    wins = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - F.lit(n - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice(tokens_col, i, n),
                                          " ")))
    return F.when(F.size(tokens_col) < n, F.array(full)).otherwise(wins)


def _doc_window_structs(tokens_col: str, lengths: list[int]):
    """Array of (_pos, h) structs: every window of every length in
    ``lengths`` (ONE projection over one scan — per-length arrays are
    flattened, not separate passes). A doc shorter than a length
    contributes no windows at that length."""
    def _mk(L):
        # one-arg lambda on purpose: pyspark passes (element, index)
        # to two-arg lambdas, which would shadow a default-arg L
        return lambda i: F.struct(
            (i - F.lit(1)).alias("_pos"),
            F.xxhash64(F.array_join(F.slice(tokens_col, i, L),
                                    " ")).alias("h"))

    per = []
    for L in sorted(set(lengths)):
        wins = F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - F.lit(L - 1)),
            _mk(L))
        per.append(F.when(F.size(tokens_col) >= L, wins).otherwise(
            F.array().cast("array<struct<_pos:int,h:bigint>>")))
    return F.flatten(F.array(*per))


def eval_ngram_hashes(eval_df: DataFrame, n: int = 13,
                      text_col: str = "text", id_col: str = "eval_id",
                      min_tokens: int = 4) -> DataFrame:
    """(eval_id, h, n_eval_windows): distinct window hashes per eval
    example plus that example's distinct-window count (the denominator
    for overlap_frac). Examples with < min_tokens tokens are dropped —
    a 2-token benchmark fragment would flag half the corpus."""
    base = (eval_df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), _tok_expr(text_col).alias("_t"))
            .filter(F.size("_t") >= min_tokens))
    h = (base.select(id_col,
                     F.least(F.lit(n), F.size("_t")).alias("wlen"),
                     F.explode(_window_hashes("_t", n)).alias("h"))
         .distinct())
    per = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    return h.withColumn("n_eval_windows", per)


def contaminated_docs(docs: DataFrame, eval_df: DataFrame, n: int = 13,
                      text_col: str = "text", id_col: str = "doc_id",
                      eval_text_col: str = "text",
                      eval_id_col: str = "eval_id",
                      min_tokens: int = 4) -> DataFrame:
    """Per contaminated (doc, eval example) pair:
    (doc_id, eval_id, n_matching_windows, n_eval_windows, overlap_frac,
    first_match_start). n_matching_windows counts DISTINCT matching
    window hashes (a doc repeating one eval n-gram 50 times is one
    window of evidence, not 50); first_match_start is the earliest
    token offset of any match in the doc."""
    ev_h = eval_ngram_hashes(
        eval_df, n, eval_text_col, eval_id_col, min_tokens)
    # Effective window lengths present in the eval set: n itself plus
    # one per short-example length (bounded by n - min_tokens + 1, so
    # <= ~10 ints — a driver collect of metadata, not data).
    lengths = [r["wlen"] for r in ev_h.select("wlen").distinct()
               .collect()]
    if not lengths:
        lengths = [n]
    ev = F.broadcast(ev_h.drop("wlen"))
    base = (docs.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), _tok_expr(text_col).alias("_t"))
            .filter(F.size("_t") > 0))
    w = (base.select(id_col,
                     F.explode(_doc_window_structs("_t", lengths))
                     .alias("_w"))
         .select(id_col, F.col("_w._pos").alias("_pos"),
                 F.col("_w.h").alias("h")))
    hits = w.join(ev, "h")
    return (hits.groupBy(id_col, eval_id_col)
            .agg(F.countDistinct("h").alias("n_matching_windows"),
                 F.first("n_eval_windows").alias("n_eval_windows"),
                 F.min("_pos").alias("first_match_start"))
            .withColumn("overlap_frac",
                        F.col("n_matching_windows")
                        / F.col("n_eval_windows"))
            .select(id_col, eval_id_col, "n_matching_windows",
                    "n_eval_windows", "overlap_frac",
                    "first_match_start"))


def decontaminate(docs: DataFrame, eval_df: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str = "text",
                  eval_id_col: str = "eval_id",
                  min_windows: int = 1, mode: str = "drop",
                  min_tokens: int = 4) -> DataFrame:
    """GPT-3's removal policy at document granularity: any doc matching
    >= min_windows distinct eval windows (against ANY example) is
    contaminated. mode='drop' returns the clean corpus with the doc's
    original columns; mode='mark' returns every doc plus
    (is_contaminated, matched_eval_ids, n_matching_windows).

    The contaminated-id set is bounded by the eval set's reach and is
    broadcast — the corpus never shuffles. A corpus where that set is
    NOT small is a corpus that mostly consists of the benchmark; fix
    the benchmark split, not the join strategy.
    """
    if mode not in ("drop", "mark"):
        raise ValueError(f"mode must be 'drop' or 'mark', got {mode!r}")
    pairs = contaminated_docs(docs, eval_df, n, text_col, id_col,
                              eval_text_col, eval_id_col, min_tokens)
    bad = (pairs.groupBy(id_col)
           .agg(F.sum("n_matching_windows").alias("n_matching_windows"),
                F.sort_array(F.collect_set(eval_id_col))
                .alias("matched_eval_ids"))
           .filter(F.col("n_matching_windows") >= min_windows))
    if mode == "drop":
        return docs.join(F.broadcast(bad.select(id_col)), id_col,
                         "left_anti")
    ids_type = bad.schema["matched_eval_ids"].dataType.simpleString()
    marked = docs.join(F.broadcast(bad), id_col, "left")
    return (marked
            .withColumn("is_contaminated",
                        F.col("n_matching_windows").isNotNull())
            .withColumn("n_matching_windows",
                        F.coalesce("n_matching_windows", F.lit(0)))
            .withColumn("matched_eval_ids",
                        F.coalesce("matched_eval_ids",
                                   F.array().cast(ids_type))))
