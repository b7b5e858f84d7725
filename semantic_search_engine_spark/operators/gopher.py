"""Gopher / MassiveText quality and repetition rules (Rae et al. 2021,
appendix A1.1) — the document-level filter battery that C4's successors
standardized on (Dolma, RefinedWeb, FineWeb all ship a variant). The
existing quality ops (langid, punctuation/stopword ratios — SURVEY Q/X
rows) are single-expression signals; this adds the REPETITION family,
which needs per-document hash maps (duplicate lines/paragraphs, top and
duplicated n-gram character fractions).

Plan shape: per-doc statistics over a doc's own lines/n-grams have no
cross-document state, so the right distribution is NO shuffle at all —
one Arrow-batched ``mapInPandas`` kernel computes the full signal
vector per document in a single pass (a corpus-wide explode+groupBy
formulation would shuffle 10^12 docs' worth of lines to compute purely
local counts). Thresholding is then plain JVM column predicates over
the signal frame.

Exact definitions (public implementations differ in details; these are
this module's pinned semantics, mirrored by the test oracle):
- words = whitespace-split tokens; chars(w) = len(w); total_chars =
  sum of token lengths (separators excluded).
- top n-gram char fraction (n=2,3,4): count(most frequent n-gram) *
  chars(that n-gram) / total_chars.
- duplicate n-gram char fraction (n=5..10): sum over n-grams with
  count >= 2 of count * chars(n-gram) / total_chars, capped at 1.0
  (overlapping occurrences double-count — the cheap upper bound).
- duplicate line / paragraph (char) fraction: lines = '\\n' split,
  paragraphs = '\\n\\n' split, both whitespace-trimmed, empties
  dropped; a line is duplicate if its exact text occurs >= 2 times in
  the doc; the char form weights by line length.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["GOPHER_THRESHOLDS", "gopher_signals", "gopher_filter"]

# rule name -> (signal column, op, threshold) per Rae et al. A1.1
GOPHER_THRESHOLDS: dict[str, tuple[str, str, float]] = {
    "min_words": ("n_words", ">=", 50),
    "max_words": ("n_words", "<=", 100_000),
    "min_mean_word_len": ("mean_word_len", ">=", 3.0),
    "max_mean_word_len": ("mean_word_len", "<=", 10.0),
    "symbol_to_word": ("symbol_to_word_ratio", "<=", 0.1),
    "bullet_lines": ("bullet_line_frac", "<=", 0.9),
    "ellipsis_lines": ("ellipsis_line_frac", "<=", 0.3),
    "alpha_words": ("alpha_word_frac", ">=", 0.8),
    "stopword_hits": ("n_gopher_stopwords", ">=", 2),
    "dup_line_frac": ("dup_line_frac", "<=", 0.30),
    "dup_para_frac": ("dup_para_frac", "<=", 0.30),
    "dup_line_char_frac": ("dup_line_char_frac", "<=", 0.20),
    "dup_para_char_frac": ("dup_para_char_frac", "<=", 0.20),
    "top_2gram_char_frac": ("top_2gram_char_frac", "<=", 0.20),
    "top_3gram_char_frac": ("top_3gram_char_frac", "<=", 0.18),
    "top_4gram_char_frac": ("top_4gram_char_frac", "<=", 0.16),
    "dup_5gram_char_frac": ("dup_5gram_char_frac", "<=", 0.15),
    "dup_6gram_char_frac": ("dup_6gram_char_frac", "<=", 0.14),
    "dup_7gram_char_frac": ("dup_7gram_char_frac", "<=", 0.13),
    "dup_8gram_char_frac": ("dup_8gram_char_frac", "<=", 0.12),
    "dup_9gram_char_frac": ("dup_9gram_char_frac", "<=", 0.11),
    "dup_10gram_char_frac": ("dup_10gram_char_frac", "<=", 0.10),
}

_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_SIGNAL_SCHEMA = (
    "n_words int, mean_word_len double, symbol_to_word_ratio double, "
    "bullet_line_frac double, ellipsis_line_frac double, "
    "alpha_word_frac double, n_gopher_stopwords int, "
    "dup_line_frac double, dup_para_frac double, "
    "dup_line_char_frac double, dup_para_char_frac double, "
    + ", ".join(f"top_{n}gram_char_frac double" for n in (2, 3, 4))
    + ", "
    + ", ".join(f"dup_{n}gram_char_frac double" for n in range(5, 11)))


def compute_signals(text: str | None) -> dict:
    """Single-doc signal vector — pure Python, shared by the Spark
    kernel and (intentionally importable) by test oracles for OTHER
    semantics; the pinned oracle in tests re-implements it
    independently."""
    from collections import Counter

    out: dict = {k: None for k in
                 [c.split()[0] for c in _SIGNAL_SCHEMA.split(", ")]}
    if text is None:
        return out
    words = text.split()
    n = len(words)
    out["n_words"] = n
    if n == 0:
        return out
    total_chars = sum(len(w) for w in words)
    out["mean_word_len"] = total_chars / n
    symbols = text.count("#") + text.count("...") + text.count("…")
    out["symbol_to_word_ratio"] = symbols / n
    lows = [w.lower().strip(".,;:!?\"'()[]") for w in words]
    out["alpha_word_frac"] = (
        sum(1 for w in words if any(c.isalpha() for c in w)) / n)
    out["n_gopher_stopwords"] = sum(1 for s in _STOPWORDS if s in lows)

    lines = [l.strip() for l in text.split("\n") if l.strip()]
    paras = [p.strip() for p in text.split("\n\n") if p.strip()]
    if lines:
        out["bullet_line_frac"] = (
            sum(1 for l in lines
                if l.startswith(("•", "-", "*"))) / len(lines))
        out["ellipsis_line_frac"] = (
            sum(1 for l in lines
                if l.endswith(("...", "…"))) / len(lines))
    for key, items in (("line", lines), ("para", paras)):
        if not items:
            continue
        cnt = Counter(items)
        dups = [i for i in items if cnt[i] >= 2]
        out[f"dup_{key}_frac"] = len(dups) / len(items)
        tot = sum(len(i) for i in items)
        out[f"dup_{key}_char_frac"] = (
            sum(len(i) for i in dups) / tot if tot else None)

    for m in range(2, 11):
        col = (f"top_{m}gram_char_frac" if m <= 4
               else f"dup_{m}gram_char_frac")
        if n < m:
            out[col] = 0.0
            continue
        grams = Counter(tuple(words[i:i + m])
                        for i in range(n - m + 1))
        if m <= 4:
            g, c = max(grams.items(),
                       key=lambda kv: (kv[1], sum(map(len, kv[0]))))
            out[col] = (c * sum(len(w) for w in g)) / total_chars
        else:
            covered = sum(c * sum(len(w) for w in g)
                          for g, c in grams.items() if c >= 2)
            out[col] = min(1.0, covered / total_chars)
    return out


def gopher_signals(docs: DataFrame, text_col: str = "text",
                   id_col: str = "url") -> DataFrame:
    """(id_col, <all signal columns>) — one Arrow kernel pass, no
    shuffle. NULL text yields NULL signals (filter treats them as
    failing min_words)."""
    src = docs.select(id_col, text_col)
    id_type = dict(src.dtypes)[id_col]

    def _kernel(iterator):
        import pandas as pd
        for pdf in iterator:
            rows = [{"_id": i, **compute_signals(t)}
                    for i, t in zip(pdf[id_col], pdf[text_col])]
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["_id"] + [c.split()[0] for c in
                                   _SIGNAL_SCHEMA.split(", ")])

    out = src.mapInPandas(
        _kernel, schema=f"_id {id_type}, {_SIGNAL_SCHEMA}")
    return out.withColumnRenamed("_id", id_col)


def gopher_filter(docs: DataFrame, text_col: str = "text",
                  id_col: str = "url",
                  thresholds: dict | None = None) -> DataFrame:
    """Signals + ``failed_rules array<string>`` + ``gopher_pass`` —
    the document passes iff no rule fails. NULL signals fail their
    rule (a doc with no text has no business passing min_words)."""
    th = GOPHER_THRESHOLDS if thresholds is None else thresholds
    sig = gopher_signals(docs, text_col, id_col)
    fails = []
    for rule, (col, op, limit) in th.items():
        ok = (F.col(col) >= limit) if op == ">=" else \
             (F.col(col) <= limit)
        fails.append(F.when(~F.coalesce(ok, F.lit(False)),
                            F.lit(rule)))
    arr = F.array_compact(F.array(*fails))
    return (sig.withColumn("failed_rules", arr)
            .withColumn("gopher_pass", F.size("failed_rules") == 0))
