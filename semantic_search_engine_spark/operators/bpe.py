"""Distributed BPE tokenizer training — the vocabulary-induction stage
of an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the fastBPE /
HuggingFace-tokenizers training recipe), re-expressed Spark-first.

The key scale observation (the one every practical BPE trainer uses):
the corpus enters exactly ONCE, through a word-count aggregation —
after that, training operates on the *weighted word table* (|distinct
words|, Zipf-bounded, ~10^8-10^9 rows at 100 TB — parallel data, NOT
driver data), never the corpus again. Each merge iteration is:

  1. pair counting — explode adjacent symbol pairs from the word
     table's ``symbols`` array, groupBy(pair).sum(weight). Pure JVM
     expressions (transform + explode), whole-stage codegen, one
     shuffle whose key space is the live pair set.
  2. argmax — orderBy(count desc, pair asc).limit(1): ONE row to the
     driver per iteration (the only driver data in the loop).
  3. merge application — a fold (``aggregate``) over the symbols
     array rewrites adjacent (a,b) -> ab left-to-right (identity on
     rows without the pair). No Python.

At 10^12-doc scale the remaining lever is delta maintenance of the
pair counts (only words containing the merged pair change, so their
before/after pair multisets yield a +/- delta to fold into the counts
instead of a full recount); docs/SCALE.md prices both forms. This
module recounts per iteration — exact, simple, and already
corpus-size-independent — and truncates the iteration lineage with
``localCheckpoint`` so the plan does not grow with n_merges.

Tie-breaks are total (count desc, then (a, b) lexicographic asc), so
the learned merge sequence is deterministic and partitioning-
independent; ``learn_bpe_local`` is the bit-equal pure-Python oracle
the tests pin the distributed trainer against.

Reference parity note: the reference engine (rnallanlab/
semantic-search-engine) delegates all tokenization to Postgres
``to_tsvector`` (ProductRepository.java:70-82) and cannot learn a
subword vocabulary; this operator extends the engine for the
training-data pipeline the brief targets.
"""
from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_search_engine_spark.textproc import (
    TOKEN_PATTERN_SQL,
    TOKEN_RE,
)

__all__ = [
    "EOW",
    "word_counts",
    "learn_bpe_local",
    "learn_bpe",
    "encode_word",
    "encode_bpe",
    "bpe_vocab",
]

# End-of-word marker, fused onto the final character (Sennrich learn_bpe
# convention): "low" -> ('l', 'o', 'w</w>'). '<'/'>' cannot appear inside
# a token ([a-z0-9]+ pre-tokenizer), so the marker is unambiguous.
EOW = "</w>"


# ---------------------------------------------------------------------------
# corpus -> weighted word table (the single corpus-scale pass)
# ---------------------------------------------------------------------------

def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus using the engine's pre-tokenizer
    ([a-z0-9]+ on lowercased text — textproc.TOKEN_RE). One projection
    + one explode + one groupBy shuffle keyed by word; this is the only
    stage whose input is corpus-sized."""
    # TOKEN_PATTERN_SQL keeps training tokenization in lockstep with
    # the TOKEN_RE the encoder (encode_bpe) uses — a drifted pattern
    # would learn merges over symbols the encoder never produces
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN_SQL}', 0)")
    return (docs
            .select(F.explode(toks).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("count")))


def _initial_symbols(word: str) -> list[str]:
    return list(word[:-1]) + [word[-1] + EOW]


# ---------------------------------------------------------------------------
# pure-Python reference (and driver-side fast path for small vocabs)
# ---------------------------------------------------------------------------

def learn_bpe_local(counts: dict[str, int], n_merges: int,
                    min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Exact reference BPE trainer over a word-count dict. Same
    semantics as learn_bpe (EOW fused on the last char; ties broken by
    count desc then (a, b) asc; stops early when the best pair's count
    drops below min_pair_count)."""
    vocab = {word: (_initial_symbols(word), c)
             for word, c in counts.items() if word}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        ab = a + b
        for word, (syms, c) in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = ab
                else:
                    out.append(s)
            vocab[word] = (out, c)
    return merges


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------

def _adjacent_pairs(symbols_col: str):
    """array<struct<a,b>> of adjacent symbol pairs (every position,
    matching the reference get_stats count)."""
    # size < 2 guard: Spark's sequence(1, 0) counts DOWN ([1, 0]), it
    # is not empty — a 1-symbol word must short-circuit to array()
    return F.expr(
        f"if(size({symbols_col}) < 2, "
        f"cast(array() as array<struct<a:string,b:string>>), "
        f"transform(sequence(1, size({symbols_col}) - 1), "
        f"i -> struct({symbols_col}[i-1] AS a, {symbols_col}[i] AS b)))")


def _has_pair(symbols_col: str, a: str, b: str):
    """Adjacency predicate: does the pair (a, b) occur in symbols?
    NOT used to guard the merge fold (the fold is already the identity
    on rows without the pair, and a ``when`` guard would reference the
    previous iteration's expression 3x per merge — exponential
    expression-tree growth); exported for filters/analytics."""
    def pred(p):
        return (p["a"] == F.lit(a)) & (p["b"] == F.lit(b))
    return F.exists(_adjacent_pairs(symbols_col), pred)


def _merge_fold(symbols_col, a: str, b: str):
    """Left-to-right non-overlapping rewrite of adjacent (a, b) -> a||b
    as a fold — bit-equal to the reference regex merge."""
    ab = F.lit(a + b)
    empty = F.expr("cast(array() as array<string>)")
    return F.aggregate(
        symbols_col, empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(ab)),
        ).otherwise(F.concat(acc, F.array(s))))


def _initial_vocab_df(wc: DataFrame) -> DataFrame:
    return (wc.filter(F.length("word") > 0)
            .select(
                "count",
                F.expr(
                    "concat(slice(split(word, ''), 1, length(word) - 1),"
                    f" array(concat(substring(word, -1, 1), '{EOW}')))"
                ).alias("symbols"))
            .localCheckpoint())


def _pair_counts(vocab: DataFrame, sign: int = 1) -> DataFrame:
    n = (F.sum("count") * sign) if sign != 1 else F.sum("count")
    return (vocab
            .select("count",
                    F.explode(_adjacent_pairs("symbols")).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(n.alias("n")))


def learn_bpe(wc: DataFrame, n_merges: int, min_pair_count: int = 2,
              checkpoint_every: int = 8,
              strategy: str = "recount") -> list[tuple[str, str]]:
    """Learn a BPE merge sequence from a (word, count) DataFrame.

    Returns the ordered merge list, identical to ``learn_bpe_local`` on
    the same counts. Per iteration the driver receives ONE row (the
    argmax pair); the word table stays distributed throughout.
    ``checkpoint_every`` bounds lineage depth (localCheckpoint; eager),
    so the logical plan does not grow linearly in n_merges.

    ``strategy``:

    * ``"recount"`` — pair counts recomputed from the full word table
      each iteration: one job per merge, cost O(|vocab|·avg_symbols)
      per iteration. Simple, and already corpus-size-independent.
    * ``"delta"`` — the fastBPE trick, exact: pair counts are a
      MAINTAINED table; each merge rewrites only the words that
      CONTAIN the merged pair and folds their before/after pair
      multisets into the counts as +/- deltas. Per-iteration work is
      O(|touched words|) — under Zipf the touched set collapses
      quickly, which is why 32k-merge production vocabularies train
      this way. Same merges, pinned by test.
    """
    if strategy not in ("recount", "delta"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "delta":
        return _learn_bpe_delta(wc, n_merges, min_pair_count,
                                checkpoint_every)
    vocab = _initial_vocab_df(wc)
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        best = (_pair_counts(vocab)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect())
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        # NOTE: no `when(has_pair, ...)` guard — the fold is the
        # identity on rows without the pair, and guarding would
        # reference the previous layer's expression 3× per merge
        # (exponential expression-tree growth across iterations; the
        # unguarded fold nests linearly)
        new_vocab = vocab.select(
            "count",
            _merge_fold(F.col("symbols"), a, b).alias("symbols"))
        if (it + 1) % checkpoint_every == 0:
            new_vocab = new_vocab.localCheckpoint()
        vocab = new_vocab
    return merges


def _learn_bpe_delta(wc: DataFrame, n_merges: int, min_pair_count: int,
                     checkpoint_every: int) -> list[tuple[str, str]]:
    """Delta-maintained trainer (exact): per iteration, only words
    containing the merged pair are rewritten, and the pair-count table
    absorbs their before/after difference. The vocab frame is kept as
    untouched ∪ rewritten (a union, no shuffle), checkpointed every
    ``checkpoint_every`` rounds to bound the union-tree depth; the
    counts table is tiny (live pair set) and checkpointed each round
    because the next argmax reads it anyway."""
    vocab = _initial_vocab_df(wc)
    counts = _pair_counts(vocab).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        best = (counts.orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1).collect())
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        touched = vocab.filter(_has_pair("symbols", a, b)) \
            .localCheckpoint()
        rewritten = touched.select(
            "count",
            _merge_fold(F.col("symbols"), a, b).alias("symbols")) \
            .localCheckpoint()
        delta = (_pair_counts(rewritten)
                 .unionByName(_pair_counts(touched, sign=-1)))
        counts = (counts.unionByName(delta)
                  .groupBy("a", "b").agg(F.sum("n").alias("n"))
                  .filter(F.col("n") > 0)
                  .localCheckpoint())
        new_vocab = (vocab.filter(~_has_pair("symbols", a, b))
                     .unionByName(rewritten))
        if (it + 1) % checkpoint_every == 0:
            new_vocab = new_vocab.localCheckpoint()
        vocab = new_vocab
    return merges


# ---------------------------------------------------------------------------
# applying a learned vocabulary
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge table (merge the
    lowest-rank adjacent pair until none applies — the standard BPE
    inference loop)."""
    syms = _initial_symbols(word)
    while len(syms) > 1:
        ranked = [(ranks.get((syms[i], syms[i + 1])), i)
                  for i in range(len(syms) - 1)]
        ranked = [(r, i) for r, i in ranked if r is not None]
        if not ranked:
            break
        r, _ = min(ranked)
        a, b = None, None
        for rr, i in ranked:
            if rr == r:
                a, b = syms[i], syms[i + 1]
                break
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def encode_bpe(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "url") -> DataFrame:
    """Tokenize the corpus with a learned vocabulary: (id, bpe_tokens
    array<string>, n_bpe_tokens). Arrow-batched kernel with a per-batch
    distinct-word cache — Zipf makes the cache hit rate ~99% — and the
    merge table broadcast once per executor via closure capture."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    pattern = TOKEN_RE.pattern
    out_id = id_col
    id_type = dict(docs.dtypes)[id_col]  # don't assume string ids

    def kernel(iterator):
        import pandas as pd
        word_re = re.compile(pattern)
        cache: dict[str, list[str]] = {}

        def enc(text):
            toks: list[str] = []
            if text:
                for w in word_re.findall(text.lower()):
                    enc_w = cache.get(w)
                    if enc_w is None:
                        enc_w = cache[w] = encode_word(w, ranks)
                    toks.extend(enc_w)
            return toks

        for pdf in iterator:
            toks = pdf["_text"].map(enc)
            yield pd.DataFrame({
                out_id: pdf[out_id],
                "bpe_tokens": toks,
                "n_bpe_tokens": toks.map(len),
            })

    return (docs
            .select(F.col(id_col).alias(out_id),
                    F.col(text_col).alias("_text"))
            .mapInPandas(
                kernel,
                schema=(f"{out_id} {id_type}, bpe_tokens array<string>, "
                        "n_bpe_tokens long")))


def bpe_vocab(wc: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Final (token, count) vocabulary: encode each DISTINCT word once
    (|vocab| rows, not corpus rows), explode its tokens weighted by the
    word count. The encode itself replays the merge sequence with the
    same distributed fold the trainer used — no Python."""
    vocab = wc.filter(F.length("word") > 0).select(
        "count",
        F.expr(
            "concat(slice(split(word, ''), 1, length(word) - 1),"
            f" array(concat(substring(word, -1, 1), '{EOW}')))"
        ).alias("symbols"))
    for i, (a, b) in enumerate(merges):
        # unguarded fold — identity on rows without the pair; see the
        # expression-growth note in learn_bpe
        vocab = vocab.select(
            "count",
            _merge_fold(F.col("symbols"), a, b).alias("symbols"))
        if (i + 1) % 8 == 0:
            vocab = vocab.localCheckpoint()
    return (vocab
            .select(F.explode("symbols").alias("token"), "count")
            .groupBy("token")
            .agg(F.sum("count").alias("count")))
