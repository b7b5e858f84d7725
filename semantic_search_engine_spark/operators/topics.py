"""Keyword-taxonomy topic labeling — the domain-tagging stage of corpus
curation (C4/Dolma-era pipelines tag pages into coarse domains before
mixing; the trained-classifier version needs a model, this is the
transparent seed-keyword form every pipeline starts with, and its
output column is exactly what X93's ``temperature_sample(by=...)``
balances over).

Scoring: topic score = (matching-token count) / (total tokens) —
keyword hits on the SAME token grid as the index tokenizer (so a
taxonomy term matches iff the query term would); label = argmax score,
ties broken by topic name, with ``min_score`` gating unlabeled docs to
NULL rather than forcing a junk label.

Plan shape: pure JVM — one tokenize expression + one
``size(array_intersect/filter(...))`` per topic, folded into a
``greatest``-style struct-max. No Python, no shuffle, no explode: a
taxonomy of T topics × K keywords adds T codegen columns to the scan.
At web scale keyword sets broadcast inside the expression tree as
literals (T·K ≈ hundreds of strings — bytes, not data)."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spandup import _tok_expr

__all__ = ["topic_scores", "label_topics"]


def _validate(taxonomy: dict[str, list[str]]) -> dict[str, list[str]]:
    if not taxonomy:
        raise ValueError("taxonomy must name at least one topic")
    out = {}
    for topic, kws in taxonomy.items():
        norm = sorted({k.lower() for k in kws if k})
        if not norm:
            raise ValueError(f"topic {topic!r} has no keywords")
        out[topic] = norm
    return out


def topic_scores(docs: DataFrame, taxonomy: dict[str, list[str]],
                 text_col: str = "text") -> DataFrame:
    """Input columns + one ``score_<topic>`` column per topic
    (matching-token fraction in [0, 1]; NULL text scores NULL)."""
    tax = _validate(taxonomy)
    toks = _tok_expr(text_col)
    n = F.size(toks)
    out = docs
    for topic, kws in sorted(tax.items()):
        kw_arr = F.array(*[F.lit(k) for k in kws])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(
            kw_arr, t)))
        score = F.when(F.col(text_col).isNotNull() & (n > 0),
                       hits / n)
        out = out.withColumn(f"score_{topic}", score)
    return out


def label_topics(docs: DataFrame, taxonomy: dict[str, list[str]],
                 text_col: str = "text",
                 min_score: float = 0.0) -> DataFrame:
    """Input columns + ``topic`` (argmax topic, ties by topic name
    ascending) + ``topic_score``; docs scoring <= ``min_score`` on
    every topic (and NULL-text docs) get topic NULL."""
    tax = _validate(taxonomy)
    scored = topic_scores(docs, tax, text_col)
    # struct-max on (score, -name_rank, name): the HIGHEST score wins
    # and score ties pick the lexicographically FIRST topic name
    names = sorted(tax)
    entries = [F.struct(F.col(f"score_{t}").alias("s"),
                        F.lit(-i).alias("r"),
                        F.lit(t).alias("t"))
               for i, t in enumerate(names)]
    best = F.greatest(*entries) if len(entries) > 1 else entries[0]
    labeled = (scored
               .withColumn("_best", best)
               .withColumn(
                   "topic",
                   F.when(F.col("_best.s") > min_score,
                          F.col("_best.t")))
               .withColumn(
                   "topic_score",
                   F.when(F.col("_best.s") > min_score,
                          F.col("_best.s")))
               .drop("_best"))
    return labeled.drop(*[f"score_{t}" for t in tax])
