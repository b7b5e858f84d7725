"""Phrase suggester (X74): SymSpell candidate lattice + Stupid-Backoff
LM Viterbi, pinned against brute-force enumeration of the whole lattice
(exactness of the decoder) and against planted misspellings
(usefulness)."""
from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.fuzzy import (
    build_deletes_df,
    damerau_levenshtein,
    delete_variants,
)
from semantic_search_engine_spark.operators.lm import train_bigram_lm
from semantic_search_engine_spark.operators.suggest_phrase import (
    suggest_phrase,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox runs fast",
    "a lazy dog sleeps under the brown tree",
    "quick foxes and lazy dogs",
    "the brown dog and the brown fox",
    "over the river and through the woods",
] * 3  # repetition stabilizes counts


@pytest.fixture(scope="module")
def setup(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    lm = train_bigram_lm(docs)
    lm = type(lm)(unigrams=lm.unigrams.cache(),
                  bigrams=lm.bigrams.cache(),
                  total_tokens=lm.total_tokens, alpha=lm.alpha)
    term_stats = (docs.select(F.explode(F.split("text", " ")).alias("term"))
                  .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    deletes = build_deletes_df(term_stats, max_edit=1).cache()
    return lm, deletes


def _brute_force(query, deletes, lm, max_edit=1, per_term=6,
                 error_logp=-4.0):
    """Enumerate EVERY lattice path and score it with the same LM math —
    the exactness oracle for the Viterbi decoder."""
    from semantic_search_engine_spark.textproc import tokenize
    toks = tokenize(query)
    pool = {(r["term"], int(r["df"]))
            for r in deletes.select("term", "df").distinct().collect()}
    lattice = []
    for t in toks:
        cands = sorted(
            ((term, damerau_levenshtein(t, term, cap=max_edit), df)
             for term, df in pool
             if damerau_levenshtein(t, term, cap=max_edit) <= max_edit),
            key=lambda x: (x[1], -x[2], x[0]))[:per_term]
        lattice.append(cands or [(t, 0, 0)])
    uni = {r["w"]: int(r["c"]) for r in lm.unigrams.collect()}
    big = {(r["prev"], r["w"]): (int(r["c"]), int(r["c_prev"]))
           for r in lm.bigrams.collect()}
    n = float(lm.total_tokens)

    def s1(w):
        return math.log(uni.get(w, 1) / n)

    best = None
    for combo in itertools.product(*lattice):
        path = [c for c, _d, _df in combo]
        sc = s1(path[0]) + combo[0][1] * error_logp
        for (pc, _pd, _pdf), (c, d, _df) in zip(combo, combo[1:]):
            hit = big.get((pc, c))
            sc += (math.log(hit[0] / hit[1]) if hit
                   else math.log(lm.alpha) + s1(c)) + d * error_logp
        key = (-sc, tuple(path))
        if best is None or key < best[0]:
            best = (key, path, sc)
    return " ".join(best[1]), best[2]


@pytest.mark.parametrize("query", [
    "quik brown fox",          # one typo
    "the lasy dog",            # one typo
    "quick browm foks",        # two typos
    "the quick brown fox",     # already correct
    "zzzunknown fox",          # OOV token kept verbatim
])
def test_viterbi_matches_brute_force(spark, setup, query):
    lm, deletes = setup
    got = suggest_phrase(query, deletes, lm)[0]
    want_s, want_sc = _brute_force(query, deletes, lm)
    assert got["suggestion"] == want_s
    assert got["logscore"] == pytest.approx(want_sc, abs=1e-9)


def test_planted_typos_corrected(spark, setup):
    lm, deletes = setup
    got = suggest_phrase("quik brown foz", deletes, lm)[0]
    assert got["suggestion"] == "quick brown fox"
    assert got["changed"]


def test_correct_query_unchanged(spark, setup):
    lm, deletes = setup
    got = suggest_phrase("the quick brown fox", deletes, lm)[0]
    assert got["suggestion"] == "the quick brown fox"
    assert not got["changed"]


def test_mild_penalty_still_corrects(spark, setup):
    lm, deletes = setup
    got = suggest_phrase("the kuick brown fox", deletes, lm,
                         error_logp=-2.0)[0]
    assert got["suggestion"] == "the quick brown fox"


def test_real_word_error_corrected_by_context(spark, setup):
    """'lazy dogs sleeps' is all real corpus words, but the bigram LM
    prefers 'dog sleeps' (attested) over 'dogs sleeps' (never seen) —
    with a mild channel penalty the suggester fixes a REAL-WORD error,
    the case ES's phrase suggester exists for (a term suggester keeps
    any in-vocabulary token untouched)."""
    lm, deletes = setup
    got = suggest_phrase("lazy dogs sleeps", deletes, lm,
                         error_logp=-0.5)[0]
    assert got["suggestion"] == "lazy dog sleeps"
    # with full trust in the typed query, the real word survives
    keep = suggest_phrase("lazy dogs sleeps", deletes, lm,
                          error_logp=-50.0)[0]
    assert keep["suggestion"] == "lazy dogs sleeps"


def test_n_best_ordering_and_validation(spark, setup):
    lm, deletes = setup
    out = suggest_phrase("quik fox", deletes, lm, n_best=3)
    assert len(out) <= 3
    scores = [o["logscore"] for o in out]
    assert scores == sorted(scores, reverse=True)
    assert len({o["suggestion"] for o in out}) == len(out)
    with pytest.raises(ValueError, match="error_logp"):
        suggest_phrase("x", deletes, lm, error_logp=0.5)
    assert suggest_phrase("", deletes, lm) == []
