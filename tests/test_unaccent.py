"""Unaccent analyzers (X110): diacritic folding before tokenization.

Postgres chains the ``unaccent`` dictionary in front of a text-search
config; Lucene ships the same transliteration as ``ASCIIFoldingFilter``.
The engine's token regex is ASCII (``[a-z0-9]+``), so folding must run
BEFORE tokenization — "café" would otherwise already have split to
"caf". Pinned: fold table cases, tokenizer behavior under all four
analyzers, oracle retrieval over accented text, and a Spark build/query
rank-identity pass over an accented mini-corpus.
"""

from __future__ import annotations

import math

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.functions.stem import (
    ANALYZERS,
    UNACCENT_ANALYZERS,
    analyze_tokens,
    fold_accents,
)
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.textproc import (
    doc_id_for_url,
    token_positions,
    tokenize,
)


# ---------------------------------------------------------------------------
# fold_accents
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("raw,folded", [
    ("café", "cafe"),
    ("naïve", "naive"),
    ("Zürich", "Zurich"),
    ("résumé", "resume"),
    ("El Niño", "El Nino"),
    ("œuvre", "oeuvre"),
    ("Ærø", "AEro"),
    ("straße", "strasse"),
    ("Łódź", "Lodz"),
    ("smörgåsbord", "smorgasbord"),
    ("Reykjavík þing", "Reykjavik thing"),
    ("plain ascii stays", "plain ascii stays"),
    # letters that NFKD-decompose INTO foldable bases (æ/ø + mark):
    # the ligature fold must run AFTER decomposition or residue is left
    ("ǣther", "aether"),
    ("Ǽsir", "AEsir"),
    ("sǿster", "soster"),
])
def test_fold_accents(raw, folded):
    assert fold_accents(raw) == folded


def test_fold_ascii_fast_path_is_identity():
    s = "the quick brown fox 123"
    assert fold_accents(s) is s  # no-op, same object


# ---------------------------------------------------------------------------
# tokenize under the four analyzers
# ---------------------------------------------------------------------------

TEXT = "Café au Lait — naïve Résumé"


def test_simple_analyzer_splits_accented_words():
    # documents the ASCII-regex behavior the unaccent analyzer fixes
    assert tokenize(TEXT) == ["caf", "au", "lait", "na", "ve", "r",
                              "sum"]


def test_unaccent_analyzer_keeps_words_whole():
    assert tokenize(TEXT, analyzer="unaccent") == [
        "cafe", "au", "lait", "naive", "resume"]


def test_english_unaccent_chains_stopwords_and_stemming():
    toks = tokenize("The cafés were running smoothly",
                    analyzer="english_unaccent")
    # the/were dropped; cafés -> cafes -> cafe; running -> run
    assert toks == ["cafe", "run", "smoothli"]


def test_unknown_analyzer_refused():
    with pytest.raises(ValueError, match="unknown analyzer"):
        analyze_tokens(["x"], "turkish")
    assert "unaccent" in ANALYZERS and "english_unaccent" in ANALYZERS
    assert UNACCENT_ANALYZERS <= ANALYZERS


def test_token_positions_agree_with_tokenize():
    pos = token_positions(TEXT, analyzer="unaccent")
    toks = tokenize(TEXT, analyzer="unaccent")
    assert sorted(i for ps in pos.values() for i in ps) == list(
        range(len(toks)))
    assert pos["cafe"] == [0] and pos["resume"] == [4]


# ---------------------------------------------------------------------------
# oracle retrieval over accented text
# ---------------------------------------------------------------------------

_ROWS = [
    {"url": "fr", "warc_ts": None, "html": None,
     "text": "Le café préféré près du musée", "lang": "fr"},
    {"url": "de", "warc_ts": None, "html": None,
     "text": "Zürich straße über münchen café", "lang": "de"},
    {"url": "plain", "warc_ts": None, "html": None,
     "text": "a plain cafe document with no accents", "lang": "en"},
]


def test_oracle_unaccent_unifies_accented_and_plain():
    idx = OracleIndex.build(_ROWS, EngineConfig(analyzer="unaccent"))
    hits = idx.top_k("cafe", k=10)
    assert len(hits) == 3  # café (×2 docs) and cafe unify
    # and the accented query form finds the plain doc too
    assert {d for d, _ in idx.top_k("café", k=10)} == {d for d, _ in hits}
    # simple analyzer splits café -> caf: the plain doc is NOT found
    simple = OracleIndex.build(_ROWS, EngineConfig())
    assert doc_id_for_url("plain") not in {
        d for d, _ in simple.top_k("café", k=10)}


# ---------------------------------------------------------------------------
# Spark end-to-end rank-identity with analyzer="unaccent"
# ---------------------------------------------------------------------------

UCFG = EngineConfig(analyzer="unaccent", n_doc_buckets=4, n_term_buckets=4,
                    shuffle_partitions=4, block_size=16)


def _docs_df(spark):
    import datetime as dt
    rows = []
    for i, r in enumerate(_ACCENTED_CORPUS):
        rows.append((r["url"], dt.datetime(2026, 1, 1, 0, i),
                     r["html"], r["text"], r["lang"]))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")


_ACCENTED_CORPUS = [
    {"url": f"https://ex.org/{i}", "html": None,
     "text": t, "lang": "xx"}
    for i, t in enumerate([
        "café société générale résumé café",
        "zürich münchen straße café",
        "plain cafe text resume societe",
        "naïve œuvre cœur naïve",
        "naive oeuvre coeur plain",
        "unrelated geology document entirely",
    ])
]


def test_engine_unaccent_rank_identical_to_oracle(spark, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_ua")))
    IndexBuilder(spark, store, UCFG).build(_docs_df(spark))
    qe = QueryEngine(spark, store, None)
    rows = [dict(url=r["url"], warc_ts=None, html=None, text=r["text"],
                 lang=r["lang"]) for r in _ACCENTED_CORPUS]
    oracle = OracleIndex.build(rows, UCFG)
    for q in ["café", "cafe", "résumé", "naïve société", "oeuvre cœur"]:
        got = [(r["doc_id"], r["score"])
               for r in qe.wand_top_k_df(q, k=10).collect()]
        want = oracle.top_k(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=0, abs_tol=1e-12), q
    # accented and folded query forms retrieve identically
    a = [r["doc_id"] for r in qe.wand_top_k_df("café", k=10).collect()]
    b = [r["doc_id"] for r in qe.wand_top_k_df("cafe", k=10).collect()]
    assert a == b and len(a) == 3  # docs 0, 1 (café) and 2 (cafe) unify
