"""SymSpell-style fuzzy term matching + prefix suggestion."""
from __future__ import annotations

import itertools

import pytest

from semantic_search_engine_spark.operators.fuzzy import (
    build_deletes_df,
    damerau_levenshtein,
    delete_variants,
    fuzzy_candidates,
)


def _brute_levenshtein(a: str, b: str) -> int:
    """Plain OSA distance, small-string reference."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            c = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + c)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + c)
    return d[la][lb]


def test_delete_variants_d1():
    assert delete_variants("cat") == ["at", "ca", "cat", "ct"]
    assert delete_variants("a") == ["", "a"]


def test_delete_variants_d2_contains_all_double_deletes():
    vs = set(delete_variants("abcd", max_edit=2))
    for pair in itertools.combinations(range(4), 2):
        s = "".join(c for i, c in enumerate("abcd") if i not in pair)
        assert s in vs
    assert "abcd" in vs and "abc" in vs


@pytest.mark.parametrize("a,b", [
    ("search", "serch"), ("search", "saerch"), ("spark", "spark"),
    ("kitten", "sitting"), ("abc", ""), ("", "xy"), ("ab", "ba"),
    ("monitor", "monitro"), ("q", "qq"),
])
def test_damerau_matches_reference(a, b):
    assert damerau_levenshtein(a, b, cap=10) == _brute_levenshtein(a, b)


def test_damerau_cap_early_exit():
    assert damerau_levenshtein("aaaaaaaa", "bbbbbbbb", cap=2) == 3
    assert damerau_levenshtein("short", "muchlongerstring", cap=3) == 4


def test_symspell_d1_neighborhood_is_complete():
    """Core SymSpell property: strings within OSA distance 1 ALWAYS share
    a deletion variant (d=1 both sides)."""
    words = ["search", "serch", "saerch", "searcx", "searchh", "spark"]
    for a in words:
        for b in words:
            if _brute_levenshtein(a, b) <= 1:
                assert set(delete_variants(a)) & set(delete_variants(b)), \
                    (a, b)


@pytest.fixture(scope="module")
def term_stats_df(spark):
    rows = [("search", 120), ("spark", 90), ("speak", 40), ("sparse", 33),
            ("window", 75), ("widow", 12), ("merge", 51), ("a", 999),
            ("verylongtermthatstayswithincap", 5)]
    return spark.createDataFrame(rows, "term string, df long")


def test_build_deletes_matches_python_reference(spark, term_stats_df):
    out = build_deletes_df(term_stats_df, max_edit=1).collect()
    got: dict[str, set] = {}
    for r in out:
        got.setdefault(r["term"], set()).add(r["variant"])
    for t in ("search", "spark", "a"):
        assert got[t] == set(delete_variants(t)), t


def test_fuzzy_candidates_finds_typos(spark, term_stats_df):
    deletes = build_deletes_df(term_stats_df, max_edit=1)
    # deletion typo
    got = fuzzy_candidates(spark, deletes, "serch")
    assert got[0][0] == "search" and got[0][1] == 1
    # transposition typo
    got = fuzzy_candidates(spark, deletes, "sprak")
    assert ("spark", 1) in [(t, d) for t, d, _ in got]
    # exact hit ranks first at distance 0
    got = fuzzy_candidates(spark, deletes, "window")
    assert got[0] == ("window", 0, 75)
    # "speak" shares the deletion variant "spak" with "spark" but its
    # true distance is 2 — the verifier must reject it at max_edit=1
    got = fuzzy_candidates(spark, deletes, "spark")
    assert got == [("spark", 0, 90)]


def test_fuzzy_candidates_no_match(spark, term_stats_df):
    deletes = build_deletes_df(term_stats_df, max_edit=1)
    assert fuzzy_candidates(spark, deletes, "zzzzzz") == []


# ------------------------------------------------------ engine integration

@pytest.fixture(scope="module")
def built_fuzzy(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                       shuffle_partitions=4, block_size=16)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_fz")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    b = IndexBuilder(spark, store, cfg)
    b.build(docs)
    b.build_fuzzy()
    return QueryEngine(spark, store, cfg)


def test_engine_suggest(built_fuzzy):
    got = built_fuzzy.suggest("zipfhead", n=5)
    assert got and all(t.startswith("zipfhead") for t, _ in got)
    dfs = [df for _, df in got]
    assert dfs == sorted(dfs, reverse=True)
    assert built_fuzzy.suggest("") == []


def test_engine_fuzzy_terms_typo(built_fuzzy):
    # "wireles" (deletion typo) must resolve to the planted "wireless"
    got = built_fuzzy.fuzzy_terms("wireles")
    assert got and got[0][0] == "wireless" and got[0][1] == 1
    # exact dictionary term comes back at distance 0 first
    got = built_fuzzy.fuzzy_terms("wireless")
    assert got[0][0] == "wireless" and got[0][1] == 0


def test_engine_fuzzy_top_k_corrects_and_matches(built_fuzzy):
    plain = built_fuzzy.top_k("wireless bluetooth", k=10)
    hits, corr = built_fuzzy.fuzzy_top_k("wireles bluetooth", k=10)
    assert corr == {"wireles": "wireless"}
    assert hits == plain


def test_engine_fuzzy_requires_build(spark, tiny_corpus_dir,
                                     tmp_path_factory):
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=2, n_term_buckets=2,
                       shuffle_partitions=2, block_size=16)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_fz2")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, cfg).build(docs)
    qe = QueryEngine(spark, store, cfg)
    with pytest.raises(ValueError, match="build_fuzzy"):
        qe.fuzzy_terms("anything")
