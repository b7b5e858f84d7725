"""Query-time per-term boosting (X87): the ``term^2.5`` query_string
syntax parsed onto the WAND kernel's existing per-term weight hook,
pinned bit-identical against the oracle's boosted ranking."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.plans.query import parse_term_boosts


@pytest.fixture(scope="module")
def boosted_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("boost_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, cfg).build(docs)
    return QueryEngine(spark, store, cfg)


# ------------------------------------------------------------- parser

def test_parser_cases():
    clean, boosts = parse_term_boosts("alpha beta^2 Gamma^0.5")
    assert clean == "alpha beta gamma"
    assert boosts == {"beta": 2.0, "gamma": 0.5}
    # multi-token fragment boosts each token
    clean, boosts = parse_term_boosts("data-pipeline^3 x")
    assert clean == "data pipeline x"
    assert boosts == {"data": 3.0, "pipeline": 3.0}
    # repeated boosted term: last boost wins
    _, boosts = parse_term_boosts("a^2 a^5")
    assert boosts == {"a": 5.0}
    # malformed boost stays literal (tokenizer strips the caret)
    clean, boosts = parse_term_boosts("foo^ bar^x")
    assert clean == "foo bar x"
    assert boosts == {}
    assert parse_term_boosts("") == ("", {})


# ----------------------------------------------------------- rankings

BOOST_QUERIES = [
    "zipfhead0 zipfhead1^3",
    "zipfhead0^0.2 zipfhead1",
    "wireless^4 zipfhead2",
    "zipfhead0 zipfhead1 zipfhead2^2.5",
]


@pytest.mark.parametrize("q", BOOST_QUERIES)
def test_boosted_ranking_matches_oracle(boosted_built, tiny_oracle, q):
    from semantic_search_engine_spark.oracle import boosted_top_k

    qe = boosted_built
    clean, boosts = parse_term_boosts(q)
    want = boosted_top_k(tiny_oracle, clean.split(), boosts, k=10)
    got = qe.term_boosted_top_k(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (gd, gs), (_ed, es) in zip(got, want):
        assert gs == es, (q, gd)


def test_unboosted_equals_plain_top_k(boosted_built):
    qe = boosted_built
    plain = qe.top_k("zipfhead0 zipfhead1", k=10)
    via_boost = qe.term_boosted_top_k("zipfhead0 zipfhead1", k=10)
    assert via_boost == plain


def test_boost_one_is_identity(boosted_built):
    qe = boosted_built
    plain = qe.top_k("zipfhead0 zipfhead1", k=10)
    b1 = qe.term_boosted_top_k("zipfhead0 zipfhead1^1", k=10)
    assert [d for d, _ in b1] == [d for d, _ in plain]
    for (_, gs), (_, ps) in zip(b1, plain):
        assert gs == pytest.approx(ps, abs=1e-12)


def test_boost_changes_order(boosted_built):
    """A big enough boost on the second term must be able to change the
    winner (otherwise the hook is dead code)."""
    qe = boosted_built
    plain = [d for d, _ in qe.top_k("zipfhead0 zipfhead1", k=10)]
    boosted = [d for d, _ in
               qe.term_boosted_top_k("zipfhead0 zipfhead1^50", k=10)]
    assert plain != boosted


def test_explicit_boosts_dict(boosted_built, tiny_oracle):
    from semantic_search_engine_spark.oracle import boosted_top_k

    qe = boosted_built
    boosts = {"zipfhead1": 2.0}
    got = qe.term_boosted_top_k("zipfhead0 zipfhead1", k=5,
                                boosts=boosts)
    want = boosted_top_k(tiny_oracle, ["zipfhead0", "zipfhead1"],
                         boosts, k=5)
    assert got == want
