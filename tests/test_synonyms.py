"""ts_rewrite-style synonym expansion, explain_score, date-histogram facets."""
from __future__ import annotations

from collections import Counter

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.synonyms import (
    expand_terms,
    normalize_synonyms,
    rewrite_clauses,
)
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.boolean import parse_websearch
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)


@pytest.fixture(scope="module")
def built_syn(spark, tiny_corpus_dir, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_syn")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, CFG)


@pytest.fixture(scope="module")
def syn_oracle(tiny_rows):
    return OracleIndex.build(tiny_rows, CFG)


# ------------------------------------------------------------ pure rewrite

def test_normalize_synonyms_tokenizes_and_dedupes():
    out = normalize_synonyms({"Cat": ["FELINE", "cat", "feline"],
                              "dog": []})
    assert out == {"cat": ("feline",)}  # identity + empties dropped


def test_normalize_synonyms_rejects_phrases():
    with pytest.raises(ValueError, match="single indexed term"):
        normalize_synonyms({"hot dog": ["frank"]})
    with pytest.raises(ValueError, match="single indexed term"):
        normalize_synonyms({"dog": ["hot dog"]})


def test_expand_terms_union():
    syn = {"cat": ("feline", "kitty")}
    assert expand_terms(["cat", "food"], syn) == \
        ["cat", "feline", "food", "kitty"]
    assert expand_terms(["dog"], syn) == ["dog"]


def test_rewrite_clauses_matches_manual_dnf():
    """cat→feline on '(cat food) OR dog' == manually written
    '(cat food) OR (feline food) OR dog'."""
    syn = normalize_synonyms({"cat": ["feline"]})
    got = rewrite_clauses(parse_websearch("cat food OR dog"), syn)
    want = parse_websearch("cat food OR feline food OR dog")
    assert set(got) == set(want)
    # negations are NOT expanded
    got2 = rewrite_clauses(parse_websearch("food -cat"), syn)
    assert set(got2) == set(parse_websearch("food -cat"))
    # prefixes/phrases ride along untouched per alternative
    got3 = rewrite_clauses(parse_websearch('cat "big dog" pre*'), syn)
    want3 = parse_websearch('cat "big dog" pre* OR feline "big dog" pre*')
    assert set(got3) == set(want3)


def test_rewrite_clauses_refuses_explosion():
    syn = {f"t{i}": tuple(f"s{i}{j}" for j in range(9)) for i in range(4)}
    with pytest.raises(ValueError, match="OR-clauses"):
        rewrite_clauses(parse_websearch("t0 t1 t2 t3"), syn,
                        max_clauses=64)


def test_rewrite_default_cap_matches_boolean_kernel():
    """The default refusal fires HERE (actionable message) before the
    boolean kernel's own 63-clause ceiling can (review r3): a 64-clause
    expansion must not pass the synonym guard and then crash downstream."""
    syn = {"t0": tuple(f"s{j}" for j in range(63))}  # 1 term → 64 alts
    with pytest.raises(ValueError, match="synonym"):
        rewrite_clauses(parse_websearch("t0"), syn)


# ------------------------------------------------------------ engine paths

def test_synonym_top_k_equals_expanded_wand(built_syn, syn_oracle):
    syn = normalize_synonyms({"zipfhead0": ["zipfhead1"]})
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in built_syn.synonym_top_k_df(
               "zipfhead0 w0000", syn, k=10).collect()]
    want = syn_oracle.top_k(
        " ".join(expand_terms(["w0000", "zipfhead0"], syn)), k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_boolean_synonyms_equal_manual_rewrite(built_syn, syn_oracle):
    syn = normalize_synonyms({"zipfhead0": ["zipfhead1"]})
    got = built_syn.boolean_top_k_df(
        "zipfhead0 w0000 OR zipfhead3", k=10, synonyms=syn).collect()
    got = [(int(r["doc_id"]), float(r["score"])) for r in got]
    want = syn_oracle.boolean_top_k(
        "zipfhead0 w0000 OR zipfhead1 w0000 OR zipfhead3", k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_explain_score_bit_identical_total(built_syn, syn_oracle):
    q = "zipfhead0 w0000 page"
    want = {d: s for d, s in syn_oracle.top_k(q, k=5)}
    for did, score in list(want.items())[:3]:
        ex = built_syn.explain_score(q, did)
        assert ex["total"] == score  # bit-identical float fold
        assert ex["doc_len"] == syn_oracle.doc_len[did]
        for t in ex["terms"]:
            if t["tf"] > 0:
                assert t["df"] == syn_oracle.df(t["term"])
                assert t["contrib"] == pytest.approx(
                    syn_oracle.idf(t["term"])
                    * syn_oracle.tf_norm(t["tf"], ex["doc_len"]),
                    rel=1e-15)
    # absent-from-dictionary term explains as zero
    did = next(iter(want))
    ex = built_syn.explain_score("zzznope", did)
    assert ex["total"] == 0.0
    assert ex["terms"][0]["tf"] == 0 and ex["terms"][0]["contrib"] == 0.0
    with pytest.raises(ValueError, match="not indexed"):
        built_syn.explain_score("page", 123456789)


def test_facet_date_histogram_matches_recount(built_syn, syn_oracle):
    """granularity='day' over warc_ts == Python recount of the 'any'
    match set against the collected doc_meta timestamps."""
    q = "zipfhead0 zipfhead1"
    hist = built_syn.facet_counts(q, by="warc_ts",
                                  granularity="day").collect()
    # expected: docs containing >=1 query term, bucketed by day
    match = set()
    for t in ("zipfhead0", "zipfhead1"):
        match.update(d for d, _tf in syn_oracle.postings.get(t, []))
    meta = {int(r["doc_id"]): r["warc_ts"]
            for r in built_syn.store.read("doc_meta")
            .select("doc_id", "warc_ts").collect()}
    want = Counter(meta[d].replace(hour=0, minute=0, second=0,
                                   microsecond=0)
                   for d in match)
    got = {r["warc_ts"]: int(r["n_docs"]) for r in hist}
    assert got == dict(want)
    # timeline ordering: ascending buckets
    days = [r["warc_ts"] for r in hist]
    assert days == sorted(days)
