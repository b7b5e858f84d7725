"""English analyzer (Porter stemming + Snowball stopwords) — X48.

The reference's index DDL is ``to_tsvector('english', title)``
(``data-pipeline/database.py:60``): lowercase, drop the Snowball English
stopword list, Porter-stem the rest. ``EngineConfig(analyzer="english")``
applies the same normalization at build and query time; the default
``"simple"`` analyzer is pinned bit-identical to the pre-analyzer engine.

The stemmer itself is pinned against the worked examples of the
algorithm's defining paper (M.F. Porter, Program 14(3) 1980) plus the two
canonical departures of the reference implementation (porter.c:
``bli→ble``, ``logi→log``).
"""

import math

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.functions.stem import (
    STOPWORDS_EN,
    analyze_tokens,
    porter_stem,
)
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.textproc import (
    make_snippet,
    token_positions,
    tokenize,
)

# Full-pipeline outputs for the paper's step-by-step examples (§ "The
# algorithm"), i.e. what porter.c produces for each word.
PAPER_VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b (+ cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2 (incl. the two porter.c departures)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # multi-step chains
    "generalizations": "gener", "oscillators": "oscil",
    "running": "run", "argument": "argument",
}


def test_porter_paper_vectors():
    bad = {w: (porter_stem(w), want)
           for w, want in PAPER_VECTORS.items() if porter_stem(w) != want}
    assert not bad, bad


def test_porter_short_and_numeric_tokens_pass_through():
    for w in ("a", "is", "by", "42", "ab1", "x86", "3d"):
        assert porter_stem(w) == w
    # idempotence on already-stemmed forms of the vector set
    for want in PAPER_VECTORS.values():
        assert porter_stem(porter_stem(want)) == porter_stem(want)


def test_analyze_tokens_english_drops_stopwords_and_stems():
    toks = tokenize("The running foxes were jumping over the lazy dogs")
    assert analyze_tokens(toks, "english") == [
        "run", "fox", "jump", "lazi", "dog"]
    assert analyze_tokens(toks, "simple") is toks  # identity, no copy
    with pytest.raises(ValueError):
        analyze_tokens(toks, "englsh")
    assert "the" in STOPWORDS_EN and "t" in STOPWORDS_EN


def test_tokenize_default_is_bit_identical_to_simple():
    s = "The Quick-Brown Fox! jumped 42 times over data-pipelines"
    assert tokenize(s) == tokenize(s, analyzer="simple")
    assert tokenize(s, analyzer="english") == [
        "quick", "brown", "fox", "jump", "42", "time", "data",
        "pipelin"]


def test_token_positions_index_the_analyzed_kept_stream():
    pos = token_positions("the running foxes run", analyzer="english")
    # 'the' dropped; kept stream = [run, fox, run] — renumbered
    assert pos == {"run": [0, 2], "fox": [1]}


def test_snippet_highlights_stemmed_matches():
    out = make_snippet("The running foxes jumped.", ["run", "fox"],
                       analyzer="english")
    assert "<b>running</b>" in out and "<b>foxes</b>" in out
    assert "<b>The</b>" not in out
    # stopword query terms never highlight
    out2 = make_snippet("the cat sat", ["the", "cat"],
                        analyzer="english")
    assert "<b>cat</b>" in out2 and "<b>the</b>" not in out2


# ---------------------------------------------------------------------------
# Oracle-level retrieval semantics with the analyzer (no Spark needed)
# ---------------------------------------------------------------------------

_ROWS = [
    {"url": "u1", "warc_ts": None, "html": None,
     "text": "The runner was running a marathon", "lang": "en"},
    {"url": "u2", "warc_ts": None, "html": None,
     "text": "Cats are running wild, the cats run fast", "lang": "en"},
    {"url": "u3", "warc_ts": None, "html": None,
     "text": "A completely unrelated document about geology",
     "lang": "en"},
]


def test_oracle_english_analyzer_matches_morphological_variants():
    cfg = EngineConfig(analyzer="english")
    idx = OracleIndex.build(_ROWS, cfg)
    # 'runs' stems to 'run' — matches docs containing running/run
    hits = idx.top_k("runs", k=10)
    assert len(hits) == 2
    # the simple analyzer finds nothing for 'runs'
    idx_simple = OracleIndex.build(_ROWS, EngineConfig())
    assert idx_simple.top_k("runs", k=10) == []
    # stopwords contribute nothing: 'the runs' == 'runs'
    assert idx.top_k("the runs", k=10) == hits


def test_oracle_english_doc_len_counts_kept_tokens():
    from semantic_search_engine_spark.textproc import doc_id_for_url
    cfg = EngineConfig(analyzer="english")
    idx = OracleIndex.build(_ROWS, cfg)
    # "The runner was running a marathon" -> runner run marathon
    assert idx.doc_len[doc_id_for_url("u1")] == 3
    assert idx.postings["run"] is not None
    assert "the" not in idx.postings and "was" not in idx.postings


def test_oracle_english_phrase_over_kept_stream():
    cfg = EngineConfig(analyzer="english")
    idx = OracleIndex.build(_ROWS, cfg)
    # kept stream of u2: cat run wild cat run fast — "cats running"
    # stems to (cat, run), adjacent at kept positions (0,1) and (3,4)
    hits = idx.phrase_top_k("cats running", k=10)
    from semantic_search_engine_spark.textproc import doc_id_for_url
    assert [d for d, _s, _n in hits] == [doc_id_for_url("u2")]
    assert hits[0][2] == 2  # two kept-stream occurrences of (cat, run)


# ---------------------------------------------------------------------------
# Spark end-to-end: build with analyzer="english", rank-identity vs oracle
# ---------------------------------------------------------------------------

ECFG = EngineConfig(analyzer="english", n_doc_buckets=8, n_term_buckets=8,
                    shuffle_partitions=8, block_size=32)


@pytest.fixture(scope="module")
def built_english(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("wh_english")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, ECFG).build(docs)
    return store


@pytest.fixture(scope="module")
def oracle_english(tiny_rows):
    return OracleIndex.build(tiny_rows, ECFG)


def test_english_index_has_no_stopword_terms(built_english):
    from pyspark.sql import functions as F
    stop = sorted(STOPWORDS_EN)
    n = (built_english.read("term_stats")
         .filter(F.col("term").isin(stop)).count())
    assert n == 0


def test_english_wand_rank_identical_to_oracle(spark, built_english,
                                               oracle_english):
    from semantic_search_engine_spark.plans.query import QueryEngine

    eng = QueryEngine(spark, built_english, None)  # binds persisted cfg
    assert eng.cfg.analyzer == "english"
    # morphological variants must retrieve: queries in surface form
    for q in ("wireless headphones", "gaming laptops", "running",
              "the smartphone was reviewed"):
        got = [(r["doc_id"], r["score"])
               for r in eng.wand_top_k_df(q, k=10).collect()]
        want = oracle_english.top_k(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=0, abs_tol=1e-9), q


def test_english_plural_query_hits_singular_docs(spark, built_english,
                                                 oracle_english):
    """'headphone' and 'headphones' stem to the same term — the english
    engine returns identical results for both query forms."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    eng = QueryEngine(spark, built_english, None)
    a = [(r["doc_id"], r["score"])
         for r in eng.wand_top_k_df("headphones", k=10).collect()]
    b = [(r["doc_id"], r["score"])
         for r in eng.wand_top_k_df("headphone", k=10).collect()]
    assert a == b and len(a) > 0
    assert [d for d, _ in a] == [d for d, _ in
                                 oracle_english.top_k("headphone", 10)]


def test_stopword_only_query_is_empty(spark, built_english):
    from semantic_search_engine_spark.plans.query import QueryEngine

    eng = QueryEngine(spark, built_english, None)
    assert eng.wand_top_k_df("the and of", k=10).collect() == []
