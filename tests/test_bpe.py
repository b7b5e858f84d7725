"""BPE vocabulary induction (operators/bpe.py): the distributed trainer
is pinned bit-exactly against the pure-Python reference implementation
(Sennrich et al. 2016 semantics), with determinism, round-trip, and
plan-shape contracts."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from semantic_search_engine_spark.operators import bpe

# Sennrich's canonical toy corpus
TOY = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_local_reference_pinned():
    """The reference trainer reproduces the published first merges for
    the canonical corpus: ('e','s') at count 9, then ('es','t</w>')."""
    merges = bpe.learn_bpe_local(TOY, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    # ties at count 5: ('l','o') vs ('lo','w'-ish chains — lexicographic
    # total order makes the rest deterministic
    assert merges == bpe.learn_bpe_local(TOY, 4)


def test_distributed_matches_reference_toy(spark):
    wc = spark.createDataFrame(list(TOY.items()), "word string, count long")
    ref = bpe.learn_bpe_local(TOY, 10)
    assert bpe.learn_bpe(wc, 10) == ref


def test_distributed_partitioning_invariant(spark):
    """Same merges regardless of how the word table is partitioned —
    the tie-break (count desc, pair asc) is a total order."""
    # engineered ties: two pairs at the same count
    counts = {"ab": 4, "cd": 4, "abcd": 1}
    ref = bpe.learn_bpe_local(counts, 6, min_pair_count=1)
    wc1 = spark.createDataFrame(list(counts.items()),
                                "word string, count long")
    assert bpe.learn_bpe(wc1, 6, min_pair_count=1) == ref
    assert bpe.learn_bpe(wc1.repartition(7), 6, min_pair_count=1) == ref


def test_min_pair_count_stops_early(spark):
    counts = {"ab": 3, "xy": 1}
    # ('a','b</w>') occurs 3x; ('x','y</w>') only once
    assert bpe.learn_bpe_local(counts, 10, min_pair_count=2) == [
        ("a", "b</w>")]
    wc = spark.createDataFrame(list(counts.items()),
                               "word string, count long")
    assert bpe.learn_bpe(wc, 10, min_pair_count=2) == [("a", "b</w>")]


def test_corpus_scale_parity(spark, tiny_corpus_dir):
    """Train on the synthetic corpus's word table (head of the Zipf
    distribution for speed): distributed == reference, merge for
    merge."""
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    wc = bpe.word_counts(docs, text_col="text")
    head = wc.orderBy(F.desc("count"), F.asc("word")).limit(250)
    counts = {r["word"]: r["count"] for r in head.collect()}
    ref = bpe.learn_bpe_local(counts, 12)
    assert len(ref) == 12
    assert bpe.learn_bpe(head, 12) == ref


def test_encode_round_trip_and_reference_parity(spark):
    merges = bpe.learn_bpe_local(TOY, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = spark.createDataFrame(
        [("u1", "the LOWEST newest low"), ("u2", None), ("u3", "")],
        "url string, text string")
    got = {r["url"]: list(r["bpe_tokens"])
           for r in bpe.encode_bpe(docs, merges).collect()}
    # reference: pre-tokenize + encode_word per word
    import re
    words = re.findall(r"[a-z0-9]+", "the lowest newest low")
    want = [t for w in words for t in bpe.encode_word(w, ranks)]
    assert got["u1"] == want
    assert got["u2"] == [] and got["u3"] == []
    # round-trip: tokens concat (EOW stripped) == the words
    joined = "".join(got["u1"]).replace(bpe.EOW, " ").strip()
    assert joined == " ".join(words)


def test_bpe_vocab_matches_reference_encoding(spark):
    wc = spark.createDataFrame(list(TOY.items()), "word string, count long")
    merges = bpe.learn_bpe_local(TOY, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    from collections import Counter
    want: Counter = Counter()
    for w, c in TOY.items():
        for t in bpe.encode_word(w, ranks):
            want[t] += c
    got = {r["token"]: r["count"]
           for r in bpe.bpe_vocab(wc, merges).collect()}
    assert got == dict(want)


def test_training_loop_is_jvm_side(spark):
    """Scale contract: pair counting and merge application are pure
    Catalyst expressions — no Python eval nodes in the physical plan."""
    wc = spark.createDataFrame(list(TOY.items()), "word string, count long")
    vocab = wc.filter(F.length("word") > 0).select(
        "count",
        F.expr(
            "concat(slice(split(word, ''), 1, length(word) - 1),"
            f" array(concat(substring(word, -1, 1), '{bpe.EOW}')))"
        ).alias("symbols"))
    pair_counts = (vocab
                   .select("count",
                           F.explode(bpe._adjacent_pairs("symbols"))
                           .alias("p"))
                   .groupBy("p.a", "p.b")
                   .agg(F.sum("count").alias("n")))
    merged = vocab.select(
        F.when(bpe._has_pair("symbols", "e", "s"),
               bpe._merge_fold(F.col("symbols"), "e", "s"))
        .otherwise(F.col("symbols")).alias("symbols"))
    for df in (pair_counts, merged):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, plan


def test_single_char_words_and_empty(spark):
    counts = {"a": 9, "ab": 4, "b": 2, "": 3}
    ref = bpe.learn_bpe_local(counts, 5, min_pair_count=1)
    wc = spark.createDataFrame(list(counts.items()),
                               "word string, count long")
    assert bpe.learn_bpe(wc, 5, min_pair_count=1) == ref == [
        ("a", "b</w>")]


def test_delta_strategy_matches_recount_toy(spark):
    wc = spark.createDataFrame(list(TOY.items()), "word string, count long")
    ref = bpe.learn_bpe_local(TOY, 10)
    assert bpe.learn_bpe(wc, 10, strategy="delta") == ref


def test_delta_strategy_matches_recount_corpus(spark, tiny_corpus_dir):
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    head = (bpe.word_counts(docs, text_col="text")
            .orderBy(F.desc("count"), F.asc("word")).limit(200)
            .localCheckpoint())
    rec = bpe.learn_bpe(head, 10, strategy="recount")
    dlt = bpe.learn_bpe(head, 10, strategy="delta")
    assert rec == dlt and len(rec) == 10


def test_delta_strategy_min_count_stop_and_validation(spark):
    counts = {"ab": 3, "xy": 1}
    wc = spark.createDataFrame(list(counts.items()),
                               "word string, count long")
    assert bpe.learn_bpe(wc, 10, min_pair_count=2,
                         strategy="delta") == [("a", "b</w>")]
    with pytest.raises(ValueError):
        bpe.learn_bpe(wc, 3, strategy="nope")


def test_encode_bpe_non_string_id(spark):
    """The output schema follows the id column's actual type (a corpus
    keyed by `doc_id long` must not crash on Arrow conversion)."""
    merges = bpe.learn_bpe_local(TOY, 4)
    docs = spark.createDataFrame([(7, "low newest")],
                                 "doc_id long, text string")
    rows = bpe.encode_bpe(docs, merges, id_col="doc_id").collect()
    assert rows[0]["doc_id"] == 7 and rows[0]["n_bpe_tokens"] >= 2
