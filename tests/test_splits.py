"""Leakage-safe corpus splitting (operators/splits.py): hash-split
determinism and growth stability, fraction accuracy, and the no-pair-
straddles-splits guarantee that motivates the operator."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.splits import (
    assign_split,
    leakage_safe_split,
    split_report,
)

FR = {"train": 0.8, "valid": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(2000).select(F.col("id").alias("doc_id"))


def test_every_row_exactly_one_split(spark, keys):
    out = assign_split(keys, FR)
    assert out.count() == 2000
    assert out.filter(F.col("split").isNull()).count() == 0
    assert {r["split"] for r in out.select("split").distinct().collect()} \
        == set(FR)


def test_fraction_accuracy(spark, keys):
    got = {r["split"]: r["n_docs"]
           for r in split_report(assign_split(keys, FR)).collect()}
    for name, frac in FR.items():
        assert abs(got[name] / 2000 - frac) < 0.05, (name, got)


def test_deterministic_and_growth_stable(spark, keys):
    a = {r["doc_id"]: r["split"]
         for r in assign_split(keys, FR, seed=7).collect()}
    b = {r["doc_id"]: r["split"]
         for r in assign_split(keys, FR, seed=7).collect()}
    assert a == b
    # growth stability: doubling the corpus never moves an old doc
    grown = spark.range(4000).select(F.col("id").alias("doc_id"))
    g = {r["doc_id"]: r["split"]
         for r in assign_split(grown, FR, seed=7).collect()}
    assert all(g[k] == v for k, v in a.items())
    # different seed -> different assignment (with 2000 keys, surely)
    c = {r["doc_id"]: r["split"]
         for r in assign_split(keys, FR, seed=8).collect()}
    assert a != c


def test_null_unit_gets_null_split(spark):
    df = spark.createDataFrame([(None,), (1,)], "doc_id long")
    out = assign_split(df, FR).collect()
    by = {r["doc_id"]: r["split"] for r in out}
    assert by[None] is None and by[1] in FR


def test_fraction_validation(spark, keys):
    with pytest.raises(ValueError):
        assign_split(keys, {"train": 0.5, "test": 0.2})
    with pytest.raises(ValueError):
        assign_split(keys, {})


def test_leakage_safe_no_pair_straddles(spark, keys):
    """Chain components across many docs; the naive per-doc split
    breaks at least one pair (proving the test has teeth), the
    cluster split breaks none."""
    # 300 pairs: (i, i+1000) plus chains (i, i+1) for i in 0..99
    pairs = spark.createDataFrame(
        [(i, i + 1000) for i in range(200)]
        + [(i, i + 1) for i in range(100)],
        "key_a long, key_b long")
    naive = assign_split(keys, FR, seed=3)
    nmap = {r["doc_id"]: r["split"] for r in naive.collect()}
    straddles = sum(
        1 for r in pairs.collect() if nmap[r["key_a"]] != nmap[r["key_b"]])
    assert straddles > 0, "naive split never straddled — test is vacuous"

    safe = leakage_safe_split(keys, pairs, FR, seed=3)
    smap = {r["doc_id"]: r["split"] for r in safe.collect()}
    assert len(smap) == 2000
    for r in pairs.collect():
        assert smap[r["key_a"]] == smap[r["key_b"]], (
            r["key_a"], r["key_b"])
    # transitivity: the 0..100 chain is ONE component -> one split
    chain_splits = {smap[i] for i in range(101)}
    assert len(chain_splits) == 1


def test_leakage_safe_singletons_follow_unit_hash(spark, keys):
    """Docs outside every pair split exactly as assign_split would
    (their component is their own key)."""
    pairs = spark.createDataFrame([(1, 2)], "key_a long, key_b long")
    safe = {r["doc_id"]: r["split"]
            for r in leakage_safe_split(keys, pairs, FR, seed=5).collect()}
    plain = {r["doc_id"]: r["split"]
             for r in assign_split(keys, FR, seed=5).collect()}
    for k, v in plain.items():
        if k not in (1, 2):
            assert safe[k] == v


def test_split_is_shuffle_free(spark, keys):
    """assign_split adds no exchange and no Python eval node."""
    plan = assign_split(keys, FR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_end_to_end_minhash_to_split(spark):
    """Full pipeline composition: planted near-dup families detected by
    the REAL detector (shingle MinHash -> LSH bands -> exact-Jaccard
    verify), then split leakage-safe — every verified near-dup pair
    shares a split, and distinct families can still land apart."""
    from semantic_search_engine_spark.operators.dedup import (
        lsh_candidate_pairs,
        shingle_minhash_signatures,
        verify_jaccard,
    )

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank while birds sing in the morning light")
    rows = []
    for fam in range(12):
        fam_text = base + f" family {fam} marker words here"
        for v in range(3):  # 3 near-identical variants per family
            rows.append((fam * 10 + v, fam_text + (" extra" * v)))
    for i in range(200, 260):  # unrelated singletons
        rows.append((i, f"totally different document number {i} with "
                        f"unique content about topic {i * 7} and more "
                        f"words {i * 13} to pass the shingle minimum"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = shingle_minhash_signatures(docs)
    cand = lsh_candidate_pairs(sigs)
    pairs = verify_jaccard(docs, cand, threshold=0.6)
    assert pairs.count() >= 12, "detector missed the planted families"

    out = leakage_safe_split(docs, pairs.select("key_a", "key_b"),
                             FR, seed=11)
    smap = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in pairs.collect():
        assert smap[r["key_a"]] == smap[r["key_b"]]
    # sanity: the corpus still spreads across more than one split
    assert len(set(smap.values())) > 1
