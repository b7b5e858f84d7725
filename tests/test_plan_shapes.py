"""Physical-plan assertions for the session's operators — the 100 TB
design points stated in their docstrings, checked against the plans
Catalyst actually produces (the `.explain` discipline, automated)."""
from __future__ import annotations

import pytest

from semantic_search_engine_spark.operators.contamination import (
    contaminated_docs,
)
from semantic_search_engine_spark.operators.diversify import (
    cluster_diverse_top_k,
)
from semantic_search_engine_spark.operators.passages import split_passages
from semantic_search_engine_spark.operators.pii import pii_signals


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_contamination_broadcasts_eval_side(spark):
    """X82's whole design: the eval hashes broadcast, the corpus side
    never sort-merge-joins."""
    docs = spark.createDataFrame(
        [(i, f"some document text number {i} with words")
         for i in range(50)], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(0, "benchmark passage of several words here")],
        "eval_id long, text string")
    plan = _plan(contaminated_docs(docs, ev, n=5))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan


def test_passage_split_is_shuffle_free(spark):
    """X83's splitter is one projection: no Exchange in the plan."""
    docs = spark.createDataFrame(
        [(f"https://p{i}.x/", " ".join(f"w{j}" for j in range(40)))
         for i in range(20)], "url string, text string")
    plan = _plan(split_passages(docs, max_tokens=10))
    assert "Exchange" not in plan, plan


def test_pii_signals_are_codegen_columns(spark):
    """X85 stays JVM-side: no Python runner in the plan, and the
    expressions run inside whole-stage codegen."""
    docs = spark.createDataFrame(
        [(1, "mail a@b.io")], "doc_id long, text string")
    plan = _plan(pii_signals(docs))
    assert "Python" not in plan, plan
    assert "Exchange" not in plan, plan
    # "*(n)" prefixes mark whole-stage-codegen stages in the compact
    # plan string
    assert "*(1)" in plan, plan


def test_cluster_diversity_single_exchange(spark):
    """X84's distributed form: exactly one shuffle (the window's
    partitionBy); the final top-k is TakeOrdered, not a second
    exchange."""
    df = spark.createDataFrame(
        [(i, float(i), f"h{i % 4}") for i in range(40)],
        "doc_id long, score double, host string")
    plan = _plan(cluster_diverse_top_k(df, k=5, by="host"))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
