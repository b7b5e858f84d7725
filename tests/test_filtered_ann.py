"""Filtered ANN (X91): IVF search with a pre-filter (semi-join before
ranking) — exact vs filtered brute force at full probe, and the
pre- vs post-filter semantics distinction pinned."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.ann import (
    IVFIndex,
    brute_force_top_k,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def probe(embeddings):
    row = embeddings.filter(F.col("vec_id") == 5).collect()[0]
    return [float(x) for x in row["embedding"]]


@pytest.fixture(scope="module")
def ivf_idx(embeddings):
    return IVFIndex.build(embeddings, n_lists=8, n_iters=2)


@pytest.fixture(scope="module")
def allowed(spark, embeddings):
    # a metadata predicate stand-in: even vec_ids only
    return embeddings.filter(F.col("vec_id") % 2 == 0).select("vec_id")


def test_full_probe_filtered_is_exact(embeddings, probe, ivf_idx,
                                      allowed):
    exact = brute_force_top_k(
        embeddings.join(allowed, "vec_id"), probe, k=10).collect()
    got = ivf_idx.search(probe, k=10, n_probe=8,
                         allowed=allowed).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    for g, e in zip(got, exact):
        assert g["cosine"] == pytest.approx(e["cosine"], abs=1e-12)
    # every result honors the predicate
    assert all(r["vec_id"] % 2 == 0 for r in got)


def test_prefilter_beats_postfilter(embeddings, probe, ivf_idx,
                                    allowed):
    """Post-filtering (filter AFTER the top-k cut) wastes result slots
    on ineligible rows; pre-filtering returns a full k of eligible
    rows whenever they exist in the probed lists."""
    pre = ivf_idx.search(probe, k=10, n_probe=8,
                         allowed=allowed).collect()
    post = [r for r in ivf_idx.search(probe, k=10, n_probe=8).collect()
            if r["vec_id"] % 2 == 0]
    assert len(pre) == 10
    assert len(post) < 10          # the unfiltered top-10 mixes parities
    # post-filter survivors are a prefix of the pre-filtered ranking
    assert [r["vec_id"] for r in post] == \
        [r["vec_id"] for r in pre][:len(post)]


def test_selective_filter_and_empty(embeddings, probe, ivf_idx, spark):
    one = embeddings.filter(F.col("vec_id") == 7).select("vec_id")
    got = ivf_idx.search(probe, k=5, n_probe=8, allowed=one).collect()
    assert [r["vec_id"] for r in got] == [7]
    none = spark.createDataFrame([], "vec_id long")
    assert ivf_idx.search(probe, k=5, n_probe=8,
                          allowed=none).count() == 0


def test_partial_probe_filtered_recall_monotone(embeddings, probe,
                                                ivf_idx, allowed):
    exact_ids = [r["vec_id"] for r in brute_force_top_k(
        embeddings.join(allowed, "vec_id"), probe, k=10).collect()]

    def recall(n_probe):
        ids = [r["vec_id"] for r in
               ivf_idx.search(probe, k=10, n_probe=n_probe,
                              allowed=allowed).collect()]
        return len(set(ids) & set(exact_ids)) / len(exact_ids)

    assert recall(8) == 1.0
    assert recall(8) >= recall(2)
