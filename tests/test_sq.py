"""Scalar quantization (X79): codes within one quantization step of a
Python reference, bounded reconstruction error, rerank recovers exact
brute-force order, saturation safety, over the driver's embeddings
table."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.ann import brute_force_top_k
from semantic_search_engine_spark.operators.sq import (
    encode_sq,
    fit_sq,
    sq_top_k,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def fitted(emb):
    book = fit_sq(emb)
    codes = encode_sq(emb, book).cache()
    return book, codes


@pytest.fixture(scope="module")
def probe(emb):
    return [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]


def test_fit_matches_python(emb, fitted):
    book, _ = fitted
    import numpy as np
    mat = np.array([list(r["embedding"]) for r in emb.collect()],
                   dtype=np.float64)
    assert book.dim == mat.shape[1]
    assert book.mins == pytest.approx(tuple(mat.min(axis=0)), abs=1e-6)
    assert book.maxs == pytest.approx(tuple(mat.max(axis=0)), abs=1e-6)


def test_codes_match_python_and_bounded_error(emb, fitted):
    book, codes = fitted
    rows = codes.select("vec_id", "embedding", "code").limit(50).collect()
    spans = book.spans()
    for r in rows:
        for i, (v, c) in enumerate(zip(r["embedding"], r["code"])):
            want = round((float(v) - book.mins[i]) / spans[i] * 255) - 128
            want = max(-128, min(127, want))
            assert c == want, (r["vec_id"], i)
            recon = book.mins[i] + (c + 128) / 255.0 * spans[i]
            assert abs(recon - float(v)) <= spans[i] / 255.0 + 1e-9


def test_rerank_recovers_exact_order(emb, fitted, probe):
    book, codes = fitted
    exact = [r["vec_id"] for r in
             brute_force_top_k(emb, probe, k=10).collect()]
    reranked = [r["vec_id"] for r in
                sq_top_k(codes, book, probe, k=10, rerank=100,
                         metric="cosine").collect()]
    assert reranked == exact
    # quantized-only order is a good approximation: high overlap@10
    quant = [r["vec_id"] for r in
             sq_top_k(codes, book, probe, k=10, metric="cosine")
             .collect()]
    assert len(set(quant) & set(exact)) >= 7


def test_saturation_out_of_range(spark):
    from semantic_search_engine_spark.operators.sq import SQCodebook
    book = SQCodebook(mins=(0.0, 0.0), maxs=(1.0, 1.0))
    df = spark.createDataFrame([(1, [5.0, -3.0]), (2, [0.5, 1.0])],
                               "vec_id long, embedding array<double>")
    got = {r["vec_id"]: list(r["code"])
           for r in encode_sq(df, book).collect()}
    assert got[1] == [127, -128]  # saturates, never wraps
    assert got[2][1] == 127


def test_validation(fitted):
    book, codes = fitted
    with pytest.raises(ValueError, match="metric"):
        sq_top_k(codes, book, [0.0] * book.dim, metric="l2")
    with pytest.raises(ValueError, match="dim"):
        sq_top_k(codes, book, [0.0, 1.0])
