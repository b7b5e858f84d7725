"""Hypothesis property tests (SURVEY.md §5.2 item 5 — the layer the
reference lacks): codec round-trips, block-max soundness, WAND-vs-
exhaustive equivalence, tokenizer invariants. Pure-Python/numpy — no Spark
session, so they run in milliseconds and shrink on failure."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from semantic_search_engine_spark.functions.varbyte import (
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_blocks,
    encode_varbyte,
    tf_norm,
)
from semantic_search_engine_spark.plans.wand import wand_top_k
from semantic_search_engine_spark.textproc import tokenize

K1, B = 1.2, 0.75

uint64s = st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                   min_size=0, max_size=300)


@given(uint64s)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_varbyte(encode_varbyte(arr)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**60 - 1),
                min_size=1, max_size=200, unique=True))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_on_sorted_ids(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@given(st.lists(st.tuples(st.integers(0, 2**40), st.integers(1, 1000),
                          st.integers(1, 5000)),
                min_size=1, max_size=400),
       st.integers(2, 64))
@settings(max_examples=100, deadline=None)
def test_block_max_bounds_every_member(postings, block_size):
    postings = sorted({p[0]: p for p in postings}.values())
    ids = np.array([p[0] for p in postings], dtype=np.uint64)
    tfs = np.array([p[1] for p in postings], dtype=np.uint64)
    dls = np.array([p[2] for p in postings], dtype=np.uint64)
    avgdl = float(dls.mean())
    blocks = encode_blocks(ids, tfs, dls, avgdl, K1, B, block_size)
    norms = tf_norm(tfs, dls, avgdl, K1, B)
    off = 0
    for blk in blocks:
        n = blk["n_postings"]
        assert blk["block_max_tf_norm"] >= norms[off:off + n].max() - 1e-15
        off += n
    assert off == len(postings)


@given(st.integers(0, 2**32), st.integers(1, 4), st.integers(1, 20),
       st.integers(2, 16))
@settings(max_examples=60, deadline=None)
def test_wand_equals_exhaustive(seed, n_terms, k, block_size):
    rng = np.random.Generator(np.random.PCG64(seed))
    n_docs = int(rng.integers(5, 300))
    doc_len = rng.integers(5, 200, size=n_docs)
    avgdl = float(doc_len.mean())
    term_blocks, weights, scores = {}, {}, {}
    for t in range(n_terms):
        term = f"t{t}"
        mask = rng.random(n_docs) < 0.3
        ids = np.flatnonzero(mask).astype(np.uint64)
        if ids.size == 0:
            continue
        tfs = rng.integers(1, 6, size=ids.size).astype(np.uint64)
        dls = doc_len[ids.astype(np.int64)].astype(np.uint64)
        term_blocks[term] = encode_blocks(ids, tfs, dls, avgdl, K1, B,
                                          block_size)
        weights[term] = float(rng.uniform(0.05, 4.0))
    # exhaustive scoring in sorted-term order, from the decoded blocks
    exp: dict[int, float] = {}
    for term in sorted(term_blocks):
        w = weights[term]
        from semantic_search_engine_spark.functions.varbyte import decode_block
        for blk in term_blocks[term]:
            i, tf, dl = decode_block(blk["doc_ids_vb"], blk["tfs_vb"],
                                     blk["dls_vb"])
            for d, f, l in zip(i.astype(int), tf.astype(int), dl.astype(int)):
                kdl = K1 * (1 - B + B * float(l) / avgdl)
                exp[d] = exp.get(d, 0.0) + w * (f / (f + kdl))
    expected = sorted(exp.items(), key=lambda x: (-x[1], x[0]))[:k]
    got, _ = wand_top_k(term_blocks, weights, k, K1, B, avgdl)
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (gd, gs), (ed, es) in zip(got, expected):
        assert math.isclose(gs, es, abs_tol=1e-12)


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_tokenizer_invariants(text):
    toks = tokenize(text)
    for t in toks:
        assert t == t.lower()
        assert t.isascii() and t.isalnum()
        assert 1 <= len(t) <= 64
    # idempotent under re-join
    assert tokenize(" ".join(toks)) == toks
