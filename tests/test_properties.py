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


# ---------------------------------------------------------------------------
# BPE (operators/bpe.py) — pure-Python reference invariants; the Spark
# trainer is pinned bit-equal to this reference in tests/test_bpe.py,
# so properties proven here transfer to the distributed form.
# ---------------------------------------------------------------------------

_words = st.lists(
    st.text(alphabet="abcde01", min_size=1, max_size=8),
    min_size=1, max_size=30)


@given(words=_words, n_merges=st.integers(0, 12))
@settings(max_examples=40, deadline=None)
def test_bpe_encode_round_trip(words, n_merges):
    """Concatenating a word's BPE tokens (EOW stripped) reproduces the
    word, for any learned merge table."""
    from collections import Counter
    from semantic_search_engine_spark.operators.bpe import (
        EOW, encode_word, learn_bpe_local)
    counts = dict(Counter(words))
    merges = learn_bpe_local(counts, n_merges, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(words):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW
        # more merges never produce an empty encoding
        assert len(toks) >= 1


@given(words=_words)
@settings(max_examples=40, deadline=None)
def test_bpe_merges_monotone_token_count(words):
    """Each additional merge never increases any word's token count,
    and the full merge budget compresses at least as well as half."""
    from collections import Counter
    from semantic_search_engine_spark.operators.bpe import (
        encode_word, learn_bpe_local)
    counts = dict(Counter(words))
    full = learn_bpe_local(counts, 12, min_pair_count=1)
    for cut in range(len(full)):
        r_small = {p: i for i, p in enumerate(full[:cut])}
        r_big = {p: i for i, p in enumerate(full[:cut + 1])}
        for w in set(words):
            assert len(encode_word(w, r_big)) <= len(
                encode_word(w, r_small))


@given(words=_words)
@settings(max_examples=30, deadline=None)
def test_bpe_training_encoding_consistency(words):
    """Training's own symbol state after k merges == encoding each word
    with those k merges (the invariant that lets bpe_vocab replay the
    merge sequence instead of storing trainer state)."""
    from collections import Counter
    from semantic_search_engine_spark.operators.bpe import (
        _initial_symbols, encode_word, learn_bpe_local)
    counts = dict(Counter(words))
    merges = learn_bpe_local(counts, 8, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    # replay trainer-style (apply merges in ORDER) and compare with
    # encode_word (apply lowest-rank adjacent pair repeatedly)
    for w in set(words):
        syms = _initial_symbols(w)
        for a, b in merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        assert syms == encode_word(w, ranks), (w, syms)
