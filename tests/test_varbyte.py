"""Round-trip + property tests for the posting codec (FIXTURES.md §4.4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from semantic_search_engine_spark.functions.varbyte import (
    decode_block,
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_blocks,
    encode_varbyte,
    tf_norm,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varbyte(encode_varbyte(arr)).tolist() == vals


@given(st.sets(st.integers(min_value=0, max_value=2**60 - 1),
               min_size=1, max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_varbyte_compactness():
    small = np.arange(1000, dtype=np.uint64)  # deltas of sorted runs are small
    enc = encode_varbyte(delta_encode(small))
    assert len(enc) < 1100  # ~1 byte per gap vs 8 raw


def test_encode_blocks_roundtrip_and_blockmax():
    rng = np.random.default_rng(7)
    n = 1000
    ids = np.cumsum(rng.integers(1, 50, size=n)).astype(np.uint64)
    tfs = rng.integers(1, 30, size=n).astype(np.uint64)
    dls = rng.integers(20, 2000, size=n).astype(np.uint64)
    avgdl, k1, b = 200.0, 1.2, 0.75
    blocks = encode_blocks(ids, tfs, dls, avgdl, k1, b, block_size=128)
    assert len(blocks) == 8
    out_ids, out_tfs, out_dls = [], [], []
    for blk in blocks:
        i, t, d = decode_block(blk["doc_ids_vb"], blk["tfs_vb"], blk["dls_vb"])
        assert i[0] == blk["first_doc_id"] and i[-1] == blk["last_doc_id"]
        assert len(i) == blk["n_postings"]
        # invariant 4: block max dominates every member contribution
        member = tf_norm(t, d, avgdl, k1, b)
        assert blk["block_max_tf_norm"] >= member.max() - 1e-12
        out_ids.append(i); out_tfs.append(t); out_dls.append(d)
    assert np.array_equal(np.concatenate(out_ids), ids)
    assert np.array_equal(np.concatenate(out_tfs), tfs)
    assert np.array_equal(np.concatenate(out_dls), dls)


def test_empty_inputs():
    assert encode_varbyte(np.zeros(0, dtype=np.uint64)) == b""
    assert decode_varbyte(b"").size == 0
    assert delta_encode(np.zeros(0, dtype=np.uint64)).size == 0
