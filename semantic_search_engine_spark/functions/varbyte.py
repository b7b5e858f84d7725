"""Delta + varbyte posting-list codec with block-max metadata.

The physical analogue of the reference's index artifacts — Postgres GIN
posting trees (``data-pipeline/database.py:59-60``) and ivfflat lists
(``database.py:47-54``) — re-designed for columnar storage: sorted doc-id
runs are delta-encoded then varbyte-compressed (LEB128: 7 payload bits per
byte, MSB = continuation), packed into fixed-size blocks that carry the
max normalized-tf ("block max") used by Block-Max WAND pruning at query
time (Ding & Suel, SIGIR 2011 — public algorithm).

All hot paths are numpy-vectorized (no per-element Python loops over
postings) so they run fast inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def encode_varbyte(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized over byte positions."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    nbits[nbits == 0] = 1
    out = np.zeros(int(nbits.sum()), dtype=np.uint8)
    pos = np.cumsum(nbits) - nbits  # start offset of each value
    shifted = v.copy()
    active = np.ones(v.shape, dtype=bool)
    level = 0
    while active.any():
        idx = pos[active] + level
        chunk = (shifted[active] & _MASK7).astype(np.uint8)
        more = level + 1 < nbits[active]
        out[idx] = chunk | np.where(more, _CONT, np.uint8(0))
        shifted[active] >>= np.uint64(7)
        active = active & (nbits > level + 1)
        level += 1
    return out.tobytes()


def decode_varbyte(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varbyte`. Vectorized."""
    if not data:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8)
    is_last = (b & _CONT) == 0
    # position of each byte within its value (0-based from LSB)
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = ends.size
    values = np.zeros(n, dtype=np.uint64)
    width = ends - starts + 1
    maxw = int(width.max())
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    for level in range(maxw):
        sel = width > level
        values[sel] |= payload[starts[sel] + level] << np.uint64(7 * level)
    return values


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint64 ids → first id + successive gaps."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(deltas, dtype=np.uint64),
                     dtype=np.uint64)


def tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float,
            k1: float, b: float) -> np.ndarray:
    """BM25 term-frequency normalization, vectorized (matches oracle)."""
    tf = tf.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
    return tf / denom


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                  avgdl: float, k1: float, b: float,
                  block_size: int) -> list[dict]:
    """Split one term's sorted postings into compressed block rows.

    Returns dicts with keys matching the ``postings`` table schema:
    block_id, n_postings, first_doc_id, last_doc_id, doc_ids_vb, tfs_vb,
    dls_vb, block_max_tf_norm.
    """
    assert doc_ids.size == tfs.size == dls.size
    blocks = []
    for bi, lo in enumerate(range(0, int(doc_ids.size), block_size)):
        hi = min(lo + block_size, int(doc_ids.size))
        ids = doc_ids[lo:hi]
        t, d = tfs[lo:hi], dls[lo:hi]
        bmax = float(tf_norm(t, d, avgdl, k1, b).max()) if avgdl > 0 else 0.0
        blocks.append({
            "block_id": bi,
            "n_postings": int(hi - lo),
            "first_doc_id": int(ids[0]),
            "last_doc_id": int(ids[-1]),
            "doc_ids_vb": encode_varbyte(delta_encode(ids)),
            "tfs_vb": encode_varbyte(t.astype(np.uint64)),
            "dls_vb": encode_varbyte(d.astype(np.uint64)),
            "block_max_tf_norm": bmax,
        })
    return blocks


def decode_block(doc_ids_vb: bytes, tfs_vb: bytes, dls_vb: bytes):
    """(doc_ids, tfs, dls) uint64 arrays for one block."""
    return (delta_decode(decode_varbyte(doc_ids_vb)),
            decode_varbyte(tfs_vb),
            decode_varbyte(dls_vb))
