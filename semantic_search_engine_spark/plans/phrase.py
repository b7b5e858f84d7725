"""Positional index + phrase / proximity retrieval.

The reference's full-text stack is Postgres: a GIN inverted index over
``to_tsvector('english', title)`` (``data-pipeline/database.py:60``). A
tsvector carries *lexeme positions*, which is what powers Postgres's
phrase (``a <-> b``) and proximity (``a <N> b``) operators on top of the
plain term index. This module is that capability Spark-first:

* **Build**: a ``positions`` table alongside ``postings`` — per
  (term, doc-range bucket) blocks holding sorted doc ids plus each doc's
  kept-token positions, all delta+varbyte compressed. Same
  order-preserving doc-bucket salting as the postings build (a head
  term's positions spread over all P buckets), same streaming O(block)
  encoder shape, same term_bucket partition pruning at query time.

* **Query**: one job — pruned positions scan → per-bucket
  ``applyInPandas``: decode the phrase terms' position lists, intersect
  doc ids, verify adjacency (phrase) or minimum window span (proximity)
  with numpy, BM25-score the survivors in sorted-term float order →
  global ``orderBy(score DESC, doc_id ASC).limit(k)`` merge of ≤ P·k
  local hits. Exact per-bucket top-k union argument as WAND
  (plans/wand.py): every global winner lives in exactly one bucket.

* **Recheck fallback** (no positions table): candidates from the plain
  postings conjunction, then re-tokenize candidate docs' text and verify
  — exactly how Postgres executes a phrase query against a GIN index
  (bitmap scan + heap recheck); results are identical to the positional
  path (pinned by test), it just reads candidate documents instead of
  position lists.

Scale: phrase cost is O(Σ |position lists of the phrase terms| / P) per
bucket — the standard positional-intersection bound; the verify loop
touches only docs containing *all* phrase terms (bounded by the rarest
term's df).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from ..functions.varbyte import (
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_varbyte,
)
from ..textproc import min_ordered_window_span_lists, min_window_span_lists

POSITIONS_SCHEMA = (
    "term string, partition_id int, block_id int, n_docs int, "
    "first_doc_id long, last_doc_id long, doc_ids_vb binary, "
    "dls_vb binary, npos_vb binary, pos_vb binary"
)
POSITIONS_COLS = [c.rsplit(" ", 1)[0] for c in POSITIONS_SCHEMA.split(", ")]


def encode_position_block(doc_ids: np.ndarray, dls: np.ndarray,
                          npos: np.ndarray, flat_pos: np.ndarray) -> tuple:
    """One block's payload: (doc_ids_vb, dls_vb, npos_vb, pos_vb).

    ``flat_pos`` is the concatenation of each doc's sorted positions;
    ``npos`` gives the per-doc counts (also the tf). Positions are
    delta-encoded *per doc* (first absolute, then gaps) so gaps stay
    small regardless of document length.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    pos = np.ascontiguousarray(flat_pos, dtype=np.uint64)
    n = np.ascontiguousarray(npos, dtype=np.int64)
    deltas = pos.copy()
    if pos.size:
        deltas[1:] -= pos[:-1]
        starts = np.cumsum(n) - n
        deltas[starts] = pos[starts]
    return (encode_varbyte(delta_encode(ids)),
            encode_varbyte(np.ascontiguousarray(dls, dtype=np.uint64)),
            encode_varbyte(n.astype(np.uint64)),
            encode_varbyte(deltas))


def decode_position_block(row) -> tuple:
    """Inverse: (doc_ids, dls, npos, pos_offsets, flat_positions).

    ``pos_offsets[i]`` is the start of doc i's positions in
    ``flat_positions`` (length n_docs+1). The per-doc delta reset is
    undone vectorized: global cumsum, then subtract each doc's carried-in
    prefix.
    """
    ids = delta_decode(decode_varbyte(bytes(row["doc_ids_vb"])))
    dls = decode_varbyte(bytes(row["dls_vb"])).astype(np.int64)
    npos = decode_varbyte(bytes(row["npos_vb"])).astype(np.int64)
    deltas = decode_varbyte(bytes(row["pos_vb"]))
    offsets = np.concatenate(([0], np.cumsum(npos)))
    cs = np.cumsum(deltas, dtype=np.uint64)
    if deltas.size:
        starts = offsets[:-1]
        # prefix carried into each doc from the global cumsum: cs just
        # before the doc's first position (0 for the first doc)
        carry = np.zeros(len(npos), dtype=np.uint64)
        carry[1:] = cs[starts[1:] - 1]
        flat = cs - np.repeat(carry, npos)
    else:
        flat = cs
    return ids.astype(np.int64), dls, npos, offsets, flat.astype(np.int64)


def make_positions_encoder(block_size: int):
    """mapInPandas body over a (term, partition_id, doc_id)-sorted stream
    of (term, partition_id, doc_id, dl, positions) rows → position block
    rows. Blocks hold ``block_size`` docs; only the stream's last group
    keeps a carry across Arrow batches, so peak memory is O(block) like
    the postings encoder (build_index.make_block_encoder)."""

    def _emit(key, ids, dls, npos, flat, base, out):
        term, pid = key
        n = len(ids)
        bounds = list(range(0, n, block_size)) or [0]
        po = np.concatenate(([0], np.cumsum(npos)))
        for bi, lo in enumerate(bounds):
            hi = min(lo + block_size, n)
            if hi <= lo:
                continue
            dvb, lvb, nvb, pvb = encode_position_block(
                ids[lo:hi], dls[lo:hi], npos[lo:hi],
                flat[po[lo]:po[hi]])
            out.append((term, pid, base + bi, hi - lo,
                        int(ids[lo]), int(ids[hi - 1]),
                        dvb, lvb, nvb, pvb))

    def encode_stream(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key = None
        block_base = 0
        c_ids = c_dls = c_npos = np.zeros(0, dtype=np.int64)
        c_flat = np.zeros(0, dtype=np.int64)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            pids = pdf["partition_id"].to_numpy()
            out: list = []
            change = np.ones(len(pdf), dtype=bool)
            change[1:] = (terms[1:] != terms[:-1]) | (pids[1:] != pids[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(pdf))
            plists = pdf["positions"].to_numpy()

            for gi, (s, e) in enumerate(zip(starts, ends)):
                key = (terms[s], int(pids[s]))
                ids = pdf["doc_id"].to_numpy(dtype=np.int64)[s:e]
                dls = pdf["dl"].to_numpy(dtype=np.int64)[s:e]
                group_pl = [np.asarray(p, dtype=np.int64)
                            for p in plists[s:e]]
                npos = np.array([len(p) for p in group_pl], dtype=np.int64)
                flat = (np.concatenate(group_pl) if group_pl
                        else np.zeros(0, dtype=np.int64))
                base = 0
                if cur_key is not None:
                    if key == cur_key:
                        ids = np.concatenate([c_ids, ids])
                        dls = np.concatenate([c_dls, dls])
                        npos = np.concatenate([c_npos, npos])
                        flat = np.concatenate([c_flat, flat])
                        base = block_base
                    else:
                        # previous group ended at a batch boundary
                        if c_ids.size:
                            _emit(cur_key, c_ids, c_dls, c_npos, c_flat,
                                  block_base, out)
                    cur_key = None
                if gi == len(starts) - 1:
                    # last group of the batch: hold back the partial tail
                    n_full = (len(ids) // block_size) * block_size
                    po = np.concatenate(([0], np.cumsum(npos)))
                    cur_key = key
                    block_base = base + n_full // block_size
                    c_ids = ids[n_full:].copy()
                    c_dls = dls[n_full:].copy()
                    c_npos = npos[n_full:].copy()
                    c_flat = flat[po[n_full]:].copy()
                    if n_full:
                        _emit(key, ids[:n_full], dls[:n_full],
                              npos[:n_full], flat[:po[n_full]], base, out)
                else:
                    _emit(key, ids, dls, npos, flat, base, out)
            if out:
                yield pd.DataFrame(out, columns=POSITIONS_COLS)

        if cur_key is not None and c_ids.size:
            out = []
            _emit(cur_key, c_ids, c_dls, c_npos, c_flat, block_base, out)
            yield pd.DataFrame(out, columns=POSITIONS_COLS)

    return encode_stream


# ---------------------------------------------------------------------------
# Query side
# ---------------------------------------------------------------------------

PHRASE_OUT_SCHEMA = "partition_id int, doc_id long, score double, n_matches int"


def _decode_term_lists(pdf: pd.DataFrame) -> dict[str, tuple]:
    """One bucket's (block_id-sorted) position rows → per-term
    (doc_ids, dls, npos, pos_offsets, flat_positions) with blocks
    concatenated in doc-id order."""
    out: dict[str, list] = {}
    for _, row in pdf.iterrows():
        out.setdefault(row["term"], []).append(decode_position_block(row))
    merged = {}
    for term, parts in out.items():
        ids = np.concatenate([p[0] for p in parts])
        dls = np.concatenate([p[1] for p in parts])
        npos = np.concatenate([p[2] for p in parts])
        flat = np.concatenate([p[4] for p in parts])
        offsets = np.concatenate(([0], np.cumsum(npos)))
        merged[term] = (ids, dls, npos, offsets, flat)
    return merged


def _phrase_starts(doc_slices: list[np.ndarray]) -> int:
    """Count phrase-start positions given each phrase term's position
    array within one doc (term i must appear at start+i)."""
    cands = doc_slices[0]
    for i in range(1, len(doc_slices)):
        if cands.size == 0:
            return 0
        cands = cands[np.isin(cands + i, doc_slices[i],
                              assume_unique=True)]
    return int(cands.size)


def _min_window(doc_slices: list[np.ndarray]) -> int:
    """Minimum inclusive token span covering one position from every
    array — delegates to THE shared sweep core so the positional and
    recheck/snippet paths can never drift apart."""
    return min_window_span_lists(doc_slices)


def _min_ordered_window(doc_slices: list[np.ndarray]) -> int | None:
    """Minimum inclusive span of an in-order position chain (Lucene
    ``SpanNearQuery(inOrder=true)``) — shared core, same reason."""
    return min_ordered_window_span_lists(doc_slices)


def make_positional_bucket_fn(phrase_terms: list[str], k: int, k1: float,
                              b: float, avgdl: float, n_docs: int,
                              max_span: int | None = None,
                              ordered: bool = False):
    """``applyInPandas`` body: one doc bucket's position blocks (with the
    term's global ``df`` broadcast-joined onto every row) → local top-k of
    (doc_id, BM25 score, n_matches).

    ``max_span=None`` → exact phrase (term i adjacent at offset i);
    ``max_span=N`` → proximity (all distinct terms within an N-token
    window; n_matches column carries the minimal span instead);
    ``ordered=True`` (with ``max_span``) → span-near: the terms must
    appear IN QUERY ORDER within the window (Lucene
    ``SpanNearQuery(inOrder=true)``), repeats at distinct positions.
    BM25 accumulates in sorted-term order — the oracle's float order —
    so scores are bit-identical to ``OracleIndex.phrase_top_k``.
    """
    from .wand import bm25_idf

    uniq = sorted(set(phrase_terms))

    def run_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = {"partition_id": pd.Series([], dtype="int32"),
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
                "n_matches": pd.Series([], dtype="int32")}
        if not len(pdf):
            return pd.DataFrame(cols)
        pdf = pdf.sort_values(["term", "block_id"], kind="mergesort")
        lists = _decode_term_lists(pdf)
        if any(t not in lists for t in uniq):
            return pd.DataFrame(cols)
        # candidate docs: contain every distinct term (sorted intersect)
        cand = lists[uniq[0]][0]
        for t in uniq[1:]:
            cand = np.intersect1d(cand, lists[t][0], assume_unique=True)
        if cand.size == 0:
            return pd.DataFrame(cols)
        idf = {t: bm25_idf(n_docs, int(d)) for t, d in
               zip(pdf["term"], pdf["df"])}
        pid = int(pdf["partition_id"].iloc[0])
        # per-term row index of each candidate (ids are sorted)
        locs = {t: np.searchsorted(lists[t][0], cand) for t in uniq}
        hits: list[tuple[int, float, int]] = []
        order = uniq if (max_span is not None and not ordered) \
            else phrase_terms
        for ci, did in enumerate(cand):
            slices = []
            for t in order:
                ids, dls, npos, offs, flat = lists[t]
                j = int(locs[t][ci])
                slices.append(flat[offs[j]:offs[j + 1]])
            if max_span is None:
                nm = _phrase_starts(slices)
                if nm == 0:
                    continue
            elif ordered:
                nm = _min_ordered_window(slices)
                if nm is None or nm > max_span:
                    continue
            else:
                nm = _min_window(slices)
                if nm > max_span:
                    continue
            # BM25 in sorted-term order (idf · tf/(tf+K) — oracle form)
            score = 0.0
            for t in uniq:
                ids, dls, npos, offs, flat = lists[t]
                j = int(locs[t][ci])
                tf = float(npos[j])
                k_dl = k1 * (1.0 - b + b * float(dls[j]) / avgdl)
                score += idf[t] * (tf / (tf + k_dl))
            hits.append((int(did), score, nm))
        hits.sort(key=lambda h: (-h[1], h[0]))
        hits = hits[:k]
        return pd.DataFrame({
            "partition_id": pd.Series([pid] * len(hits), dtype="int32"),
            "doc_id": pd.Series([h[0] for h in hits], dtype="int64"),
            "score": pd.Series([h[1] for h in hits], dtype="float64"),
            "n_matches": pd.Series([h[2] for h in hits], dtype="int32"),
        })

    return run_bucket
