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


def encode_position_blocks_multi(group_starts: np.ndarray,
                                 doc_ids: np.ndarray, dls: np.ndarray,
                                 npos: np.ndarray, flat_pos: np.ndarray,
                                 block_size: int):
    """Encode MANY groups' position streams into block rows in one
    vectorized pass — bit-identical to the per-group
    :func:`encode_position_block` path (pinned by the fused-vs-two-pass
    byte-equality tests), built like ``varbyte.encode_blocks_multi``:
    per-group Python loops pay ~30 µs per tiny tail-term group, and a
    zipf vocabulary makes tail groups the COUNT majority, so the group
    loop was the dominant cost of the whole positions stage (measured).

    ``group_starts``: sorted start offsets of each (term, partition)
    group within the row arrays; ``flat_pos`` concatenates every row's
    positions, ``npos`` gives per-row counts. No tail compaction —
    positions blocks are plain ``block_size`` chunks, matching the
    historical encoder. Returns ``(block_group_idx, rows)`` with rows
    ``(block_id, n_docs, first_doc_id, last_doc_id, doc_ids_vb, dls_vb,
    npos_vb, pos_vb)``.
    """
    from ..functions.varbyte import encode_varbyte_with_lengths

    n = int(doc_ids.size)
    if n == 0:
        return np.zeros(0, dtype=np.int64), []
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    dls_u = np.ascontiguousarray(dls, dtype=np.uint64)
    npos_i = np.ascontiguousarray(npos, dtype=np.int64)
    pos = np.ascontiguousarray(flat_pos, dtype=np.uint64)
    gs = np.ascontiguousarray(group_starts, dtype=np.int64)

    gidx_of_value = np.searchsorted(gs, np.arange(n), side="right") - 1
    idx_in_group = np.arange(n) - gs[gidx_of_value]
    is_start = (idx_in_group % block_size) == 0
    starts = np.flatnonzero(is_start)
    ends = np.append(starts[1:], n)
    block_ids = (idx_in_group[starts] // block_size).astype(np.int64)
    block_group = gidx_of_value[starts]

    # doc ids: gaps everywhere, absolute at block starts (delta_encode
    # per block ≡ this whole-array form)
    id_deltas = ids.copy()
    id_deltas[1:] -= ids[:-1]
    id_deltas[starts] = ids[starts]

    # positions: gaps within each doc, absolute at each doc's first
    # position — the reset is PER DOC, so it is block-independent and
    # valid computed over the whole batch at once
    po = np.concatenate(([0], np.cumsum(npos_i)))
    deltas = pos.copy()
    if pos.size:
        deltas[1:] -= pos[:-1]
        doc_starts = po[:-1][npos_i > 0]
        deltas[doc_starts] = pos[doc_starts]

    ids_b, ids_len = encode_varbyte_with_lengths(id_deltas)
    dls_b, dls_len = encode_varbyte_with_lengths(dls_u)
    np_b, np_len = encode_varbyte_with_lengths(
        npos_i.astype(np.uint64))
    pos_b, pos_len = encode_varbyte_with_lengths(deltas)
    ids_off = np.concatenate(([0], np.cumsum(ids_len)))
    dls_off = np.concatenate(([0], np.cumsum(dls_len)))
    np_off = np.concatenate(([0], np.cumsum(np_len)))
    pos_voff = np.concatenate(([0], np.cumsum(pos_len)))

    rows = []
    for i in range(len(starts)):
        s, e = int(starts[i]), int(ends[i])
        rows.append((
            int(block_ids[i]), e - s, int(ids[s]), int(ids[e - 1]),
            ids_b[ids_off[s]:ids_off[e]],
            dls_b[dls_off[s]:dls_off[e]],
            np_b[np_off[s]:np_off[e]],
            pos_b[pos_voff[po[s]]:pos_voff[po[e]]],
        ))
    return block_group, rows


def make_positions_encoder(block_size: int):
    """mapInPandas body over a (term, partition_id, doc_id)-sorted stream
    of (term, partition_id, doc_id, dl, positions) rows → position block
    rows. Per Arrow batch ALL groups are encoded in one vectorized pass
    (:func:`encode_position_blocks_multi`); only the stream's last group
    keeps a carry across batches, so peak memory is O(block) like the
    postings encoder (build_index.make_block_encoder)."""

    def emit_multi(keys, gs, ids, dls, npos, flat, bases, out):
        bg, rows = encode_position_blocks_multi(gs, ids, dls, npos, flat,
                                                block_size)
        for gi, row in zip(bg, rows):
            term, pid = keys[gi]
            out.append((term, pid, row[0] + bases[gi]) + row[1:])

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
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            dls = pdf["dl"].to_numpy(dtype=np.int64)
            plists = pdf["positions"].to_numpy()
            npos = np.fromiter((len(p) for p in plists), dtype=np.int64,
                               count=len(plists))
            flat = (np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in plists])
                if len(plists) and npos.sum()
                else np.zeros(0, dtype=np.int64))
            out: list = []

            change = np.ones(len(pdf), dtype=bool)
            change[1:] = (terms[1:] != terms[:-1]) | (pids[1:] != pids[:-1])
            starts = np.flatnonzero(change)
            keys = [(terms[s], int(pids[s])) for s in starts]

            first_key = keys[0]
            if cur_key is not None and first_key != cur_key:
                # carried group ended exactly at the batch boundary
                if c_ids.size:
                    emit_multi([cur_key], np.array([0]), c_ids, c_dls,
                               c_npos, c_flat, [block_base], out)
                cur_key, block_base = None, 0
                c_ids = c_dls = c_npos = np.zeros(0, dtype=np.int64)
                c_flat = np.zeros(0, dtype=np.int64)

            bases = [0] * len(keys)
            if cur_key is not None:
                # prepend the carry to its continuing group
                ids = np.concatenate([c_ids, ids])
                dls = np.concatenate([c_dls, dls])
                npos = np.concatenate([c_npos, npos])
                flat = np.concatenate([c_flat, flat])
                starts = np.concatenate(([0], starts[1:] + c_ids.size))
                bases[0] = block_base

            # hold back the last group's sub-block_size tail (positions
            # blocks have no tail compaction, so a full last block can be
            # emitted immediately — carry stays < block_size docs)
            po = np.concatenate(([0], np.cumsum(npos)))
            last_s = int(starts[-1])
            last_len = len(ids) - last_s
            n_full = (last_len // block_size) * block_size
            cut = last_s + n_full
            cur_key = keys[-1]
            block_base = bases[-1] + n_full // block_size
            c_ids = ids[cut:].copy()
            c_dls = dls[cut:].copy()
            c_npos = npos[cut:].copy()
            c_flat = flat[po[cut]:].copy()
            if cut:
                sel = starts < cut
                emit_multi(keys[:int(sel.sum())], starts[sel],
                           ids[:cut], dls[:cut], npos[:cut],
                           flat[:po[cut]], bases, out)
            if out:
                yield pd.DataFrame(out, columns=POSITIONS_COLS)

        if cur_key is not None and c_ids.size:
            out = []
            emit_multi([cur_key], np.array([0]), c_ids, c_dls, c_npos,
                       c_flat, [block_base], out)
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
