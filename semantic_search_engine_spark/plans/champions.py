"""Impact-ordered champion lists (fancy lists / static index pruning).

The classic large-index accelerator (Anh & Moffat "Pruned query evaluation
using pre-computed impacts", SIGIR '06; Carmel et al. "Static index
pruning", SIGIR '01; the "champion lists" of Manning/Raghavan/Schütze
IIR §7.1.3): per term, keep the m postings with the highest per-term BM25
contribution in a tiny side table. Two uses, one table:

1. **Exact theta bootstrap** (`QueryEngine.top_k(theta_bootstrap=True)`):
   score only the query terms' champions driver-side (≤ |q|·m rows), take
   the k-th best PARTIAL score, and seed the WAND heap threshold with it.
   The partial is a true lower bound of that doc's full score — every
   contribution is ≥ 0 and the partial accumulates in the same sorted-term
   float order as the kernel, so IEEE monotone rounding preserves
   partial ≤ full (prefix-with-gaps vs full prefix, term by term). There
   are therefore ≥ k docs whose true score reaches the seed, and WAND with
   a seeded theta (plans/wand.py `min_score`) stays EXACT while pruning
   from the first candidate instead of waiting for the heap to fill. At
   10^12 docs this converts the cold-heap ramp — where WAND evaluates
   nearly everything — into immediate block skips on every head term.

2. **Approximate impact-only retrieval** (`QueryEngine.impact_top_k`):
   answer top-k from the champion table alone — one pruned scan of
   ≤ |q|·m rows, no posting-list traversal at all. Scores are the same
   lower-bound partials; recall is high for the short queries the
   reference serves (any doc in the true top-k that is a champion of ≥ 1
   query term AND whose champion-covered partial beats the k-th
   candidate's partial is found; with m ≥ the longest posting list the
   result is bit-identical to the exact engine — pinned in tests).

Champion SELECTION quality only affects pruning strength, never
correctness: any subset of real postings yields valid lower bounds. The
stored (tf, dl) are the real per-posting values; ordering inside the build
uses the same tf/(tf+K(dl)) expression as the kernel.

Scale shape: the build is one decode pass over the postings table with a
map-local per-(term, Arrow-batch) top-m (numpy argpartition) followed by a
per-term window over ≤ m·ceil(blocks/batch) rows — the full posting lists
are never re-shuffled. The table is partitioned by ``term_bucket`` like
term_stats, so query-time reads prune to the query terms' buckets.

Reference parity: the reference has no champion table — its GIN index
(data-pipeline/database.py:60) re-walks full posting lists per query.
This is the standard way a web-scale engine avoids that.
"""
from __future__ import annotations

import heapq
from typing import Iterator

import pandas as pd

CHAMPIONS_SCHEMA = ("term string, term_bucket int, doc_id long, "
                    "tf int, dl int, tf_norm double")


def make_champion_scan(m: int, avgdl: float, k1: float, b: float):
    """mapInPandas kernel: posting-block rows → per-(term, batch) local
    top-m champion rows by tf/(tf+K(dl)). Emits ≤ m rows per term per
    Arrow batch; the global per-term top-m happens in a window over this
    bounded intermediate."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.varbyte import decode_block

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_t, out_tb, out_id, out_tf, out_dl, out_tn = \
                [], [], [], [], [], []
            # group block rows by term within the batch (blocks of one
            # term are contiguous in storage order but a batch may cut
            # anywhere — per-batch grouping is correct either way)
            for (term, tb), g in pdf.groupby(["term", "term_bucket"],
                                             sort=False):
                ids_l, tfs_l, dls_l = [], [], []
                for dvb, tvb, lvb in zip(g["doc_ids_vb"], g["tfs_vb"],
                                         g["dls_vb"]):
                    i, t, d = decode_block(bytes(dvb), bytes(tvb),
                                           bytes(lvb))
                    ids_l.append(i)
                    tfs_l.append(t)
                    dls_l.append(d)
                ids = np.concatenate(ids_l).astype(np.int64)
                tfs = np.concatenate(tfs_l).astype(np.float64)
                dls = np.concatenate(dls_l).astype(np.float64)
                k_dl = k1 * (1.0 - b + b * dls / avgdl)
                tf_norm = tfs / (tfs + k_dl)
                if ids.size > m:
                    # top-m by (tf_norm DESC, doc_id ASC): argpartition
                    # then a full sort of just the m survivors
                    part = np.argpartition(-tf_norm, m - 1)[:m]
                    order = part[np.lexsort((ids[part], -tf_norm[part]))]
                else:
                    order = np.lexsort((ids, -tf_norm))
                out_t.append(np.repeat(np.array([term], dtype=object),
                                       order.size))
                out_tb.append(np.full(order.size, tb, dtype=np.int32))
                out_id.append(ids[order])
                out_tf.append(tfs[order].astype(np.int32))
                out_dl.append(dls[order].astype(np.int32))
                out_tn.append(tf_norm[order])
            if out_t:
                yield pd.DataFrame({
                    "term": np.concatenate(out_t),
                    "term_bucket": np.concatenate(out_tb),
                    "doc_id": np.concatenate(out_id),
                    "tf": np.concatenate(out_tf),
                    "dl": np.concatenate(out_dl),
                    "tf_norm": np.concatenate(out_tn),
                })

    return scan


def partial_scores(rows, n_docs: int, avgdl: float, k1: float, b: float
                   ) -> dict[int, float]:
    """doc_id → lower-bound partial BM25 score over champion rows.

    ``rows``: iterable of (term, doc_id, tf, dl, df). Accumulation per doc
    runs in sorted-term order with the kernel's exact float expression
    (BlockCursor.contrib: w·(tf/(tf+K(dl)))), so each partial is
    bit-comparable to — and, under IEEE monotone rounding, never above —
    the full score the WAND kernel would produce for that doc.
    """
    from .wand import bm25_idf

    by_doc: dict[int, list] = {}
    for term, doc_id, tf, dl, df in rows:
        by_doc.setdefault(int(doc_id), []).append(
            (term, float(tf), float(dl), int(df)))
    out: dict[int, float] = {}
    for doc_id, lst in by_doc.items():
        s = 0.0
        for term, tf, dl, df in sorted(lst):
            w = bm25_idf(n_docs, df)
            k_dl = k1 * (1.0 - b + b * dl / avgdl)
            s += w * (tf / (tf + k_dl))
        out[doc_id] = s
    return out


def kth_best(partials: dict[int, float], k: int) -> float:
    """The k-th highest partial, or 0.0 when fewer than k champion docs
    exist (no seeding — WAND's native cold-heap behavior is the
    fallback)."""
    if k <= 0 or len(partials) < k:
        return 0.0
    return heapq.nlargest(k, partials.values())[-1]
