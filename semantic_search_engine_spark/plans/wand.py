"""Block-Max WAND top-k over compressed posting blocks (SURVEY.md §2.2 E10).

The fast query path: posting-list intersection with block-max pruning and a
bounded min-heap (Broder et al., CIKM 2003; Ding & Suel, SIGIR 2011 — public
algorithms). Reproduces the reference's scored top-k semantics
(``search-api/.../repository/ProductRepository.java:70-82``: ORDER BY
similarity DESC LIMIT k) without scoring every candidate: lagging cursors
hop over whole compressed blocks via their ``last_doc_id`` fences without
decoding them, and candidates whose block-max score upper bound cannot beat
the current k-th score are skipped without computing BM25.

Distribution model (Spark-first): the postings table is range-bucketed by
doc id (``partition_id``), so every bucket holds a doc-id-sorted slice of
each term's posting list. WAND runs *independently per bucket* inside one
``applyInPandas`` group — the union of per-bucket top-K sets is a superset
of the global top-K (each global winner lives in exactly one bucket and must
be in that bucket's local top-K), so a final
``orderBy(score DESC, doc_id ASC).limit(K)`` merge over ≤ P·K candidate rows
is exact. At web scale each group sees only ~|term postings|/P compressed
bytes and the merge moves P·K ≈ thousands of rows — no full-corpus shuffle.

Determinism (rank-identity with the single-node oracle): a document's score
is accumulated over query terms in sorted-term order — the identical float
summation order used by ``oracle.OracleIndex.search`` — and ordering is
``(score DESC, doc_id ASC)`` throughout. Pruning is exact including
tie-breaks: WAND visits candidates in increasing doc_id order, so every
heap member has a smaller doc_id than any future candidate — a future doc
that can at best *tie* the k-th score would lose the doc_id tie-break
anyway, which makes the classic strict-``>`` pivot test and ``<=``
block-skip lossless under our deterministic ordering.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from ..functions.varbyte import decode_varbyte, delta_decode

EXHAUSTED = 1 << 62


def bm25_idf(n_docs: int, df: int) -> float:
    """Robertson idf — the exact float expression the oracle uses."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class BlockCursor:
    """Doc-at-a-time cursor over one term's compressed block sequence.

    Blocks arrive sorted by doc id (build order: ``partition_id, block_id``).
    ``seek`` first hops over blocks whose ``last_doc_id`` fence is below the
    target — those are never decoded — then binary-searches inside the one
    decoded block. ``decoded_blocks`` counts decodes (pruning evidence).
    """

    __slots__ = ("weight", "blocks", "lasts", "k1", "b", "avgdl", "bi",
                 "pos", "ids", "tfs", "dls", "cur_doc", "decoded_blocks",
                 "max_block_ub", "term_rank", "ub_scale")

    def __init__(self, blocks: list[dict], weight: float,
                 k1: float, b: float, avgdl: float, term_rank: int = 0,
                 ub_scale: float = 1.0):
        #: position of this cursor's term in sorted(query terms) — the
        #: score-summation tie-break that keeps float accumulation in the
        #: oracle's exact order
        self.term_rank = term_rank
        self.weight = weight
        self.blocks = blocks
        self.lasts = np.array([blk["last_doc_id"] for blk in blocks],
                              dtype=np.int64)
        self.k1, self.b, self.avgdl = k1, b, avgdl
        #: multiplier on the stored block-max bounds (NOT on contrib): the
        #: federated path scores a sub-index's postings under the GLOBAL
        #: avgdl while its ``block_max_tf_norm`` was computed under the
        #: sub-index's own avgdl — ``max(1, avgdl_global/avgdl_local)``
        #: re-sounds the bound (tf/(tf+K(dl)) grows by at most that ratio
        #: when K shrinks with a larger avgdl); see federate.py for the
        #: derivation and the float-safety margin baked into the caller.
        self.ub_scale = ub_scale
        self.bi = -1
        self.pos = 0
        self.ids = self.tfs = self.dls = None
        self.cur_doc = EXHAUSTED
        self.decoded_blocks = 0
        self.max_block_ub = weight * max(
            (blk["block_max_tf_norm"] for blk in blocks), default=0.0
        ) * ub_scale
        self._enter_block(0)

    # ------------------------------------------------------------------
    def _enter_block(self, bi: int) -> None:
        """Decode block ``bi`` and stand on its first entry."""
        if bi >= len(self.blocks):
            self.bi = len(self.blocks)
            self.cur_doc = EXHAUSTED
            return
        blk = self.blocks[bi]
        self.bi = bi
        self.ids = delta_decode(
            decode_varbyte(blk["doc_ids_vb"])).astype(np.int64)
        self.tfs = decode_varbyte(blk["tfs_vb"]).astype(np.int64)
        self.dls = decode_varbyte(blk["dls_vb"]).astype(np.int64)
        self.decoded_blocks += 1
        self.pos = 0
        self.cur_doc = int(self.ids[0])

    # ------------------------------------------------------------------
    def block_ub(self) -> float:
        """Score upper bound of the *current* block (block-max metadata)."""
        if self.bi >= len(self.blocks):
            return 0.0
        return (self.weight * self.blocks[self.bi]["block_max_tf_norm"]
                * self.ub_scale)

    def seek(self, target: int) -> None:
        """Advance to the first posting with doc id >= target."""
        if self.cur_doc >= target:
            return
        # fence-hop: binary search the block whose last_doc_id >= target
        if self.bi < len(self.blocks) and target > self.lasts[self.bi]:
            bi = int(np.searchsorted(self.lasts, target, side="left"))
            self._enter_block(bi)
            if self.cur_doc >= target:
                return
        if self.bi >= len(self.blocks):
            return
        # in-block binary search (block's last_doc_id >= target here)
        pos = int(np.searchsorted(self.ids, target, side="left"))
        self.pos = pos
        self.cur_doc = int(self.ids[pos])

    def next_doc(self) -> None:
        self.pos += 1
        if self.pos < len(self.ids):
            self.cur_doc = int(self.ids[self.pos])
        else:
            self._enter_block(self.bi + 1)

    def contrib(self) -> float:
        """BM25 contribution of the current posting: w·(tf/(tf + K(dl))).

        Parenthesization matters: the oracle computes ``w * tf_norm`` —
        evaluating ``(w*tf)/(...)`` instead can differ by 1 ulp and flip a
        near-tie rank.
        """
        tf = float(self.tfs[self.pos])
        k_dl = self.k1 * (1.0 - self.b
                          + self.b * float(self.dls[self.pos]) / self.avgdl)
        return self.weight * (tf / (tf + k_dl))


def wand_top_k(
    term_blocks: dict[str, list[dict]],
    weights: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    allowed: "np.ndarray | None" = None,
    min_score: float = 0.0,
    avgdl_by_term: "dict[str, float] | None" = None,
    after: "tuple[float, int] | None" = None,
    min_match: int = 1,
    ub_scale: float = 1.0,
) -> tuple[list[tuple[int, float]], dict]:
    """Exact block-max WAND top-k over one doc-id-sorted posting slice.

    ``term_blocks``: term → blocks sorted by doc id. ``weights``: term → idf.
    ``allowed``: optional sorted int64 doc-id array — the structured-filter
    survivor set for this doc bucket (Q3–Q6 pushed into the fast path);
    docs outside it are skipped before scoring, which only shrinks the
    candidate set and therefore preserves pruning exactness.

    ``min_score``: score threshold (the reference's Q2 similarity cutoff,
    ``ProductRepository.java:74``: ``similarity >= ?`` with inclusive
    semantics). It SEEDS theta instead of post-filtering: before the heap
    fills, theta is ``nextafter(min_score, -inf)`` rather than −inf, so
    pruning starts strong from the first candidate — a threshold makes
    WAND *faster*, not exhaustive. Exactness: the pivot test is strict
    ``acc > theta``, so a candidate whose bound equals min_score exactly
    still gets evaluated (inclusive ``>=`` preserved), and evaluated docs
    scoring below min_score never enter the heap (they can't be results,
    and keeping them out keeps the heap's k-th score an honest theta).
    ``after``: keyset-pagination cursor ``(score, doc_id)`` — the last hit
    of the previous page. Only docs strictly AFTER it in the result order
    qualify: ``score < after[0]`` or (``score == after[0]`` and
    ``doc_id > after[1]``). Like ``allowed``, this only shrinks the
    candidate set, so the pivot/block-skip argument is unchanged; unlike
    OFFSET pagination (which must materialize and discard k+offset rows —
    O(page_depth) per page), the heap holds exactly k qualifying docs at
    any depth. Exact-equality on the score is sound because scores are
    bit-reproducible (the cursor comes from this engine's own previous
    page). Disqualified docs never enter the heap, so theta stays an
    honest lower bound for *qualifying* docs.

    ``avgdl_by_term``: per-term average-doc-length override (the
    multi-field path qualifies terms as ``field\\x00term`` and each
    field's cursors normalize against THAT field's avgdl — the dls baked
    into a field's blocks are that field's doc lengths, and its
    block_max_tf_norm bounds were computed under its own avgdl, so
    block-skip exactness is preserved per cursor). Terms absent from the
    dict use the global ``avgdl``.

    ``min_match``: minimum-should-match over the query's terms
    (Elasticsearch ``minimum_should_match`` / Lucene ``MinShouldMatchSumScorer``
    semantics): a doc qualifies only if at least ``min_match`` DISTINCT
    query terms occur in it; its score is still the BM25 sum over the
    terms it matches. Exactness: the constraint only DISQUALIFIES
    candidates (like ``allowed``/``after``), so theta remains a lower
    bound over qualifying docs and pivot/block-skip stay lossless; docs
    are disqualified by the cursor count standing on the pivot — exactly
    the distinct matching terms — before any scoring. Once fewer than
    ``min_match`` cursors remain un-exhausted no future doc can qualify
    and the scan stops early (a pruning rule plain WAND doesn't have).

    ``ub_scale``: multiplier applied to every cursor's block-max bounds
    (never to evaluated scores). The federated path (federate.py) scores
    a sub-index's postings under GLOBAL corpus stats while the stored
    ``block_max_tf_norm`` was computed under the sub-index's own avgdl;
    ``max(1, avgdl_global/avgdl_local)`` (plus a 1e-9 float margin)
    re-sounds the bound, so pruning stays lossless — merely ≤1e-9 looser.

    Returns ``(hits, stats)``: hits as ``(doc_id, score)`` in
    ``(score DESC, doc_id ASC)`` order; stats reports pruning counters.
    """
    # strictly below min_score, so `acc > seed_theta` ⟺ `acc >= min_score`
    seed_theta = (math.nextafter(min_score, float("-inf"))
                  if min_score > 0.0 else float("-inf"))
    cursors = []
    if k > 0:  # k<=0: empty result, not an empty-heap indexing error
        for rank, term in enumerate(sorted(term_blocks)):
            blocks = term_blocks[term]
            t_avgdl = (avgdl_by_term.get(term, avgdl)
                       if avgdl_by_term else avgdl)
            if blocks and term in weights and t_avgdl > 0:
                c = BlockCursor(blocks, weights[term], k1, b, t_avgdl,
                                term_rank=rank, ub_scale=ub_scale)
                if c.cur_doc != EXHAUSTED:
                    cursors.append(c)
    all_cursors = list(cursors)

    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    evaluated = 0
    skipped_evals = 0
    filtered_out = 0
    before_cursor = 0
    under_min_match = 0

    while cursors:
        if min_match > 1 and len(cursors) < min_match:
            break  # no future doc can match enough distinct terms
        # secondary key term_rank: docs tie across cursors, and at_pivot
        # must enumerate them in sorted-term order (oracle float order) —
        # stability alone would carry over an arbitrary earlier order
        cursors.sort(key=lambda c: (c.cur_doc, c.term_rank))
        theta = heap[0][0] if len(heap) >= k else seed_theta
        # pivot: smallest prefix whose summed term UBs can *beat* theta.
        # Strict `>` is exact including tie-breaks: candidates arrive in
        # increasing doc_id order, so every heap member has a smaller doc_id
        # than any future candidate — a future doc scoring exactly theta
        # loses the (score DESC, doc_id ASC) tie-break and is prunable.
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(cursors):
            acc += c.max_block_ub
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # no remaining doc can reach the k-th score
        pivot_doc = cursors[pivot_idx].cur_doc

        if cursors[0].cur_doc == pivot_doc:
            # all cursors at the pivot doc (sorted ⇒ prefix is exactly here;
            # later cursors may tie). Bound the doc with current-block maxima
            # over *every* cursor standing on pivot_doc.
            at_pivot = [c for c in cursors if c.cur_doc == pivot_doc]
            block_ub = sum(c.block_ub() for c in at_pivot)
            excluded = allowed is not None and not (
                (i := int(np.searchsorted(allowed, pivot_doc))) < len(allowed)
                and int(allowed[i]) == pivot_doc)
            if excluded:
                filtered_out += 1
            elif min_match > 1 and len(at_pivot) < min_match:
                under_min_match += 1  # too few distinct terms: disqualified
            elif block_ub <= theta:
                # theta is -inf until the heap fills (so this branch is
                # unreachable then) UNLESS min_score seeded it — a doc
                # bounded at or below the seed can't reach the inclusive
                # threshold and is skippable with any heap fill
                skipped_evals += 1
            else:
                # at_pivot is (cur_doc, term_rank)-sorted ⇒ oracle order
                score = 0.0
                for c in at_pivot:
                    score += c.contrib()
                evaluated += 1
                entry = (score, -pivot_doc)
                if score < min_score:
                    pass  # below the threshold: never a result
                elif after is not None and not (
                        score < after[0]
                        or (score == after[0] and pivot_doc > after[1])):
                    before_cursor += 1  # at or before the page cursor
                elif len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry > heap[0]:
                    heapq.heapreplace(heap, entry)
            for c in at_pivot:
                c.next_doc()
        else:
            # lagging cursors jump to the pivot, hopping fences undecoded
            for c in cursors:
                if c.cur_doc >= pivot_doc:
                    break
                c.seek(pivot_doc)
        cursors = [c for c in cursors if c.cur_doc != EXHAUSTED]

    hits = sorted(((-d, s) for s, d in heap), key=lambda x: (-x[1], x[0]))
    stats = {
        "evaluated_docs": evaluated,
        "skipped_evals": skipped_evals,      # block-max UB prunes only
        "filtered_out": filtered_out,        # structured-filter exclusions
        "before_cursor": before_cursor,      # keyset-pagination exclusions
        "under_min_match": under_min_match,  # min-should-match exclusions
        "decoded_blocks": sum(c.decoded_blocks for c in all_cursors),
        "total_blocks": sum(len(v) for v in term_blocks.values()),
    }
    return hits, stats


def group_blocks_by_term(pdf) -> dict[str, list[dict]]:
    """pandas block rows (sorted by (term, partition_id, block_id)) →
    term → block dicts for :class:`BlockCursor`."""
    out: dict[str, list[dict]] = {}
    for term, last, bmax, dvb, tvb, lvb in zip(
            pdf["term"], pdf["last_doc_id"], pdf["block_max_tf_norm"],
            pdf["doc_ids_vb"], pdf["tfs_vb"], pdf["dls_vb"]):
        out.setdefault(term, []).append({
            "last_doc_id": int(last),
            "block_max_tf_norm": float(bmax),
            "doc_ids_vb": bytes(dvb),
            "tfs_vb": bytes(tvb),
            "dls_vb": bytes(lvb),
        })
    return out


BATCH_WAND_OUT_SCHEMA = ("query_id int, partition_id int, doc_id long, "
                         "score double")


def make_wand_batch_group_fn(query_terms: dict[int, list[str]],
                             k: int, k1: float, b: float, avgdl: float,
                             n_docs: int, min_score: float = 0.0,
                             after: "tuple[float, int] | None" = None,
                             term_boosts: "dict[str, float] | None" = None,
                             min_match: int = 1):
    """``applyInPandas`` body for MULTI-QUERY WAND: one doc bucket's blocks
    (the union of every query's term postings) → per-query local top-k.

    Amortizes the per-job scheduling floor across N queries: the postings
    scan, the shuffle to bucket groups, and the group task launch are paid
    ONCE for the whole batch instead of once per query (BENCH r1: an
    absent-term query still cost ~0.45 s of pure job overhead). Inside a
    bucket the blocks are grouped by term once; each query then runs the
    standard exact block-max WAND over its own term subset, so per-query
    results are identical to the single-query path (rank-identity pinned
    by test).

    Term weights are NOT precomputed on the driver: each block row carries
    the term's global ``df`` (broadcast-joined from term_stats inside the
    same job), and idf is computed here with the oracle's exact Python
    float expression — so a query costs ONE Spark job, with no
    driver-side term-lookup collect before it.

    The closure ships |Σ query terms| strings — still broadcast-sized.
    """

    def run_bucket(pdf):
        return _run_bucket_batch(pdf, None, query_terms, k, k1, b, avgdl,
                                 n_docs, min_score, after, term_boosts,
                                 min_match)

    return run_bucket


def _run_bucket_batch(pdf, allowed, query_terms, k, k1, b, avgdl, n_docs,
                      min_score=0.0, after=None, term_boosts=None,
                      min_match=1):
    """Shared body for the batch group/cogroup forms: one bucket's blocks
    (+ optional sorted allowed-doc array) → per-query local top-k."""
    import pandas as pd

    qids: list[int] = []
    pids: list[int] = []
    docs: list[int] = []
    scores: list[float] = []
    if len(pdf):
        pdf = pdf.sort_values(["term", "partition_id", "block_id"],
                              kind="mergesort")
        by_term = group_blocks_by_term(pdf)
        # global df rides every block row; idf in Python for bit-identity
        # with the single-node oracle (JVM log can differ by 1 ulp).
        # One log per UNIQUE term, not per block row
        uniq = pdf[["term", "df"]].drop_duplicates("term")
        idf = {t: bm25_idf(n_docs, int(d))
               for t, d in zip(uniq["term"], uniq["df"])}
        pid = int(pdf["partition_id"].iloc[0])
        for qid, terms in query_terms.items():
            # per-term boost multipliers (PRF expansion down-weighting,
            # user `term^boost` weighting): weight = boost * idf, the
            # float-op order the oracle replays. Boosts only scale each
            # cursor's upper bounds, so WAND pruning stays exact.
            if term_boosts:
                weights = {t: term_boosts.get(t, 1.0) * idf[t]
                           for t in terms if t in idf}
            else:
                weights = {t: idf[t] for t in terms if t in idf}
            sub = {t: by_term[t] for t in weights}
            if not sub:
                continue
            hits, _ = wand_top_k(sub, weights, k, k1, b, avgdl,
                                 allowed=allowed, min_score=min_score,
                                 after=after, min_match=min_match)
            for d, s in hits:
                qids.append(qid)
                pids.append(pid)
                docs.append(d)
                scores.append(s)
    return pd.DataFrame({
        "query_id": pd.Series(qids, dtype="int32"),
        "partition_id": pd.Series(pids, dtype="int32"),
        "doc_id": pd.Series(docs, dtype="int64"),
        "score": pd.Series(scores, dtype="float64"),
    })


def make_wand_batch_cogroup_fn(query_terms: dict[int, list[str]],
                               k: int, k1: float, b: float, avgdl: float,
                               n_docs: int, min_score: float = 0.0,
                               after: "tuple[float, int] | None" = None,
                               term_boosts: "dict[str, float] | None" = None,
                               min_match: int = 1):
    """Cogrouped batch form: left = one bucket's blocks, right = the same
    bucket's structured-filter survivor doc ids (one filter, shared by the
    whole batch — the offline-retrieval shape: same corpus slice, many
    queries)."""

    def run_bucket(blocks_pdf, allowed_pdf):
        if len(allowed_pdf) == 0:
            return _run_bucket_batch(blocks_pdf.iloc[:0], None,
                                     query_terms, k, k1, b, avgdl, n_docs,
                                     min_score, after, term_boosts,
                                     min_match)
        allowed = np.sort(allowed_pdf["doc_id"].to_numpy(dtype=np.int64))
        return _run_bucket_batch(blocks_pdf, allowed, query_terms,
                                 k, k1, b, avgdl, n_docs, min_score, after,
                                 term_boosts, min_match)

    return run_bucket


WEIGHTED_OUT_SCHEMA = "partition_id int, doc_id long, score double"


def make_weighted_field_fn(field_weights: dict[str, float],
                           field_avgdl: dict[str, float],
                           field_n_docs: dict[str, int],
                           k: int, k1: float, b: float):
    """``applyInPandas`` body for WEIGHTED MULTI-FIELD ranking (BM25F
    shape — the Postgres ``setweight(title,'A') || setweight(body,'D')``
    composition): one doc bucket's block rows drawn from EVERY field's
    postings table, each row's ``term`` pre-qualified as
    ``field\\x00term`` and carrying that field's global ``df``.

    score(d) = Σ_{(field, term)} w_field · idf_field(term) ·
    tf_norm_field(tf, dl) — a sum of per-cursor contributions, so the
    standard block-max WAND argument holds unchanged: each cursor's
    upper bound is its own field's block_max_tf_norm (computed under
    that field's avgdl at build time) times its weight. Cursors
    normalize against their field's avgdl via ``avgdl_by_term``.

    Contributions fold in qualified-key sorted order (field first, then
    term — ``at_pivot`` enumerates cursors by term_rank), matching
    ``oracle.bm25f_top_k`` bit-for-bit.
    """

    def run_bucket(pdf):
        import pandas as pd

        pids: list[int] = []
        docs: list[int] = []
        scores: list[float] = []
        if len(pdf):
            pdf = pdf.sort_values(["term", "partition_id", "block_id"],
                                  kind="mergesort")
            by_term = group_blocks_by_term(pdf)
            uniq = pdf[["term", "df"]].drop_duplicates("term")
            weights: dict[str, float] = {}
            avgdls: dict[str, float] = {}
            for qt, df in zip(uniq["term"], uniq["df"]):
                fld = qt.split("\x00", 1)[0]
                # same float op order as the oracle: w * idf, then * norm
                weights[qt] = field_weights[fld] * bm25_idf(
                    field_n_docs[fld], int(df))
                avgdls[qt] = field_avgdl[fld]
            pid = int(pdf["partition_id"].iloc[0])
            hits, _ = wand_top_k(by_term, weights, k, k1, b, avgdl=1.0,
                                 avgdl_by_term=avgdls)
            for d, s in hits:
                pids.append(pid)
                docs.append(d)
                scores.append(s)
        return pd.DataFrame({
            "partition_id": pd.Series(pids, dtype="int32"),
            "doc_id": pd.Series(docs, dtype="int64"),
            "score": pd.Series(scores, dtype="float64"),
        })

    return run_bucket


COLLAPSE_OUT_SCHEMA = ("partition_id int, doc_id long, score double, "
                       "ckey string")


def wand_collapse_top_k(
    term_blocks: dict[str, list[dict]],
    weights: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    meta_doc_ids: "np.ndarray",
    meta_keys: list,
) -> tuple[list[tuple[object, int, float]], dict]:
    """Exact block-max WAND *collapsed* top-k over one doc bucket: the
    best-scoring doc per collapse key, top ``k`` KEYS (Elasticsearch
    field collapsing — one result per host/site/author).

    ``meta_doc_ids``/``meta_keys``: the bucket's doc_id-sorted metadata
    slice (key may be None — NULL keys form one group, SQL window
    semantics). Docs missing from the slice fall into the None group.

    Exactness of pruning: theta is the k-th best KEY score. Candidates
    arrive in increasing doc_id order, so every current per-key best has
    a smaller doc_id than any future candidate; a future doc bounded at
    or below theta either loses outright or ties and loses the
    (score DESC, doc_id ASC) tie-break — the strict ``>`` pivot test and
    ``<=`` block-skip stay lossless, exactly the single-doc argument.
    Per-key bests only ever improve (monotone), so the key heap uses
    lazy invalidation: an entry is live iff it equals the key's latest
    pushed best.

    Cross-bucket merge exactness (the superset lemma): if a key's global
    winner ranks outside its bucket's collapsed top-k, the k keys above
    it in that bucket each have a global best at least their bucket
    score, so all k outrank it globally — it wasn't a global winner.
    Hence the union of per-bucket collapsed top-k contains the global
    collapsed top-k, and a per-key window + global top-k merge is exact.
    """
    cursors = []
    if k > 0:
        for rank, term in enumerate(sorted(term_blocks)):
            blocks = term_blocks[term]
            if blocks and term in weights and avgdl > 0:
                c = BlockCursor(blocks, weights[term], k1, b, avgdl,
                                term_rank=rank)
                if c.cur_doc != EXHAUSTED:
                    cursors.append(c)
    all_cursors = list(cursors)

    cur: dict = {}       # key -> (score, -doc): best seen
    intop: set = set()   # keys currently in the top-k heap
    latest: dict = {}    # key -> entry last pushed (liveness check)
    heap: list = []      # (score, -doc, key); stale entries allowed
    nvalid = 0
    evaluated = 0
    skipped_evals = 0

    def _clean():
        while heap and ((heap[0][2] not in intop)
                        or (heap[0][0], heap[0][1]) != latest[heap[0][2]]):
            heapq.heappop(heap)

    while cursors:
        cursors.sort(key=lambda c: (c.cur_doc, c.term_rank))
        if nvalid >= k:
            _clean()
            theta = heap[0][0]
        else:
            theta = float("-inf")
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(cursors):
            acc += c.max_block_ub
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break
        pivot_doc = cursors[pivot_idx].cur_doc

        if cursors[0].cur_doc == pivot_doc:
            at_pivot = [c for c in cursors if c.cur_doc == pivot_doc]
            block_ub = sum(c.block_ub() for c in at_pivot)
            if block_ub <= theta:
                skipped_evals += 1
            else:
                score = 0.0
                for c in at_pivot:
                    score += c.contrib()
                evaluated += 1
                i = int(np.searchsorted(meta_doc_ids, pivot_doc))
                key = (meta_keys[i]
                       if i < len(meta_doc_ids)
                       and int(meta_doc_ids[i]) == pivot_doc else None)
                entry = (score, -pivot_doc)
                old = cur.get(key)
                if old is None or entry > old:
                    cur[key] = entry
                    if key in intop:          # improvement: lazy re-push
                        latest[key] = entry
                        heapq.heappush(heap, (score, -pivot_doc, key))
                    elif nvalid < k:          # heap not full: admit key
                        intop.add(key)
                        latest[key] = entry
                        heapq.heappush(heap, (score, -pivot_doc, key))
                        nvalid += 1
                    else:                     # full: evict the k-th key?
                        _clean()
                        if entry > (heap[0][0], heap[0][1]):
                            _es, _ed, ek = heapq.heappop(heap)
                            intop.discard(ek)
                            del latest[ek]
                            intop.add(key)
                            latest[key] = entry
                            heapq.heappush(heap, (score, -pivot_doc, key))
            for c in at_pivot:
                c.next_doc()
        else:
            for c in cursors:
                if c.cur_doc >= pivot_doc:
                    break
                c.seek(pivot_doc)
        cursors = [c for c in cursors if c.cur_doc != EXHAUSTED]

    hits = sorted(((key, -nd, s) for key, (s, nd) in latest.items()),
                  key=lambda x: (-x[2], x[1]))
    stats = {
        "evaluated_docs": evaluated,
        "skipped_evals": skipped_evals,
        "decoded_blocks": sum(c.decoded_blocks for c in all_cursors),
        "total_blocks": sum(len(v) for v in term_blocks.values()),
    }
    return hits, stats


def make_wand_collapse_cogroup_fn(qterms: list[str], k: int, k1: float,
                                  b: float, avgdl: float, n_docs: int):
    """Cogrouped ``applyInPandas`` body for field collapsing: left = one
    bucket's posting blocks (with ``df`` riding each row), right = the
    bucket's (doc_id, ckey) metadata slice. Emits the bucket's collapsed
    top-k (one row per key)."""

    def run_bucket(blocks_pdf, meta_pdf):
        import pandas as pd

        pids: list[int] = []
        docs: list[int] = []
        scores: list[float] = []
        keys: list = []
        if len(blocks_pdf) and len(meta_pdf):
            blocks_pdf = blocks_pdf.sort_values(
                ["term", "partition_id", "block_id"], kind="mergesort")
            by_term = group_blocks_by_term(blocks_pdf)
            uniq = blocks_pdf[["term", "df"]].drop_duplicates("term")
            idf = {t: bm25_idf(n_docs, int(d))
                   for t, d in zip(uniq["term"], uniq["df"])}
            weights = {t: idf[t] for t in qterms if t in idf}
            sub = {t: by_term[t] for t in weights if t in by_term}
            if sub:
                pid = int(blocks_pdf["partition_id"].iloc[0])
                meta_pdf = meta_pdf.sort_values("doc_id", kind="mergesort")
                mids = meta_pdf["doc_id"].to_numpy(dtype=np.int64)
                mkeys = [None if pd.isna(v) else str(v)
                         for v in meta_pdf["ckey"]]
                hits, _ = wand_collapse_top_k(sub, weights, k, k1, b,
                                              avgdl, mids, mkeys)
                for key, d, s in hits:
                    pids.append(pid)
                    docs.append(d)
                    scores.append(s)
                    keys.append(key)
        return pd.DataFrame({
            "partition_id": pd.Series(pids, dtype="int32"),
            "doc_id": pd.Series(docs, dtype="int64"),
            "score": pd.Series(scores, dtype="float64"),
            "ckey": pd.Series(keys, dtype="object"),
        })

    return run_bucket


# --------------------------------------------------------------------------
# static-rank blended retrieval (web-search document priors)

BOOST_OUT_SCHEMA = "partition_id int, doc_id long, score double"


def wand_boosted_top_k(
    term_blocks: dict[str, list[dict]],
    weights: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    meta_doc_ids: "np.ndarray",
    meta_static: "np.ndarray",
    w_static: float,
) -> tuple[list[tuple[int, float]], dict]:
    """Exact block-max WAND top-k under the blended score
    ``bm25(d, q) + w_static · static(d)`` over one doc bucket — the
    web-search serve shape (query relevance + query-independent document
    prior: URL/link authority, freshness, spam score).

    ``meta_doc_ids``/``meta_static``: the bucket's doc_id-sorted static
    priors; docs missing from the slice take prior 0. ``w_static`` and
    every prior must be ≥ 0 (checked by the caller) so the bounds below
    stay upper bounds.

    Exactness: the pivot test adds ``w_static · max_static`` (the
    bucket-local maximum) to the summed term UBs — an upper bound on any
    remaining candidate's blend, so the strict ``>`` test prunes
    losslessly with the usual (score DESC, doc_id ASC) tie-break
    argument. At the pivot the bound tightens to the CANDIDATE's own
    prior (one searchsorted lookup, done before any contrib decode):
    ``block_ub + w_static · static(d) <= theta`` skips the evaluation.
    Semantics follow every disjunctive engine: only docs matching ≥ 1
    query term are candidates — the prior reorders matches, it does not
    surface no-match docs.
    """
    max_static = float(meta_static.max()) if len(meta_static) else 0.0
    boost_cap = w_static * max_static
    cursors = []
    if k > 0:
        for rank, term in enumerate(sorted(term_blocks)):
            blocks = term_blocks[term]
            if blocks and term in weights and avgdl > 0:
                c = BlockCursor(blocks, weights[term], k1, b, avgdl,
                                term_rank=rank)
                if c.cur_doc != EXHAUSTED:
                    cursors.append(c)
    all_cursors = list(cursors)

    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    evaluated = 0
    skipped_evals = 0

    def _static(doc: int) -> float:
        i = int(np.searchsorted(meta_doc_ids, doc))
        if i < len(meta_doc_ids) and int(meta_doc_ids[i]) == doc:
            return float(meta_static[i])
        return 0.0

    while cursors:
        cursors.sort(key=lambda c: (c.cur_doc, c.term_rank))
        theta = heap[0][0] if len(heap) >= k else float("-inf")
        acc = boost_cap
        pivot_idx = -1
        for i, c in enumerate(cursors):
            acc += c.max_block_ub
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break
        pivot_doc = cursors[pivot_idx].cur_doc

        if cursors[0].cur_doc == pivot_doc:
            at_pivot = [c for c in cursors if c.cur_doc == pivot_doc]
            prior = w_static * _static(pivot_doc)
            block_ub = sum(c.block_ub() for c in at_pivot) + prior
            if block_ub <= theta:
                skipped_evals += 1
            else:
                score = prior
                for c in at_pivot:   # sorted-term order: oracle float order
                    score += c.contrib()
                evaluated += 1
                entry = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry > heap[0]:
                    heapq.heapreplace(heap, entry)
            for c in at_pivot:
                c.next_doc()
        else:
            for c in cursors:
                if c.cur_doc >= pivot_doc:
                    break
                c.seek(pivot_doc)
        cursors = [c for c in cursors if c.cur_doc != EXHAUSTED]

    hits = sorted(((-d, s) for s, d in heap), key=lambda x: (-x[1], x[0]))
    stats = {
        "evaluated_docs": evaluated,
        "skipped_evals": skipped_evals,
        "decoded_blocks": sum(c.decoded_blocks for c in all_cursors),
        "total_blocks": sum(len(v) for v in term_blocks.values()),
    }
    return hits, stats


def make_wand_boosted_cogroup_fn(qterms: list[str], k: int, k1: float,
                                 b: float, avgdl: float, n_docs: int,
                                 w_static: float):
    """Cogrouped ``applyInPandas`` body for blended retrieval: left = one
    bucket's posting blocks (``df`` riding each row), right = the
    bucket's (doc_id, static) prior slice. Emits the bucket's blended
    top-k; the cross-bucket merge (global top-k over ≤ P·k rows) is
    exact by the usual per-bucket superset lemma."""

    def run_bucket(blocks_pdf, meta_pdf):
        import pandas as pd

        pids: list[int] = []
        docs: list[int] = []
        scores: list[float] = []
        if len(blocks_pdf):
            blocks_pdf = blocks_pdf.sort_values(
                ["term", "partition_id", "block_id"], kind="mergesort")
            by_term = group_blocks_by_term(blocks_pdf)
            uniq = blocks_pdf[["term", "df"]].drop_duplicates("term")
            idf = {t: bm25_idf(n_docs, int(d))
                   for t, d in zip(uniq["term"], uniq["df"])}
            weights = {t: idf[t] for t in qterms if t in idf}
            sub = {t: by_term[t] for t in weights if t in by_term}
            if sub:
                pid = int(blocks_pdf["partition_id"].iloc[0])
                meta_pdf = meta_pdf.sort_values("doc_id", kind="mergesort")
                mids = meta_pdf["doc_id"].to_numpy(dtype=np.int64)
                mstat = (meta_pdf["static"]
                         .fillna(0.0).to_numpy(dtype=np.float64))
                hits, _ = wand_boosted_top_k(sub, weights, k, k1, b,
                                             avgdl, mids, mstat,
                                             w_static)
                for d, s in hits:
                    pids.append(pid)
                    docs.append(d)
                    scores.append(s)
        return pd.DataFrame({
            "partition_id": pd.Series(pids, dtype="int32"),
            "doc_id": pd.Series(docs, dtype="int64"),
            "score": pd.Series(scores, dtype="float64"),
        })

    return run_bucket
