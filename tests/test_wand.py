"""Block-max WAND (E10) correctness + pruning evidence (FIXTURES.md §4.5).

Property layer: WAND over compressed blocks must equal exhaustive scoring
on randomized corpora (the reference has no property tests — SURVEY.md §5.1
"Not present"; we add them). Spark layer: `QueryEngine.top_k(mode="wand")`
must be rank-identical to the oracle and to the exhaustive Spark path.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pytest

from semantic_search_engine_spark.functions.varbyte import encode_blocks
from semantic_search_engine_spark.plans.wand import wand_top_k

K1, B = 1.2, 0.75


def _random_index(rng, n_docs, n_terms, density, block_size):
    """Random corpus → (term_blocks, weights, exhaustive scorer inputs)."""
    avgdl = 0.0
    doc_len = rng.integers(5, 200, size=n_docs)
    avgdl = float(doc_len.mean())
    term_postings = {}
    for t in range(n_terms):
        mask = rng.random(n_docs) < density * (1.0 if t else 3.0)
        ids = np.flatnonzero(mask).astype(np.uint64)
        if ids.size == 0:
            continue
        tfs = rng.integers(1, 8, size=ids.size).astype(np.uint64)
        term_postings[f"t{t:02d}"] = (ids, tfs)
    term_blocks = {}
    for term, (ids, tfs) in term_postings.items():
        dls = doc_len[ids.astype(np.int64)].astype(np.uint64)
        term_blocks[term] = encode_blocks(ids, tfs, dls, avgdl, K1, B,
                                          block_size)
    weights = {t: float(rng.uniform(0.1, 3.0))
               for t in term_postings}
    return term_blocks, weights, term_postings, doc_len, avgdl


def _exhaustive_top_k(term_postings, weights, doc_len, avgdl, k):
    scores: dict[int, float] = {}
    for term in sorted(term_postings):  # same summation order as WAND/oracle
        if term not in weights:
            continue
        w = weights[term]
        ids, tfs = term_postings[term]
        for d, tf in zip(ids.astype(int), tfs.astype(int)):
            dl = float(doc_len[d])
            # w * (tf/(tf+K)) — the oracle's parenthesization (bit-exact)
            contrib = w * (tf / (tf + K1 * (1 - B + B * dl / avgdl)))
            scores[d] = scores.get(d, 0.0) + contrib
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("block_size", [4, 32])
def test_wand_equals_exhaustive_random(seed, block_size):
    rng = np.random.Generator(np.random.PCG64(seed))
    n_docs = int(rng.integers(50, 800))
    term_blocks, weights, postings, doc_len, avgdl = _random_index(
        rng, n_docs, n_terms=int(rng.integers(2, 6)), density=0.2,
        block_size=block_size)
    k = int(rng.integers(1, 25))
    got, stats = wand_top_k(term_blocks, weights, k, K1, B, avgdl)
    expected = _exhaustive_top_k(postings, weights, doc_len, avgdl, k)
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (gd, gs), (ed, es) in zip(got, expected):
        assert math.isclose(gs, es, rel_tol=0, abs_tol=1e-12), (gd, ed)


def test_wand_exact_float_identity_with_sorted_term_sum():
    """Scores must be bit-identical to sorted-term-order accumulation."""
    rng = np.random.Generator(np.random.PCG64(7))
    term_blocks, weights, postings, doc_len, avgdl = _random_index(
        rng, 300, n_terms=4, density=0.5, block_size=8)
    got, _ = wand_top_k(term_blocks, weights, 10, K1, B, avgdl)
    expected = _exhaustive_top_k(postings, weights, doc_len, avgdl, 10)
    assert [s for _, s in got] == [s for _, s in expected]  # == on floats


def test_wand_ties_break_by_doc_id():
    """Identical docs → identical scores; top-k must pick the smallest ids."""
    n, bs = 64, 4
    ids = np.arange(n, dtype=np.uint64)
    tfs = np.full(n, 3, dtype=np.uint64)
    dls = np.full(n, 50, dtype=np.uint64)
    blocks = {"t": encode_blocks(ids, tfs, dls, 50.0, K1, B, bs)}
    got, _ = wand_top_k(blocks, {"t": 1.5}, 10, K1, B, 50.0)
    assert [d for d, _ in got] == list(range(10))
    assert len({s for _, s in got}) == 1


def test_wand_prunes_blocks_on_selective_query():
    """A rare term AND a stopword: WAND must not decode most stopword
    blocks — the lagging cursor fence-hops to the rare term's candidates."""
    rng = np.random.Generator(np.random.PCG64(3))
    n_docs = 100_000
    doc_len = rng.integers(20, 200, size=n_docs)
    avgdl = float(doc_len.mean())
    stop_ids = np.arange(0, n_docs, 2, dtype=np.uint64)       # df = 50k
    rare_ids = np.array([10, 40_000, 99_990], dtype=np.uint64)
    mk = lambda ids: encode_blocks(
        ids, rng.integers(1, 5, size=ids.size).astype(np.uint64),
        doc_len[ids.astype(np.int64)].astype(np.uint64),
        avgdl, K1, B, 128)
    term_blocks = {"stop": mk(stop_ids), "rare": mk(rare_ids)}
    # idf-like weights: rare term dominates
    weights = {"stop": 0.05, "rare": 8.0}
    got, stats = wand_top_k(term_blocks, weights, 3, K1, B, avgdl)
    assert {d for d, _ in got} <= {10, 40_000, 99_990, 11, 41, 9}  # rare docs win
    assert stats["total_blocks"] > 350
    # decisive: vast majority of the stopword's blocks were never decoded
    assert stats["decoded_blocks"] < stats["total_blocks"] * 0.15, stats


@pytest.mark.parametrize("seed", range(6))
def test_wand_min_score_seeded_theta_exact(seed):
    """A min_score threshold must give exactly the exhaustive
    filter-then-top-k result (inclusive >=), across thresholds placed
    below, inside, and above the score distribution."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n_docs = int(rng.integers(100, 600))
    term_blocks, weights, postings, doc_len, avgdl = _random_index(
        rng, n_docs, n_terms=4, density=0.3, block_size=8)
    full = _exhaustive_top_k(postings, weights, doc_len, avgdl, n_docs)
    if not full:
        return
    scores = [s for _, s in full]
    mid = scores[len(scores) // 2]
    for thr in [scores[-1] / 2, mid, scores[0], scores[0] * 1.5]:
        got, _ = wand_top_k(term_blocks, weights, 10, K1, B, avgdl,
                            min_score=thr)
        expected = [(d, s) for d, s in full if s >= thr][:10]
        assert got == expected, thr
    # threshold == an exact achieved score must be INCLUSIVE: the doc
    # scoring exactly `mid` is in the exhaustive >= mid list, and the
    # thr=mid loop above already asserted WAND returns that exact list


def test_wand_min_score_strengthens_pruning():
    """Seeding theta with the threshold must PRUNE MORE, not fall back to
    exhaustive: fewer evaluations, more block-max skips, same results."""
    rng = np.random.Generator(np.random.PCG64(11))
    term_blocks, weights, postings, doc_len, avgdl = _random_index(
        rng, 5000, n_terms=3, density=0.4, block_size=16)
    full = _exhaustive_top_k(postings, weights, doc_len, avgdl, 5000)
    # threshold passes only 5 docs but k=10: the heap NEVER fills, so an
    # unseeded run keeps theta at -inf and evaluates every candidate,
    # while the seeded theta prunes from the first block
    thr = full[4][1]
    k = 10
    base_hits, base_stats = wand_top_k(term_blocks, weights, k, K1, B,
                                       avgdl)
    thr_hits, thr_stats = wand_top_k(term_blocks, weights, k, K1, B,
                                     avgdl, min_score=thr)
    assert thr_hits == [(d, s) for d, s in full if s >= thr][:k]
    assert thr_stats["skipped_evals"] > 0
    assert thr_stats["evaluated_docs"] < base_stats["evaluated_docs"]


def test_wand_empty_and_missing_terms():
    got, stats = wand_top_k({}, {}, 10, K1, B, 100.0)
    assert got == []
    rng = np.random.Generator(np.random.PCG64(1))
    tb, w, *_ = _random_index(rng, 100, 2, 0.3, 8)
    got, _ = wand_top_k(tb, {}, 10, K1, B, 100.0)  # no weighted terms
    assert got == []


# ---------------------------------------------------------------------------
# Spark layer
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wand_built(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wand_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, cfg).build(docs)
    return store, cfg


def test_spark_wand_rank_identical_to_oracle(spark, wand_built, tiny_rows):
    from semantic_search_engine_spark.corpus import QUERY_CORPUS
    from semantic_search_engine_spark.oracle import OracleIndex
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    oracle = OracleIndex.build(tiny_rows, cfg)
    qe = QueryEngine(spark, store, cfg)
    for pq in QUERY_CORPUS:
        expected = oracle.top_k(pq.query, k=10)
        got = qe.top_k(pq.query, k=10, mode="wand")
        assert [d for d, _ in got] == [d for d, _ in expected], pq.query
        for (gd, gs), (ed, es) in zip(got, expected):
            assert math.isclose(gs, es, abs_tol=1e-6), (pq.query, gd)


def test_spark_wand_equals_exhaustive_path(spark, wand_built):
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    qe = QueryEngine(spark, store, cfg)
    for q in ["zipfhead0 zipfhead1", "wireless bluetooth headphones",
              "raretermxq zipfhead0"]:
        wand = qe.top_k(q, k=25, mode="wand")
        exh = qe.top_k(q, k=25, mode="exhaustive")
        assert [d for d, _ in wand] == [d for d, _ in exh], q
        for (wd, ws), (ed, es) in zip(wand, exh):
            assert math.isclose(ws, es, abs_tol=1e-9), (q, wd)


def test_spark_filtered_wand_matches_oracle(spark, wand_built, tiny_rows):
    """E10+E11: structured filters pushed into the WAND cogroup path must
    reproduce the oracle's filtered ranking exactly."""
    import datetime as dt
    from semantic_search_engine_spark.oracle import OracleIndex
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    oracle = OracleIndex.build(tiny_rows, cfg)
    qe = QueryEngine(spark, store, cfg)

    for q, kwargs in [
        ("wireless bluetooth headphones", dict(lang="en")),
        ("zipfhead0 zipfhead1", dict(lang="de")),
        ("zipfhead0 zipfhead1",
         dict(warc_ts_min=dt.datetime(2025, 1, 1, 1, 0))),
        ("zipfhead0", dict(lang="en",
                           warc_ts_max=dt.datetime(2025, 1, 1, 2, 0))),
    ]:
        got = qe.wand_filtered_top_k_df(q, k=10, **kwargs).collect()
        exp = oracle.search(q, k=10, **kwargs)["results"]
        assert [r["doc_id"] for r in got] == [h["doc_id"] for h in exp], \
            (q, kwargs)
        for g, e in zip(got, exp):
            assert math.isclose(g["score"], e["score"], abs_tol=1e-6)


def test_search_fast_path_filtered_pagination(spark, wand_built, tiny_rows):
    """search() count_mode='none' routes through filtered WAND; pagination
    and result envelope must match the oracle page-for-page."""
    from semantic_search_engine_spark.oracle import OracleIndex
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    oracle = OracleIndex.build(tiny_rows, cfg)
    qe = QueryEngine(spark, store, cfg)
    for offset in (0, 5):
        s = qe.search("zipfhead0 zipfhead1", k=10, offset=offset,
                      lang="en", count_mode="none")
        o = oracle.search("zipfhead0 zipfhead1", k=10, offset=offset,
                          lang="en")
        assert [h["doc_id"] for h in s["results"]] == \
            [h["doc_id"] for h in o["results"]], offset
        assert {"url", "warc_ts", "lang", "doc_len"} <= \
            set(s["results"][0].keys())


def test_k_zero_and_bare_fast_path(spark, wand_built):
    """Regression (code review): k=0 must return an empty envelope, not an
    IndexError inside the WAND heap; bare fast-path queries must not touch
    doc_meta (no cogroup when no filters)."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    qe = QueryEngine(spark, store, cfg)
    got, stats = __import__(
        "semantic_search_engine_spark.plans.wand", fromlist=["wand_top_k"]
    ).wand_top_k({}, {}, 0, 1.2, 0.75, 100.0)
    assert got == []
    r = qe.search("zipfhead0", k=0, count_mode="none")
    assert r["results"] == [] and r["total_count"] == 0
    # bare query plan must not reference doc_meta (no full-table cogroup)
    plan = qe.wand_top_k_df("zipfhead0", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "doc_meta" not in plan
    assert "FlatMapCoGroupsInPandas" not in plan
    # filtered query does cogroup
    plan_f = qe.wand_top_k_df("zipfhead0", k=5, lang="en") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan_f


def test_batch_top_k_rank_identical_to_per_query(spark, wand_built):
    """Multi-query batch WAND (one job for N queries) must be bit-identical
    per query to the single-query path, including absent-term and
    empty-string queries (which map to [])."""
    from semantic_search_engine_spark.corpus import QUERY_CORPUS
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    qe = QueryEngine(spark, store, cfg)
    queries = [pq.query for pq in QUERY_CORPUS] + ["absentterm9z", ""]
    batch = qe.batch_top_k(queries, k=10)
    assert set(batch) == set(queries)
    assert batch["absentterm9z"] == []
    assert batch[""] == []
    for q in queries:
        single = qe.top_k(q, k=10, mode="wand")
        assert batch[q] == single, q  # exact float identity, not approx


def test_batch_filtered_matches_single_filtered(spark, wand_built):
    """Batch WAND with a shared structured filter must equal the
    single-query filtered fast path per query."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    qe = QueryEngine(spark, store, cfg)
    queries = ["wireless bluetooth headphones", "zipfhead0 zipfhead1",
               "absentterm9z"]
    batch = qe.batch_wand_top_k_df(queries, k=10, lang="en").collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["score"])))
    for qi, q in enumerate(queries):
        got = sorted(by_q.get(qi, []), key=lambda h: (-h[1], h[0]))
        want = [(int(r["doc_id"]), float(r["score"]))
                for r in qe.wand_filtered_top_k_df(q, k=10, lang="en")
                .collect()]
        assert got == want, q


def test_query_scan_pruning_reaches_physical_plan(spark, wand_built):
    """The pruning the scale design depends on must be visible in the
    physical plan: the postings scan carries (a) a PartitionFilters entry
    on term_bucket (partition pruning from constant-folded bucket
    literals) and (b) a PushedFilters term IN (...) (parquet row-group
    skipping). Regression guard for SCALE.md §4."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    qe = QueryEngine(spark, store, cfg)
    df = qe.batch_wand_top_k_df(["wireless bluetooth"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition pruning on the postings layout column
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters"):]
    assert "term_bucket" in seg[:400], seg[:400]
    # term pushdown reaching the parquet scan
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters"):]
    assert "term" in pushed[:300], pushed[:300]


def test_single_query_plan_has_no_window_exchange(spark, wand_built):
    """The N=1 serve path must NOT pay the batch engine's per-query
    row_number window (VERDICT r2: the batch-of-1 scaffold added an
    exchange + stage single queries never needed) — the merge of local
    hits is a TakeOrderedAndProject."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    qe = QueryEngine(spark, store, cfg)
    plan = (qe._batch_wand_ranked(["wireless bluetooth"], k=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan
    # N>1 distinct term sets still use the per-query window
    plan2 = (qe._batch_wand_ranked(["wireless bluetooth", "gaming"], k=10)
             ._jdf.queryExecution().executedPlan().toString())
    assert "Window" in plan2


def test_hydration_scan_is_partition_pruned(spark, wand_built):
    """Result hydration must not scan the whole doc_meta table: the
    broadcast of the ≤ k hits drives dynamic partition pruning on the
    partitioned (partition_id) metadata layout — the physical plan's
    doc_meta scan carries a dynamicpruning PartitionFilter (VERDICT r2
    #4 done-criterion)."""
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    qe = QueryEngine(spark, store, cfg)
    top = (qe._batch_wand_ranked(["wireless bluetooth"], k=10)
           .select("partition_id", "doc_id", "score"))
    hyd = qe._hydrate_hits(top)
    rows = hyd.collect()
    assert rows  # hydration produced decorated hits
    assert rows[0]["url"]
    plan = hyd._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # the dynamic filter sits on the metadata scan's partition column
    i = plan.lower().index("dynamicpruningexpression")
    assert "partition_id" in plan[i:i + 200]


def test_batch_top_k_scales_to_hundred_queries(spark, wand_built):
    """A 100-query batch (the offline-retrieval shape) completes in one
    job with every sampled query rank-identical to its single-query run
    and the closure still broadcast-sized."""
    from semantic_search_engine_spark.corpus import QUERY_CORPUS
    from semantic_search_engine_spark.plans.query import QueryEngine

    store, cfg = wand_built
    qe = QueryEngine(spark, store, cfg)
    seed_qs = [pq.query for pq in QUERY_CORPUS]
    queries = [f"{seed_qs[i % len(seed_qs)]} zipfhead{i % 7}"
               for i in range(100)]
    batch = qe.batch_top_k(queries, k=5)
    assert len(batch) == len(set(queries))
    for q in [queries[0], queries[13], queries[57], queries[99]]:
        assert batch[q] == qe.top_k(q, k=5, mode="wand"), q
    assert any(batch[q] for q in queries)  # non-degenerate
