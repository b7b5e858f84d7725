"""Hard-negative mining (operators/mining.py, X117).

Planted-scenario pins for the DataFrame algebra, a brute-force mirror
property over randomized inputs, and an end-to-end drive from the
engine's own batch ranking (the mining must compose with
``batch_wand_top_k_df`` exactly like rank_eval does).
"""

from __future__ import annotations

import random

import pytest

from semantic_search_engine_spark.operators.mining import (
    hard_negatives,
    training_triples,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


RES_SCHEMA = "query_id int, doc_id long, score double"
JUD_SCHEMA = "query_id int, doc_id long, grade int"


def test_hard_negatives_planted(spark):
    # q1: docs ranked 10,20,30,40 by score; 20 judged relevant,
    # 40 judged non-relevant (grade 0), 10/30 unjudged
    res = _df(spark, [(1, 10, 4.0), (1, 20, 3.0), (1, 30, 2.0),
                      (1, 40, 1.0)], RES_SCHEMA)
    jud = _df(spark, [(1, 20, 2), (1, 40, 0)], JUD_SCHEMA)
    got = {(r["neg_doc_id"], r["neg_rank"])
           for r in hard_negatives(res, jud, n_neg=2).collect()}
    # negatives in rank order: 10 (rank 1, unjudged), 30 (rank 3);
    # 20 excluded as relevant, 40 beyond the n_neg=2 cap
    assert got == {(10, 1), (30, 3)}


def test_skip_unjudged_top_spares_judged_nonrelevant(spark):
    res = _df(spark, [(1, 10, 4.0), (1, 40, 3.0), (1, 30, 2.0)],
              RES_SCHEMA)
    jud = _df(spark, [(1, 40, 0)], JUD_SCHEMA)
    got = {r["neg_doc_id"]
           for r in hard_negatives(res, jud, n_neg=5,
                                   skip_unjudged_top=2).collect()}
    # rank-1 doc 10 is unjudged -> held out; rank-2 doc 40 is JUDGED
    # non-relevant -> kept despite being inside the top-2 window;
    # rank-3 doc 30 unjudged but past the window -> kept
    assert got == {40, 30}


def test_triples_layout_and_fanout(spark):
    res = _df(spark, [(1, 10, 4.0), (1, 30, 2.0),
                      (2, 50, 9.0), (2, 60, 8.0)], RES_SCHEMA)
    jud = _df(spark, [(1, 20, 2), (1, 21, 1),   # q1: 2 positives (unretrieved is fine)
                      (2, 50, 1)], JUD_SCHEMA)  # q2: 1 positive
    rows = training_triples(res, jud, n_neg=5).collect()
    got = {(r["query_id"], r["pos_doc_id"], r["neg_doc_id"])
           for r in rows}
    # q1: 2 positives x 2 negatives; q2: 1 positive x 1 negative (60)
    assert got == {(1, 20, 10), (1, 20, 30), (1, 21, 10), (1, 21, 30),
                   (2, 50, 60)}
    # neg_rank carries the retrieval rank the negative held
    ranks = {(r["query_id"], r["neg_doc_id"]): r["neg_rank"]
             for r in rows}
    assert ranks[(1, 10)] == 1 and ranks[(1, 30)] == 2
    assert ranks[(2, 60)] == 2


def test_no_positive_or_no_negative_queries_vanish(spark):
    res = _df(spark, [(1, 10, 4.0),    # q1 retrieved only its positive
                      (2, 20, 3.0)],   # q2 has no judged positive
              RES_SCHEMA)
    jud = _df(spark, [(1, 10, 2)], JUD_SCHEMA)
    assert training_triples(res, jud).count() == 0


def test_rank_column_respected_and_score_optional(spark):
    res = _df(spark, [(1, 10, 2), (1, 20, 1)],
              "query_id int, doc_id long, rank int")
    jud = _df(spark, [(1, 99, 1)], JUD_SCHEMA)
    rows = hard_negatives(res, jud, n_neg=1).collect()
    assert [(r["neg_doc_id"], r["neg_rank"], r["neg_score"])
            for r in rows] == [(20, 1, None)]
    with pytest.raises(ValueError, match="rank.*or.*score"):
        hard_negatives(
            _df(spark, [(1, 10)], "query_id int, doc_id long"),
            jud).collect()


def test_mirror_property_randomized(spark):
    """Brute-force Python mirror over a randomized instance: per query,
    sort by (score DESC, doc_id ASC), drop relevant, cap n_neg."""
    rng = random.Random(5)
    res_rows, jud_rows = [], []
    for q in range(12):
        docs = rng.sample(range(1000), rng.randint(0, 8))
        for d in docs:
            res_rows.append((q, d, round(rng.random() * 5, 3)))
        for d in rng.sample(range(1000), rng.randint(0, 6)):
            jud_rows.append((q, d, rng.randint(0, 3)))
    res = _df(spark, res_rows, RES_SCHEMA)
    jud = _df(spark, jud_rows, JUD_SCHEMA)
    n_neg, thr = 3, 2

    rel = {(q, d) for q, d, g in jud_rows if g >= thr}
    want = set()
    byq: dict[int, list] = {}
    for q, d, s in res_rows:
        byq.setdefault(q, []).append((d, s))
    for q, hits in byq.items():
        hits.sort(key=lambda h: (-h[1], h[0]))
        taken = 0
        for rank, (d, _s) in enumerate(hits, start=1):
            if (q, d) in rel or taken >= n_neg:
                continue
            want.add((q, d, rank))
            taken += 1
    got = {(r["query_id"], r["neg_doc_id"], r["neg_rank"])
           for r in hard_negatives(res, jud, n_neg=n_neg,
                                   rel_threshold=thr).collect()}
    assert got == want


def test_end_to_end_from_engine_batch(spark, tiny_corpus_dir,
                                      tmp_path_factory):
    """The mining composes with the engine's one-job batch ranking: mine
    triples from batch_wand_top_k_df output + judgments planted from the
    engine's own top hits, and verify positives/negatives partition the
    retrieved set correctly."""
    from pyspark.sql import functions as F

    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("mining_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, cfg).build(docs)
    qe = QueryEngine(spark, store, cfg)

    queries = ["zipfhead0 zipfhead1", "wireless bluetooth"]
    ranked = qe.batch_wand_top_k_df(queries, k=10).select(
        "query_id", "doc_id", "score")
    # judge each query's engine top-1 as its positive
    per_q = qe.batch_top_k(queries, k=10)
    jud_rows = [(qi, per_q[q][0][0], 2)
                for qi, q in enumerate(queries) if per_q[q]]
    jud = spark.createDataFrame(jud_rows, JUD_SCHEMA)

    triples = training_triples(ranked, jud, n_neg=3).collect()
    assert triples  # both queries have hits
    by_q: dict[int, set] = {}
    for r in triples:
        assert r["neg_doc_id"] != r["pos_doc_id"]
        by_q.setdefault(r["query_id"], set()).add(r["neg_doc_id"])
    for qi, q in enumerate(queries):
        hits = per_q[q]
        pos = hits[0][0]
        negs = by_q.get(qi, set())
        assert pos not in negs
        assert len(negs) == min(3, len(hits) - 1)
        # mined negatives are the TOP-ranked non-positives, in order
        assert negs == {d for d, _ in hits[1:1 + len(negs)]}


def test_mine_training_triples_engine_convenience(spark, tiny_corpus_dir,
                                                  tmp_path_factory):
    """QueryEngine.mine_training_triples == batch rank + training_triples
    + text hydration, in one call; judged-but-unretrieved positives keep
    their triples with hydrated text, and an out-of-corpus positive
    survives with NULL pos_text."""
    from semantic_search_engine_spark.config import EngineConfig
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    cfg = EngineConfig(n_doc_buckets=8, n_term_buckets=8,
                       shuffle_partitions=8, block_size=32)
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("mine_conv_wh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, cfg).build(docs)
    qe = QueryEngine(spark, store, cfg)

    queries = ["zipfhead0 zipfhead1", "wireless bluetooth"]
    per_q = qe.batch_top_k(queries, k=10)
    jud_rows = [(qi, per_q[q][0][0], 2)
                for qi, q in enumerate(queries)]
    jud_rows.append((0, 999999999, 2))  # judged positive not in corpus
    jud = spark.createDataFrame(jud_rows,
                                "query_id int, doc_id long, grade int")

    got = qe.mine_training_triples(queries, jud, depth=10, n_neg=3,
                                   with_text=True).collect()
    assert got
    # matches the manual composition exactly (modulo row order)
    ranked = qe.batch_wand_top_k_df(queries, k=10).select(
        "query_id", "doc_id", "score")
    want = {(r["query_id"], r["pos_doc_id"], r["neg_doc_id"])
            for r in training_triples(ranked, jud, n_neg=3).collect()}
    assert {(r["query_id"], r["pos_doc_id"], r["neg_doc_id"])
            for r in got} == want
    texts = {int(r["doc_id"]): r["text"] for r in
             store.read("doc_features").select("doc_id", "text")
             .collect()}
    for r in got:
        assert r["query"] == queries[r["query_id"]]
        assert r["neg_text"] == texts[r["neg_doc_id"]]
        if r["pos_doc_id"] == 999999999:
            assert r["pos_text"] is None   # out-of-corpus judgment
        else:
            assert r["pos_text"] == texts[r["pos_doc_id"]]
    assert any(r["pos_doc_id"] == 999999999 for r in got)


def test_rekey_judgments_bridges_clickmodel_keyspace(spark):
    """X118 judgments keyed by xxhash64(analyzer-grid text) map onto
    query positions with the identical JVM normalization — messy query
    strings ("Wireless   BLUETOOTH!") land on the same key as their
    normalized form, and judgments for unlisted queries drop."""
    from pyspark.sql import functions as F

    from semantic_search_engine_spark.operators.mining import (
        rekey_judgments,
    )
    from semantic_search_engine_spark.operators.querylog import _norm_expr

    queries = ["Wireless   BLUETOOTH!", "zipfhead0 zipfhead1"]
    # build judgments the way a click pipeline would: hash the
    # impression log's normalized query text
    logged = spark.createDataFrame(
        [("wireless bluetooth", 10, 2),
         ("zipfhead0 zipfhead1", 20, 1),
         ("some other query", 30, 2)],        # not in the list -> drops
        "qtext string, doc_id long, grade int")
    jud_hashed = logged.select(
        F.xxhash64(_norm_expr("qtext")).alias("query_id"),
        "doc_id", "grade")

    got = {(r["query_id"], r["doc_id"], r["grade"])
           for r in rekey_judgments(spark, jud_hashed, queries).collect()}
    assert got == {(0, 10, 2), (1, 20, 1)}

    # and the re-keyed frame drives training_triples end to end
    res = _df(spark, [(0, 10, 4.0), (0, 11, 3.0)], RES_SCHEMA)
    trip = training_triples(res, rekey_judgments(spark, jud_hashed,
                                                 queries)).collect()
    assert {(r["pos_doc_id"], r["neg_doc_id"]) for r in trip} == {(10, 11)}
