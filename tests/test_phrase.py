"""Positional index, phrase/proximity retrieval, and snippets vs oracle.

The Spark positional path must be score-bit-identical to
``OracleIndex.phrase_top_k`` (same sorted-term float accumulation), and the
recheck path (GIN bitmap-scan + heap-recheck execution, no positional
index) must be result-identical to the positional path.
"""

import numpy as np
import pandas as pd
import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.phrase import (
    POSITIONS_COLS,
    decode_position_block,
    encode_position_block,
    make_positions_encoder,
)
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore
from semantic_search_engine_spark.textproc import (
    make_snippet,
    min_ordered_window_span,
    min_window_span,
    phrase_match_count,
    token_positions,
    tokenize,
)

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=16)  # small blocks → multi-block position lists

PHRASES = ["wireless bluetooth headphones", "gaming laptop",
           "waterproof bluetooth speaker", "zipfhead0 zipfhead1",
           "wireless absentterm9z",          # one term absent
           "bluetooth wireless headphones"]  # right terms, wrong order


# --------------------------------------------------------------- pure python

def test_token_positions_consistent_with_tokenize():
    t = "The cat, the hat & the CAT9 cat"
    pos = token_positions(t)
    toks = tokenize(t)
    assert sum(len(v) for v in pos.values()) == len(toks)
    for term, pl in pos.items():
        assert pl == sorted(pl)
        assert [toks[p] for p in pl] == [term] * len(pl)
    # the(0) cat(1) the(2) hat(3) the(4) cat9(5) cat(6)
    assert pos["the"] == [0, 2, 4]
    assert pos["cat"] == [1, 6]
    assert pos["cat9"] == [5]


def test_phrase_match_count_basic():
    pos = token_positions("a b a b a")
    assert phrase_match_count(pos, ["a", "b"]) == 2
    assert phrase_match_count(pos, ["b", "a"]) == 2
    assert phrase_match_count(pos, ["a", "b", "a"]) == 2  # overlapping
    assert phrase_match_count(pos, ["a", "a"]) == 0
    assert phrase_match_count(pos, ["a", "c"]) == 0
    assert phrase_match_count(pos, []) == 0
    assert phrase_match_count(token_positions("x x x"), ["x", "x"]) == 2


def test_min_window_span_basic():
    pos = token_positions("a x x b x a b")
    assert min_window_span(pos, ["a", "b"]) == 2       # positions 5,6
    assert min_window_span(pos, ["a"]) == 1
    assert min_window_span(pos, ["a", "c"]) is None
    pos2 = token_positions("a x b x c")
    assert min_window_span(pos2, ["a", "b", "c"]) == 5


def test_min_ordered_window_span_basic():
    pos = token_positions("b x x a x b a")
    # unordered best window is (b,a)@5,6 span 2; ordered a→b best is
    # a@3 .. b@5 span 3
    assert min_window_span(pos, ["a", "b"]) == 2
    assert min_ordered_window_span(pos, ["a", "b"]) == 3
    assert min_ordered_window_span(pos, ["b", "a"]) == 2   # b@5 a@6
    # order unsatisfiable: no b after the last a
    pos2 = token_positions("b x a")
    assert min_ordered_window_span(pos2, ["a", "b"]) is None
    assert min_ordered_window_span(pos2, ["b", "a"]) == 3
    # repeats need distinct ascending positions
    pos3 = token_positions("a x a")
    assert min_ordered_window_span(pos3, ["a", "a"]) == 3
    assert min_ordered_window_span(token_positions("a"), ["a", "a"]) is None
    assert min_ordered_window_span(pos3, ["a"]) == 1
    assert min_ordered_window_span(pos3, ["a", "c"]) is None
    # phrase adjacency is the span == len(terms) special case
    pos4 = token_positions("x a b y")
    assert min_ordered_window_span(pos4, ["a", "b"]) == 2


def _naive_ordered_span(lists):
    """Exponential reference: try every combination, keep chains with
    strictly increasing positions, return the minimal inclusive span."""
    import itertools
    best = None
    for combo in itertools.product(*lists):
        if all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
            span = combo[-1] - combo[0] + 1
            if best is None or span < best:
                best = span
    return best


def test_min_ordered_window_span_matches_bruteforce():
    from semantic_search_engine_spark.textproc import (
        min_ordered_window_span_lists,
    )

    rng = np.random.default_rng(13)
    for trial in range(300):
        n_lists = int(rng.integers(1, 5))
        lists = []
        for _ in range(n_lists):
            n = int(rng.integers(1, 6))
            lists.append(sorted(rng.choice(20, size=n,
                                           replace=False).tolist()))
        # sometimes alias a list to model a repeated query term
        if n_lists > 1 and rng.random() < 0.3:
            lists[-1] = lists[0]
        got = min_ordered_window_span_lists(lists)
        assert got == _naive_ordered_span(lists), lists


# ------------------------------------------------------------------- codec

def test_position_block_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.cumsum(rng.integers(1, 1000, 50)).astype(np.int64)
    dls = rng.integers(1, 5000, 50).astype(np.int64)
    npos = rng.integers(1, 9, 50).astype(np.int64)
    flat = np.concatenate([
        np.cumsum(rng.integers(1, 300, int(n))) for n in npos
    ]).astype(np.int64)
    row = dict(zip(["doc_ids_vb", "dls_vb", "npos_vb", "pos_vb"],
                   encode_position_block(ids, dls, npos, flat)))
    oids, odls, onpos, offs, oflat = decode_position_block(row)
    np.testing.assert_array_equal(oids, ids)
    np.testing.assert_array_equal(odls, dls)
    np.testing.assert_array_equal(onpos, npos)
    np.testing.assert_array_equal(oflat, flat)
    assert offs[-1] == flat.size


def _naive_blocks(rows, block_size):
    """Reference encoding: group rows by (term, pid), block per
    ``block_size`` docs, no streaming."""
    out = []
    groups: dict = {}
    for r in rows:
        groups.setdefault((r[0], r[1]), []).append(r)
    for (term, pid), g in groups.items():
        g.sort(key=lambda r: r[2])
        for bi in range(0, len(g), block_size):
            blk = g[bi:bi + block_size]
            ids = np.array([r[2] for r in blk], dtype=np.int64)
            dls = np.array([r[3] for r in blk], dtype=np.int64)
            npos = np.array([len(r[4]) for r in blk], dtype=np.int64)
            flat = np.concatenate([np.asarray(r[4], dtype=np.int64)
                                   for r in blk])
            out.append((term, pid, bi // block_size, len(blk),
                        int(ids[0]), int(ids[-1]))
                       + encode_position_block(ids, dls, npos, flat))
    return sorted(out, key=lambda r: (r[0], r[1], r[2]))


@pytest.mark.parametrize("split", [1, 3, 7, 1000])
def test_positions_encoder_stream_boundaries(split):
    """The streaming encoder must be invariant to Arrow batch boundaries
    (carry across batches) and equal the naive per-group encoding."""
    rng = np.random.default_rng(3)
    rows = []
    for term in ["alpha", "beta"]:
        for pid in [0, 1]:
            n = int(rng.integers(1, 40))
            ids = np.cumsum(rng.integers(1, 50, n))
            for d in ids:
                npp = int(rng.integers(1, 4))
                rows.append((term, pid, int(d), int(rng.integers(1, 99)),
                             sorted(rng.integers(0, 500, npp).tolist())))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    batches = [pd.DataFrame(rows[i:i + split],
                            columns=["term", "partition_id", "doc_id",
                                     "dl", "positions"])
               for i in range(0, len(rows), split)]
    enc = make_positions_encoder(block_size=8)
    got = []
    for pdf in enc(iter(batches)):
        got.extend(tuple(r) for r in pdf.itertuples(index=False))
    got.sort(key=lambda r: (r[0], r[1], r[2]))
    expected = _naive_blocks(rows, 8)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g == e


# ------------------------------------------------------------- spark engine

@pytest.fixture(scope="module")
def built_pos(spark, tiny_corpus_dir, tmp_path_factory):
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("wh_positions")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    builder = IndexBuilder(spark, store, CFG)
    builder.build(docs)
    builder.build_positions()
    return store, builder


@pytest.fixture(scope="module")
def tiny_oracle_pos(tiny_rows):
    return OracleIndex.build(tiny_rows, CFG)


def test_positions_agree_with_postings_tf(built_pos, spark):
    """Σ positions per (term, doc) == tf, and doc coverage matches."""
    store, _ = built_pos
    rows = store.read("positions").collect()
    seen = {}
    for r in rows:
        ids, dls, npos, offs, flat = decode_position_block(r)
        assert list(ids) == sorted(ids)
        for d, n, dl in zip(ids, npos, dls):
            seen[(r["term"], int(d))] = (int(n), int(dl))
            assert n >= 1
    from semantic_search_engine_spark.plans.query import decode_postings
    post = store.read("postings").select(
        "term", "doc_ids_vb", "tfs_vb", "dls_vb", "n_postings")
    tf_rows = post.mapInPandas(decode_postings,
                               "term string, doc_id long, tf int, dl int"
                               ).collect()
    expected = {(r["term"], int(r["doc_id"])): (int(r["tf"]), int(r["dl"]))
                for r in tf_rows}
    assert seen == expected


def test_phrase_positions_matches_oracle(built_pos, spark, tiny_oracle_pos):
    store, _ = built_pos
    qe = QueryEngine(spark, store, CFG)
    for phrase in PHRASES:
        got = qe.phrase_top_k(phrase, k=10, mode="positions")
        exp = tiny_oracle_pos.phrase_top_k(phrase, k=10)
        assert [(d, n) for d, _s, n in got] == \
               [(d, n) for d, _s, n in exp], phrase
        for (gd, gs, _), (ed, es, _) in zip(got, exp):
            assert gs == es, (phrase, gd)  # bit-identical float order


def test_phrase_recheck_identical_to_positions(built_pos, spark,
                                               tiny_oracle_pos):
    store, _ = built_pos
    qe = QueryEngine(spark, store, CFG)
    for phrase in PHRASES:
        a = qe.phrase_top_k(phrase, k=10, mode="positions")
        b = qe.phrase_top_k(phrase, k=10, mode="recheck")
        assert a == b, phrase


def test_near_top_k_matches_oracle(built_pos, spark, tiny_oracle_pos):
    store, _ = built_pos
    qe = QueryEngine(spark, store, CFG)
    for q, span in [("wireless headphones", 3),
                    ("gaming laptop", 1),     # span 1 impossible for 2 terms
                    ("zipfhead0 zipfhead3", 12)]:
        got = qe.near_top_k(q, max_span=span, k=10, mode="positions")
        exp = tiny_oracle_pos.near_top_k(q, max_span=span, k=10)
        assert got == exp, (q, span)
        rec = qe.near_top_k(q, max_span=span, k=10, mode="recheck")
        assert rec == got, (q, span)


def test_span_near_top_k_matches_oracle(built_pos, spark, tiny_oracle_pos):
    store, _ = built_pos
    qe = QueryEngine(spark, store, CFG)
    for q, span in [("wireless headphones", 3),
                    ("headphones wireless", 3),   # order-sensitive flip
                    ("gaming laptop", 2),
                    ("zipfhead0 zipfhead3", 12),
                    ("zipfhead3 zipfhead0", 12)]:
        got = qe.span_near_top_k(q, max_span=span, k=10, mode="positions")
        exp = tiny_oracle_pos.span_near_top_k(q, max_span=span, k=10)
        assert got == exp, (q, span)
        rec = qe.span_near_top_k(q, max_span=span, k=10, mode="recheck")
        assert rec == got, (q, span)


def test_span_near_is_order_sensitive(tiny_oracle_pos):
    """The ordered match set must be a subset of the unordered one, and
    at least one query on this corpus must show a strict difference
    between the two directions (else the tests above prove nothing)."""
    differs = False
    for q in ["wireless headphones", "headphones wireless",
              "zipfhead0 zipfhead3", "zipfhead3 zipfhead0"]:
        near = {d for d, _s, _n in
                tiny_oracle_pos.near_top_k(q, max_span=4, k=10**6)}
        span = {d for d, _s, _n in
                tiny_oracle_pos.span_near_top_k(q, max_span=4, k=10**6)}
        assert span <= near, q
        rev = " ".join(reversed(q.split()))
        span_rev = {d for d, _s, _n in
                    tiny_oracle_pos.span_near_top_k(rev, max_span=4,
                                                    k=10**6)}
        if span != span_rev:
            differs = True
    assert differs


def test_span_near_requires_max_span(built_pos, spark):
    store, _ = built_pos
    qe = QueryEngine(spark, store, CFG)
    with pytest.raises(ValueError):
        qe.phrase_top_k_df("wireless headphones", ordered=True)


def test_phrase_auto_mode_uses_positions_table(built_pos, spark):
    store, _ = built_pos
    qe = QueryEngine(spark, store, CFG)
    plan = qe.phrase_top_k_df("wireless bluetooth headphones",
                              mode="auto")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "positions" in plan


def test_positions_incremental_maintenance_bit_identical(
        spark, tiny_corpus_dir, tmp_path_factory):
    """Upsert with positions present: only touched buckets re-encode, and
    the table equals a from-scratch rebuild byte-for-byte."""
    from semantic_search_engine_spark.corpus import generate_rows

    base = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    upd_rows = [
        {"url": r["url"], "warc_ts": r["warc_ts"], "html": r["html"],
         "text": "fresh update wireless bluetooth headphones review",
         "lang": r["lang"]}
        for r in list(generate_rows(6))[:3]]
    upd = spark.createDataFrame(
        upd_rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")

    s1 = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_inc")))
    b1 = IndexBuilder(spark, s1, CFG)
    b1.build(base)
    b1.build_positions()
    b1.ingest_updates(upd, incremental=True)

    s2 = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_full")))
    b2 = IndexBuilder(spark, s2, CFG)
    b2.build(base)
    b2.ingest_updates(upd, incremental=False)
    b2.build_positions()

    key = ["term", "partition_id", "block_id"]
    r1 = {tuple(r[k] for k in key): tuple(bytes(r[c]) for c in
                                          ["doc_ids_vb", "dls_vb",
                                           "npos_vb", "pos_vb"])
          for r in s1.read("positions").collect()}
    r2 = {tuple(r[k] for k in key): tuple(bytes(r[c]) for c in
                                          ["doc_ids_vb", "dls_vb",
                                           "npos_vb", "pos_vb"])
          for r in s2.read("positions").collect()}
    assert r1 == r2 and len(r1) > 0


# ---------------------------------------------------------------- snippets

def test_make_snippet_basic():
    text = "Alpha beta gamma. Delta epsilon zeta eta theta."
    s = make_snippet(text, ["delta", "zeta"], max_words=4)
    assert "<b>Delta</b>" in s and "<b>zeta</b>" in s
    assert s.startswith("... ")          # clipped head marked
    s2 = make_snippet(text, ["alpha"], max_words=3)
    assert s2.startswith("<b>Alpha</b>")
    assert s2.endswith(" ...")
    assert make_snippet(text, ["missing"], max_words=3).count("<b>") == 0
    assert make_snippet("", ["x"]) == ""
    assert make_snippet(None, ["x"]) == ""


def test_make_snippet_window_choice_deterministic():
    # second window covers BOTH terms — must win over the first hit
    text = "cat filler filler filler filler filler cat dog"
    s = make_snippet(text, ["cat", "dog"], max_words=3)
    assert "<b>cat</b> <b>dog</b>" in s
    assert s.startswith("... ")


def test_engine_snippets_and_highlight(built_pos, spark):
    store, _ = built_pos
    qe = QueryEngine(spark, store, CFG)
    q = "wireless bluetooth headphones"
    out = qe.search(q, k=3, count_mode="none", highlight=True)
    assert out["results"]
    for r in out["results"]:
        assert "<b>" in r["snippet"]
    # snippet uses the doc's own text around the match
    snips = qe.snippets([r["doc_id"] for r in out["results"]], q)
    assert set(snips) == {r["doc_id"] for r in out["results"]}
