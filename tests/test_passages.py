"""Passage chunking + passage-level indexing + doc rollup (X83): the
chunker pinned against a direct Python oracle, and doc-level top-k over
a real passage index pinned against an OracleIndex built on the same
passages."""
from __future__ import annotations

import math
import re

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.passages import (
    doc_top_k_from_passages,
    parent_url_expr,
    passages_as_documents,
    split_passages,
)
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=4, n_term_buckets=4,
                   shuffle_partitions=4, block_size=16)


def _tok(t):
    return re.findall(r"[a-z0-9]+", t.lower()) if t else []


def _py_chunks(text, m, s):
    toks = _tok(text)
    if not toks:
        return []
    n = len(toks)
    nch = 1 if n <= m else math.ceil((n - m) / s) + 1
    out = []
    for i in range(nch):
        start = i * s
        w = toks[start:start + m]
        out.append((i, start, len(w), " ".join(w)))
    return out


# ---------------------------------------------------------------- chunker

CHUNK_DOCS = [
    ("https://a.example/1", " ".join(f"w{i}" for i in range(120))),
    ("https://a.example/2", " ".join(f"x{i}" for i in range(50))),   # == m
    ("https://a.example/3", " ".join(f"y{i}" for i in range(51))),   # m + 1
    ("https://a.example/4", "Short Doc, with Punct-uation!"),
    ("https://a.example/5", ""),
    ("https://a.example/6", None),
]


@pytest.mark.parametrize("m,s", [(50, 50), (50, 25), (10, 3), (1, 1)])
def test_chunker_matches_python_oracle(spark, m, s):
    docs = spark.createDataFrame(CHUNK_DOCS, "url string, text string")
    got = {}
    for r in split_passages(docs, max_tokens=m, stride=s).collect():
        got.setdefault(r["url"], []).append(
            (r["passage_idx"], r["start_token"], r["n_tokens"],
             r["text"]))
    for u in got:
        got[u].sort()
    want = {u: _py_chunks(t, m, s) for u, t in CHUNK_DOCS
            if _py_chunks(t, m, s)}
    assert got == want


def test_chunker_passage_urls_and_stride_validation(spark):
    docs = spark.createDataFrame(CHUNK_DOCS, "url string, text string")
    rows = split_passages(docs, max_tokens=50).collect()
    for r in rows:
        assert r["passage_url"] == f"{r['url']}#p{r['passage_idx']}"
    with pytest.raises(ValueError):
        split_passages(docs, max_tokens=50, stride=51)
    with pytest.raises(ValueError):
        split_passages(docs, max_tokens=50, stride=0)
    with pytest.raises(ValueError):
        split_passages(docs, max_tokens=0)


def test_parent_url_expr_roundtrip(spark):
    docs = spark.createDataFrame(CHUNK_DOCS, "url string, text string")
    p = split_passages(docs, max_tokens=10)
    back = p.select(parent_url_expr("passage_url").alias("u")).distinct()
    assert ({r["u"] for r in back.collect()}
            == {u for u, t in CHUNK_DOCS if _tok(t)})
    # identity on non-passage urls
    plain = docs.select(parent_url_expr("url").alias("u")).collect()
    assert {r["u"] for r in plain} == {u for u, _ in CHUNK_DOCS}


# ------------------------------------------------- end-to-end passage index

N_DOCS = 12
M, S = 30, 30


def _doc_text(i: int) -> str:
    """needle terms concentrated in the middle chunk; 75 tokens =
    3 chunks at m=30."""
    head = " ".join(f"filler{j} common" for j in range(10))     # 20 toks
    mid = (f"needle{i % 3} " * (i + 1)
           + " ".join(f"mid{j}" for j in range(30 - (i + 1))))  # 30 toks
    tail = " ".join(f"tail{j} shared" for j in range(12))       # 24 toks
    return f"{head} {mid} {tail}"


def _parent_rows():
    return [dict(url=f"https://p{i}.example/doc", warc_ts=None,
                 html=None, text=_doc_text(i), lang="en")
            for i in range(N_DOCS)]


@pytest.fixture(scope="module")
def passage_index(spark, tmp_path_factory):
    store = HadoopTableStore(spark,
                             str(tmp_path_factory.mktemp("passages")))
    docs = spark.createDataFrame(
        _parent_rows(), "url string, warc_ts timestamp, html binary, "
                        "text string, lang string")
    passages = split_passages(docs, max_tokens=M, stride=S)
    IndexBuilder(spark, store, CFG).build(passages_as_documents(passages))
    qe = QueryEngine(spark, store, CFG)
    oracle_rows = [dict(url=r["passage_url"], warc_ts=None, html=None,
                        text=r["text"], lang="en")
                   for r in passages.collect()]
    return qe, OracleIndex.build(oracle_rows, CFG)


def _oracle_doc_rollup(oidx, query, agg, k):
    per_url = {}
    res = oidx.search(query, k=10**6)
    for h in res["results"]:
        parent = re.sub(r"#p\d+$", "", h["url"])
        per_url.setdefault(parent, []).append(h["score"])
    folds = {"max": max, "sum": sum,
             "avg": lambda xs: sum(xs) / len(xs)}
    rolled = [(u, folds[agg](ss)) for u, ss in per_url.items()]
    rolled.sort(key=lambda x: (-x[1], x[0]))
    return rolled[:k]


@pytest.mark.parametrize("agg", ["max", "sum", "avg"])
@pytest.mark.parametrize("q", ["needle1", "needle2 common", "shared"])
def test_doc_rollup_exhaustive_matches_oracle(passage_index, q, agg):
    qe, oidx = passage_index
    got = [(r["url"], r["score"]) for r in
           doc_top_k_from_passages(qe, q, k=5, agg=agg,
                                   exhaustive=True).collect()]
    want = _oracle_doc_rollup(oidx, q, agg, 5)
    assert [u for u, _ in got] == [u for u, _ in want], (q, agg)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_doc_rollup_fast_path_max_agg(passage_index):
    qe, oidx = passage_index
    # oversample covers every matching passage on this tiny corpus ->
    # the approximate fast path must equal the exhaustive baseline
    got = [(r["url"], r["score"]) for r in
           doc_top_k_from_passages(qe, "needle1", k=3, agg="max",
                                   oversample=20).collect()]
    want = _oracle_doc_rollup(oidx, "needle1", "max", 3)
    assert [u for u, _ in got] == [u for u, _ in want]


def test_best_passage_is_the_needle_chunk(passage_index):
    qe, _ = passage_index
    rows = doc_top_k_from_passages(qe, "needle1", k=3,
                                   exhaustive=True).collect()
    # needle terms live in the middle chunk (tokens 20..49 -> idx 0 at
    # m=30 covers 0..29, so the needle spans chunks 0 and 1; the most
    # needle-dense chunk is idx 1 for high-repeat docs)
    assert rows[0]["best_passage_idx"] in (0, 1)
    assert rows[0]["n_matching_passages"] >= 1


def test_agg_validation(passage_index):
    qe, _ = passage_index
    with pytest.raises(ValueError):
        doc_top_k_from_passages(qe, "needle1", agg="median")
