"""Oracle + fixture-corpus invariants (FIXTURES.md §4)."""

import datetime as dt

from semantic_search_engine_spark.corpus import QUERY_CORPUS, generate_rows
from semantic_search_engine_spark.oracle import OracleIndex
from semantic_search_engine_spark.textproc import doc_id_for_url


def url_of(i: int) -> str:
    return f"https://site{i % 97:04d}.example/page/{i:05d}"


def test_validity_filter_excludes_empty_doc(tiny_oracle):
    # doc 0: empty html, NULL text → not indexed
    assert doc_id_for_url(url_of(0)) not in tiny_oracle.doc_meta
    assert tiny_oracle.n_docs == 199


def test_boilerplate_only_doc_has_len_zero(tiny_oracle):
    did = doc_id_for_url(url_of(1))
    assert tiny_oracle.doc_len[did] == 0


def test_duplicate_content_tie_break(tiny_oracle):
    d6, d7 = doc_id_for_url(url_of(6)), doc_id_for_url(url_of(7))
    r = tiny_oracle.search("identical twin", k=10)
    got = [(h["doc_id"], h["score"]) for h in r["results"]]
    ids = [d for d, _ in got]
    assert d6 in ids and d7 in ids
    s = dict(got)
    assert s[d6] == s[d7]
    assert ids.index(min(d6, d7)) < ids.index(max(d6, d7))  # doc_id ASC on tie


def test_absent_and_rare_terms(tiny_oracle):
    assert tiny_oracle.search("absentterm9z")["total_count"] == 0
    r = tiny_oracle.search("raretermxq")
    assert r["total_count"] == 1
    assert r["results"][0]["doc_id"] == doc_id_for_url(url_of(11))


def test_lang_filter(tiny_oracle):
    # doc 8 is lang='de' and contains the query terms
    d8 = doc_id_for_url(url_of(8))
    r_all = tiny_oracle.search("wireless bluetooth headphones", k=100)
    assert d8 in [h["doc_id"] for h in r_all["results"]]
    r_en = tiny_oracle.search("wireless bluetooth headphones", k=100, lang="en")
    assert d8 not in [h["doc_id"] for h in r_en["results"]]
    assert r_en["total_count"] < r_all["total_count"]


def test_warc_ts_range_filter(tiny_oracle):
    lo = dt.datetime(2025, 1, 1, 1, 0)   # doc 60 onwards
    r = tiny_oracle.search("zipfhead0", k=100, warc_ts_min=lo)
    assert all(h["warc_ts"] >= lo for h in r["results"])
    assert r["total_count"] < tiny_oracle.search("zipfhead0")["total_count"]


def test_pagination_and_count(tiny_oracle):
    full = tiny_oracle.search("zipfhead0 zipfhead1", k=30)
    p1 = tiny_oracle.search("zipfhead0 zipfhead1", k=10, offset=0)
    p2 = tiny_oracle.search("zipfhead0 zipfhead1", k=10, offset=10)
    ids = [h["doc_id"] for h in full["results"]]
    assert [h["doc_id"] for h in p1["results"]] == ids[:10]
    assert [h["doc_id"] for h in p2["results"]] == ids[10:20]
    assert p1["total_count"] == p2["total_count"] == full["total_count"]


def test_min_score_threshold(tiny_oracle):
    base = tiny_oracle.search("zipfhead0", k=100)
    cutoff = base["results"][2]["score"]
    r = tiny_oracle.search("zipfhead0", k=100, min_score=cutoff)
    assert r["total_count"] == 3 or all(
        h["score"] >= cutoff for h in r["results"])


def test_scores_positive_and_sorted(tiny_oracle):
    for pq in QUERY_CORPUS:
        r = tiny_oracle.search(pq.query)
        scores = [h["score"] for h in r["results"]]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_corpus_deterministic():
    a = list(generate_rows(50))
    b = list(generate_rows(50))
    assert all(x["html"] == y["html"] and x["url"] == y["url"]
               for x, y in zip(a, b))


def test_corpus_chunk_invariance():
    """generate_rows draws token indices per doc-chunk (round-5 review:
    the single-call form held O(n_docs) token indices in driver
    memory); the corpus must be BIT-identical at any chunk size —
    token_chunk_docs=n_docs reproduces the old single-call stream
    exactly, and a deliberately awkward chunk size (crossing the
    edge-doc block and the planted-query intervals) must match it."""
    n = 900
    single = list(generate_rows(n, token_chunk_docs=n))
    for chunk in (7, 256):
        chunked = list(generate_rows(n, token_chunk_docs=chunk))
        assert chunked == single
