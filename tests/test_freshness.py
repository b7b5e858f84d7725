"""Decay document priors (X67): Elasticsearch function_score gauss /
exp / linear kernels pinned against closed-form Python math, and
recency-boosted retrieval through the X56 blended-WAND path pinned
exact vs the exhaustive blend."""
from __future__ import annotations

import datetime
import math

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.operators.freshness import decay_prior

UTC = datetime.timezone.utc
ORIGIN = datetime.datetime(2024, 1, 31, tzinfo=UTC)
SCALE = 10 * 86400.0


def _py_decay(fn, x, scale, offset, decay):
    x = max(0.0, abs(x) - offset)
    if fn == "gauss":
        return math.exp(-(x * x) * math.log(decay) / -(scale ** 2))
    if fn == "exp":
        return math.exp(math.log(decay) / scale * x)
    return max(0.0, 1.0 - x / (scale / (1.0 - decay)))


@pytest.fixture(scope="module")
def ts_df(spark):
    rows = [(i, ORIGIN - datetime.timedelta(seconds=7919 * i * 97))
            for i in range(40)]
    rows.append((99, None))
    return spark.createDataFrame(rows, "doc_id long, warc_ts timestamp")


@pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
@pytest.mark.parametrize("offset_s", [0.0, 3 * 86400.0])
def test_kernels_match_closed_form(spark, ts_df, fn, offset_s):
    got = {r["doc_id"]: r["prior"]
           for r in decay_prior(ts_df, fn=fn, origin=ORIGIN,
                                scale_s=SCALE, offset_s=offset_s,
                                decay=0.33).collect()}
    assert got[99] == 0.0  # NULL timestamp -> no freshness
    for i in range(40):
        x = 7919 * i * 97
        want = _py_decay(fn, x, SCALE, offset_s, 0.33)
        assert got[i] == pytest.approx(want, abs=1e-12), (fn, i)


@pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
def test_decay_value_at_scale_is_decay(spark, ts_df, fn):
    df = decay_prior(ts_df.limit(0).union(
        ts_df.sparkSession.createDataFrame(
            [(1, ORIGIN), (2, ORIGIN - datetime.timedelta(seconds=SCALE))],
            "doc_id long, warc_ts timestamp")),
        fn=fn, origin=ORIGIN, scale_s=SCALE, decay=0.5)
    got = {r["doc_id"]: r["prior"] for r in df.collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.5, abs=1e-12)


def test_default_origin_is_newest_timestamp(spark, ts_df):
    got = {r["doc_id"]: r["prior"]
           for r in decay_prior(ts_df, origin=None, scale_s=SCALE)
           .collect()}
    assert got[0] == pytest.approx(1.0)  # doc 0 IS the newest


def test_validation(spark, ts_df):
    with pytest.raises(ValueError, match="fn must be"):
        decay_prior(ts_df, fn="cosine")
    with pytest.raises(ValueError, match="decay"):
        decay_prior(ts_df, decay=1.0)
    with pytest.raises(ValueError, match="scale_s"):
        decay_prior(ts_df, scale_s=0.0)
    with pytest.raises(ValueError, match="all-NULL"):
        decay_prior(ts_df.filter("doc_id = 99"), origin=None)


# ---------------------------------------------------------------------------
# blended retrieval: recency prior through the X56 boosted-WAND path
# ---------------------------------------------------------------------------

CFG = EngineConfig(n_doc_buckets=8, n_term_buckets=8, shuffle_partitions=8,
                   block_size=32)


@pytest.fixture(scope="module")
def eng(spark, tiny_corpus_dir, tmp_path_factory):
    from semantic_search_engine_spark.plans.build_index import IndexBuilder
    from semantic_search_engine_spark.plans.query import QueryEngine
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("wh_fresh")))
    docs = spark.read.parquet(f"{tiny_corpus_dir}/documents.parquet")
    IndexBuilder(spark, store, CFG).build(docs)
    return QueryEngine(spark, store, None)


def test_recency_boosted_wand_matches_exhaustive(eng):
    prior = decay_prior(eng.store.read("doc_meta"), fn="exp",
                        origin=None, scale_s=3600.0, decay=0.5)
    fast = eng.boosted_top_k("zipfhead0 zipfhead1", static="recency",
                             static_df=prior, w_static=2.0, k=10)
    slow = eng.boosted_top_k("zipfhead0 zipfhead1", static="recency",
                             static_df=prior, w_static=2.0, k=10,
                             mode="exhaustive")
    assert len(fast) == 10
    assert [d for d, _ in fast] == [d for d, _ in slow]
    for (_, a), (_, b) in zip(fast, slow):
        assert math.isclose(a, b, rel_tol=0, abs_tol=1e-9)


def test_recency_boost_reorders_vs_plain(eng):
    # tiny-corpus warc_ts steps one minute per doc — an hour-scale decay
    # with a strong weight must reorder the head
    q = "zipfhead0 zipfhead1"
    prior = decay_prior(eng.store.read("doc_meta"), fn="exp",
                        origin=None, scale_s=3600.0, decay=0.5)
    plain = [d for d, _ in eng.boosted_top_k(q, w_static=0.0, k=10)]
    fresh = [d for d, _ in eng.boosted_top_k(q, static="recency",
                                             static_df=prior,
                                             w_static=5.0, k=10)]
    assert fresh != plain
