"""Index aliases (X89): atomic pointer swap between physical index
roots, readiness gating, and the stale-handle immutability contract."""
from __future__ import annotations

import os

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.sources.alias import (
    engine_for_alias,
    list_aliases,
    resolve_alias,
    set_alias,
)
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=2, n_term_buckets=2,
                   shuffle_partitions=2, block_size=8)


def _rows(marker: str):
    return [dict(url=f"https://{marker}{i}.example/x", warc_ts=None,
                 html=None,
                 text=f"{marker} corpus doc{i} shared words here of the",
                 lang="en") for i in range(6)]


@pytest.fixture(scope="module")
def pool(spark, tmp_path_factory):
    pool_root = str(tmp_path_factory.mktemp("alias_pool"))
    for marker in ("blue", "green"):
        root = os.path.join(pool_root, f"idx_{marker}")
        docs = spark.createDataFrame(
            _rows(marker), "url string, warc_ts timestamp, html binary, "
                           "text string, lang string")
        IndexBuilder(spark, HadoopTableStore(spark, root), CFG).build(docs)
    return pool_root


def test_set_resolve_swap(spark, pool):
    rec = set_alias(pool, "prod", "idx_blue")
    assert rec["previous_target"] is None
    assert resolve_alias(pool, "prod").endswith("idx_blue")
    qe = engine_for_alias(spark, pool, "prod", CFG)
    assert qe.top_k("blue", k=3)          # serves the blue corpus
    assert qe.top_k("green", k=3) == []

    rec2 = set_alias(pool, "prod", "idx_green")
    assert rec2["previous_target"] == "idx_blue"
    qe2 = engine_for_alias(spark, pool, "prod", CFG)
    assert qe2.top_k("green", k=3)
    assert qe2.top_k("blue", k=3) == []
    # the stale handle keeps serving its immutable target
    assert qe.top_k("blue", k=3)


def test_readiness_gate(spark, pool, tmp_path_factory):
    empty = str(tmp_path_factory.mktemp("halfbuilt"))
    with pytest.raises(ValueError, match="not servable"):
        set_alias(pool, "staging", empty)
    # opt-out allows metadata-only roots
    set_alias(pool, "staging", empty, require_tables=())
    assert resolve_alias(pool, "staging") == empty


def test_missing_target_and_alias(pool):
    with pytest.raises(FileNotFoundError):
        set_alias(pool, "x", "idx_nonexistent")
    with pytest.raises(FileNotFoundError):
        resolve_alias(pool, "neveraliased")
    with pytest.raises(ValueError):
        set_alias(pool, "../escape", "idx_blue")


def test_list_aliases(pool):
    aliases = list_aliases(pool)
    assert aliases["prod"].endswith("idx_green")
    assert "staging" in aliases
