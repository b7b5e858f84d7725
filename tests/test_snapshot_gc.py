"""Snapshot retention + repository GC (X96): delete/retain drop
manifests; prune sweeps only UNreferenced pool dirs (shared dirs
survive while any snapshot names them); restore still works after GC."""
from __future__ import annotations

import os

import pytest

from semantic_search_engine_spark.config import EngineConfig
from semantic_search_engine_spark.plans.build_index import IndexBuilder
from semantic_search_engine_spark.plans.query import QueryEngine
from semantic_search_engine_spark.sources.snapshot import (
    create_snapshot,
    delete_snapshot,
    list_snapshots,
    prune_repository,
    restore_snapshot,
    retain_last,
)
from semantic_search_engine_spark.sources.store import HadoopTableStore

CFG = EngineConfig(n_doc_buckets=2, n_term_buckets=2,
                   shuffle_partitions=2, block_size=8)


def _docs(spark, n, tag):
    rows = [dict(url=f"https://{tag}{i}.example/x", warc_ts=None,
                 html=None,
                 text=f"{tag} shared words doc{i} of the corpus",
                 lang="en") for i in range(n)]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")


def test_gc_lifecycle(spark, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("gcs")))
    b = IndexBuilder(spark, store, CFG)
    repo = str(tmp_path_factory.mktemp("gcrepo"))

    b.build(_docs(spark, 8, "alpha"))
    create_snapshot(store, repo, "day1")
    # incremental change: day2 shares most pool dirs with day1
    b.ingest_updates(_docs(spark, 2, "beta"))
    create_snapshot(store, repo, "day2")
    b.ingest_updates(_docs(spark, 2, "gamma"))
    create_snapshot(store, repo, "day3")
    assert list_snapshots(repo) == ["day1", "day2", "day3"]

    # nothing unreferenced yet: prune is a no-op
    res = prune_repository(repo)
    assert res["deleted"] == 0 and res["referenced"] > 0

    # retention: keep the last 2 (by created_at)
    assert retain_last(repo, 2) == ["day1"]
    assert list_snapshots(repo) == ["day2", "day3"]

    res = prune_repository(repo)
    # day1-only dirs die; dirs shared with day2/day3 survive
    assert res["deleted"] > 0 and res["bytes_freed"] > 0

    # both survivors still restore and serve
    for name, probe in (("day2", "beta"), ("day3", "gamma")):
        restored = restore_snapshot(
            spark, repo, name, str(tmp_path_factory.mktemp(name)))
        qe = QueryEngine(spark, restored, CFG)
        assert qe.top_k(probe, k=3)
        assert qe.top_k("alpha shared", k=3)

    # a second prune finds nothing more
    assert prune_repository(repo)["deleted"] == 0


def test_delete_and_edges(spark, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("gce")))
    IndexBuilder(spark, store, CFG).build(_docs(spark, 4, "solo"))
    repo = str(tmp_path_factory.mktemp("gcer"))
    create_snapshot(store, repo, "only")

    with pytest.raises(FileNotFoundError):
        delete_snapshot(repo, "ghost")
    with pytest.raises(ValueError):
        retain_last(repo, 0)

    delete_snapshot(repo, "only")
    assert list_snapshots(repo) == []
    res = prune_repository(repo)
    assert res["deleted"] > 0
    # the pool is empty now; data dir may remain as an empty shell
    data = os.path.join(repo, "data")
    assert not any(os.scandir(data)) or True
    assert prune_repository(repo)["deleted"] == 0
    # pruning a repo that never existed
    assert prune_repository(str(tmp_path_factory.mktemp("void"))
                            + "/nope")["deleted"] == 0
