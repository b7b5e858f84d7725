"""Incremental IVF maintenance (frozen coarse quantizer): in-memory
upsert/remove equivalence, persisted upsert through the partition-pruned
CoW path (old-list staleness soundness, untouched-dir hard links), and
the drift tripwire."""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.ann import (
    IVFIndex,
    brute_force_top_k,
    load_ivf,
    remove_ivf,
    save_ivf,
    upsert_ivf,
)
from semantic_search_engine_spark.sources.store import HadoopTableStore

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def probe(embeddings):
    row = embeddings.filter(F.col("vec_id") == 5).collect()[0]
    return [float(x) for x in row["embedding"]]


def _assign_set(idx):
    return {(r["vec_id"], r["list_id"])
            for r in idx.assignments.select("vec_id", "list_id").collect()}


def test_upsert_equals_fresh_assignment(embeddings):
    """Building on half the vectors then upserting the rest yields the
    SAME (key, list_id) assignment set as assigning everything under
    the same centroids — frozen-quantizer ingest loses nothing."""
    first = embeddings.filter(F.col("vec_id") % 2 == 0)
    rest = embeddings.filter(F.col("vec_id") % 2 == 1)
    idx = IVFIndex.build(first, n_lists=8, n_iters=2)
    up = idx.upsert(rest)
    # reference: everything re-assigned in one pass under the SAME
    # frozen centroids (upsert of the full set replaces every row)
    all_idx = idx.upsert(embeddings)
    assert _assign_set(up) == _assign_set(all_idx)
    assert up.assignments.count() == embeddings.count()


def test_upsert_search_exactness(embeddings, probe):
    """Full-probe search on the upserted index == brute force over the
    full vector set (exactness survives incremental ingest)."""
    first = embeddings.filter(F.col("vec_id") % 2 == 0)
    rest = embeddings.filter(F.col("vec_id") % 2 == 1)
    up = IVFIndex.build(first, n_lists=8, n_iters=2).upsert(rest)
    got = [(r["vec_id"], round(r["cosine"], 9))
           for r in up.search(probe, k=10, n_probe=8).collect()]
    want = [(r["vec_id"], round(r["cosine"], 9))
            for r in brute_force_top_k(embeddings, probe, 10).collect()]
    assert got == want


def test_reupsert_moves_lists_without_duplicates(spark, embeddings):
    idx = IVFIndex.build(embeddings.limit(64), n_lists=4, n_iters=2)
    # replace vec 3's embedding with (a scaled copy of) vec 50's — it
    # must land in vec 50's list, and appear exactly once
    v50 = embeddings.filter(F.col("vec_id") == 50).collect()[0]
    moved = spark.createDataFrame(
        [(3, [2.0 * float(x) for x in v50["embedding"]])],
        "vec_id long, embedding array<double>")
    up = idx.upsert(moved)
    rows = up.assignments.filter(F.col("vec_id").isin(3, 50)).collect()
    lists = {r["vec_id"]: r["list_id"] for r in rows}
    assert len(rows) == 2 and lists[3] == lists[50]
    assert up.assignments.count() == 64


def test_remove(embeddings):
    idx = IVFIndex.build(embeddings.limit(64), n_lists=4, n_iters=2)
    out = idx.remove([1, 2, 3])
    assert out.assignments.count() == 61
    assert out.assignments.filter(
        F.col("vec_id").isin(1, 2, 3)).count() == 0


def test_skew_ratio_and_list_stats(embeddings):
    idx = IVFIndex.build(embeddings.limit(64), n_lists=4, n_iters=2)
    stats = {r["list_id"]: r["n"] for r in idx.list_stats().collect()}
    assert sum(stats.values()) == 64
    assert idx.skew_ratio() >= 1.0


def test_persisted_upsert_matches_in_memory(spark, embeddings,
                                            tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("ivf_up")))
    first = embeddings.filter(F.col("vec_id") % 2 == 0)
    rest = embeddings.filter(F.col("vec_id") % 2 == 1)
    idx = IVFIndex.build(first, n_lists=8, n_iters=2)
    save_ivf(idx, store, "emb")
    upsert_ivf(store, "emb", rest)
    loaded = load_ivf(store, "emb")
    assert _assign_set(loaded) == _assign_set(idx.upsert(rest))
    # save_id cross-check must survive the incremental commits
    meta = store.table_meta("ann_emb_assignments")
    cmeta = store.table_meta("ann_emb_centroids")
    assert meta["save_id"] == cmeta["save_id"]


def test_persisted_upsert_prunes_partitions(spark, embeddings,
                                            tmp_path_factory):
    """An upsert touching few lists hard-links the untouched list dirs
    (same inodes as the previous snapshot) instead of rewriting them."""
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("ivf_pr")))
    idx = IVFIndex.build(embeddings, n_lists=8, n_iters=2)
    save_ivf(idx, store, "emb")
    old = {}
    for p in glob.glob(f"{store.root}/ann_emb_assignments/snap-*/"
                       "list_id=*/*.parquet"):
        d = p.split("list_id=")[1].split("/")[0]
        old.setdefault(d, set()).add(os.stat(p).st_ino)
    # new key, vector copied from an existing row -> exactly one list
    v0 = embeddings.orderBy("vec_id").limit(1).collect()[0]
    new = spark.createDataFrame(
        [(999999, [float(x) for x in v0["embedding"]])],
        "vec_id long, embedding array<double>")
    upsert_ivf(store, "emb", new)
    # resolve the CURRENT snapshot via the manifest
    import json
    man = json.load(open(
        f"{store.root}/ann_emb_assignments/manifest.json"))
    cur = man["path"]
    linked = rewritten = 0
    for p in glob.glob(f"{cur}/list_id=*/*.parquet"):
        d = p.split("list_id=")[1].split("/")[0]
        if os.stat(p).st_ino in old.get(d, set()):
            linked += 1
        else:
            rewritten += 1
    assert linked > 0, "no untouched list dir was hard-linked"
    assert rewritten >= 1  # at least the touched list was rewritten
    # and the data is correct
    loaded = load_ivf(store, "emb")
    assert loaded.assignments.count() == embeddings.count() + 1


def test_persisted_remove(spark, embeddings, tmp_path_factory):
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("ivf_rm")))
    idx = IVFIndex.build(embeddings.limit(64), n_lists=4, n_iters=2)
    save_ivf(idx, store, "emb")
    keys = spark.createDataFrame([(1,), (2,)], "vec_id long")
    remove_ivf(store, "emb", keys)
    loaded = load_ivf(store, "emb")
    assert loaded.assignments.count() == 62
    assert loaded.assignments.filter(
        F.col("vec_id").isin(1, 2)).count() == 0


def test_persisted_upsert_mover_has_no_stale_copy(spark, embeddings,
                                                  tmp_path_factory):
    """The soundness case: a re-upserted key whose vector moved to a
    different list must not leave its old row behind in the (otherwise
    untouched) old list directory."""
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("ivf_mv")))
    idx = IVFIndex.build(embeddings.limit(64), n_lists=4, n_iters=2)
    save_ivf(idx, store, "emb")
    # pick a key and retarget its vector at a DIFFERENT list's centroid
    row = load_ivf(store, "emb").assignments.filter(
        F.col("vec_id") == 3).collect()[0]
    old_list = row["list_id"]
    new_list = (old_list + 1) % 4
    target = [float(x) for x in idx.centroids[new_list]]
    moved = spark.createDataFrame([(3, target)],
                                  "vec_id long, embedding array<double>")
    upsert_ivf(store, "emb", moved)
    loaded = load_ivf(store, "emb")
    rows = loaded.assignments.filter(F.col("vec_id") == 3).collect()
    assert len(rows) == 1, f"stale duplicate: {rows}"
    assert rows[0]["list_id"] == new_list
    assert loaded.assignments.count() == 64


def test_upsert_refuses_duplicate_keys(spark, embeddings):
    idx = IVFIndex.build(embeddings.limit(32), n_lists=4, n_iters=1)
    v = embeddings.orderBy("vec_id").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(5, [float(x) for x in v["embedding"]]),
         (5, [2.0 * float(x) for x in v["embedding"]])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="duplicate"):
        idx.upsert(dup)


def test_persisted_remove_missing_keys_is_noop(spark, embeddings,
                                               tmp_path_factory):
    """Removing keys that aren't in the index commits nothing (no
    snapshot churn, no data_uuid change for downstream caches)."""
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("ivf_no")))
    idx = IVFIndex.build(embeddings.limit(32), n_lists=4, n_iters=1)
    save_ivf(idx, store, "emb")
    before = store.table_meta("ann_emb_assignments")["data_uuid"]
    remove_ivf(store, "emb",
               spark.createDataFrame([(10**9,)], "vec_id long"))
    after = store.table_meta("ann_emb_assignments")["data_uuid"]
    assert before == after
    assert load_ivf(store, "emb").assignments.count() == 32


def test_persisted_upsert_single_commit_for_movers(spark, embeddings,
                                                   tmp_path_factory):
    """A list-moving re-upsert is ONE atomic commit (the old-list
    directory joins the rewrite set via extra_touched) — no
    intermediate snapshot where the moving key is absent."""
    import glob as _glob
    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("ivf_1c")))
    idx = IVFIndex.build(embeddings.limit(64), n_lists=4, n_iters=2)
    save_ivf(idx, store, "emb")
    n_snaps_before = len(_glob.glob(
        f"{store.root}/ann_emb_assignments/snap-*"))
    row = load_ivf(store, "emb").assignments.filter(
        F.col("vec_id") == 3).collect()[0]
    new_list = (row["list_id"] + 1) % 4
    moved = spark.createDataFrame(
        [(3, [float(x) for x in idx.centroids[new_list]])],
        "vec_id long, embedding array<double>")
    upsert_ivf(store, "emb", moved)
    n_snaps_after = len(_glob.glob(
        f"{store.root}/ann_emb_assignments/snap-*"))
    assert n_snaps_after == n_snaps_before + 1  # one commit, not two
    loaded = load_ivf(store, "emb")
    rows = loaded.assignments.filter(F.col("vec_id") == 3).collect()
    assert len(rows) == 1 and rows[0]["list_id"] == new_list
