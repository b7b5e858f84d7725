"""Engine-level dedup + ANN operators over the driver testdata tables."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.operators.ann import (
    IVFIndex,
    brute_force_top_k,
    multi_seed_near_dup_pairs,
)
from semantic_search_engine_spark.operators.dedup import (
    cluster_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    near_dedup,
    shingle_minhash_signatures,
    verify_jaccard,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Driver documents plus planted exact and near duplicates."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 200)
    rows = base.select("doc_id", "text").collect()
    extra = []
    # exact dups of docs 3 and 7 (new ids 10_003 / 10_007)
    for d in (3, 7):
        extra.append((10_000 + d, next(r["text"] for r in rows
                                       if r["doc_id"] == d)))
    # near dup of doc 11: append two words to its text
    t11 = next(r["text"] for r in rows if r["doc_id"] == 11)
    extra.append((20_011, t11 + " tail word"))
    extra_df = spark.createDataFrame(extra, "doc_id long, text string")
    return base.select("doc_id", "text").unionByName(extra_df)


def test_exact_dedup_keeps_min_id(spark, docs_with_dups):
    out = exact_dedup(docs_with_dups)
    # the planted exact dups lose to the original (smaller id)
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[10_003]["is_survivor"] is False
    assert r[10_003]["keep_key"] == 3
    assert r[10_007]["keep_key"] == 7
    assert r[3]["is_survivor"] is True
    # the near dup is NOT an exact dup
    assert r[20_011]["is_survivor"] is True
    n_drop = out.filter(~F.col("is_survivor")).count()
    assert n_drop == 2


def test_minhash_lsh_finds_planted_near_dup(spark, docs_with_dups):
    sig = shingle_minhash_signatures(docs_with_dups, n_hashes=8)
    cand = lsh_candidate_pairs(sig, n_hashes=8, bands=4)
    pairs = {(r["key_a"], r["key_b"]) for r in cand.collect()}
    assert (3, 10_003) in pairs          # exact dup: identical signature
    assert (11, 20_011) in pairs         # near dup: shares most shingles
    verified = verify_jaccard(docs_with_dups, cand, threshold=0.5)
    v = {(r["key_a"], r["key_b"]): r["jaccard"] for r in verified.collect()}
    assert v[(3, 10_003)] == 1.0
    assert 0.5 <= v[(11, 20_011)] < 1.0


def test_near_dedup_end_to_end(spark, docs_with_dups):
    out = near_dedup(docs_with_dups, threshold=0.5)
    r = {x["key"]: x for x in out.collect()}
    assert r[10_003]["cluster"] == 3 and r[10_003]["is_survivor"] is False
    assert r[20_011]["cluster"] == 11 and not r[20_011]["is_survivor"]
    assert r[3]["is_survivor"] and r[11]["is_survivor"]


def test_cluster_pairs_transitive(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "key_a long, key_b long")
    labels = {r["key"]: r["cluster"]
              for r in cluster_pairs(pairs, n_rounds=4).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cluster_pairs_long_chain_converges_logarithmically(spark):
    """Pointer jumping: a 21-node path needs O(log d) rounds, not 21."""
    chain = [(i, i + 1) for i in range(20)]
    pairs = spark.createDataFrame(chain, "key_a long, key_b long")
    labels = {r["key"]: r["cluster"]
              for r in cluster_pairs(pairs, n_rounds=5).collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == 21


def test_cluster_pairs_fixpoint_default_converges_any_diameter(spark):
    """n_rounds=None iterates to the fixpoint: a 65-node chain (diameter 64
    > 2^5) fully merges without an explicit round count, and the early exit
    stops well before the 50-round runaway cap."""
    chain = [(i, i + 1) for i in range(64)]
    pairs = spark.createDataFrame(chain, "key_a long, key_b long")
    labels = {r["key"]: r["cluster"] for r in cluster_pairs(pairs).collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == 65


def test_cluster_pairs_reliable_checkpoint_dir(spark, tmp_path_factory):
    """checkpoint_dir switches rounds to reliable .checkpoint() — results
    identical and checkpoint files land in the given directory."""
    import glob
    ckpt = str(tmp_path_factory.mktemp("cc_ckpt"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "key_a long, key_b long")
    labels = {r["key"]: r["cluster"]
              for r in cluster_pairs(pairs, checkpoint_dir=ckpt).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    assert glob.glob(f"{ckpt}/**/rdd-*", recursive=True)


def test_lsh_band_misconfig_raises(spark, docs_with_dups):
    import pytest as _pytest
    sig = shingle_minhash_signatures(docs_with_dups, n_hashes=8)
    with _pytest.raises(ValueError, match="multiple of bands"):
        lsh_candidate_pairs(sig, n_hashes=8, bands=16)


def test_exact_dedup_null_and_whitespace(spark):
    docs = spark.createDataFrame(
        [(1, "hello  world"), (2, "  hello world \n"), (3, None),
         (4, None), (5, "different")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert len(out) == 5                      # no rows silently dropped
    assert out[2]["keep_key"] == 1            # whitespace-insensitive
    assert out[4]["keep_key"] == 3            # NULL texts group together
    assert out[5]["is_survivor"] is True


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def probe(embeddings):
    row = embeddings.filter(F.col("vec_id") == 5).collect()[0]
    return [float(x) for x in row["embedding"]]


@pytest.fixture(scope="module")
def ivf_idx(spark, embeddings):
    return IVFIndex.build(embeddings, n_lists=8, n_iters=2)


def test_ivf_full_probe_is_exact(spark, embeddings, probe, ivf_idx):
    idx = ivf_idx
    exact = brute_force_top_k(embeddings, probe, k=10).collect()
    approx = idx.search(probe, k=10, n_probe=8).collect()
    assert [r["vec_id"] for r in approx] == [r["vec_id"] for r in exact]


def test_ivf_partial_probe_recall(spark, embeddings, probe, ivf_idx):
    idx = ivf_idx
    rec = idx.recall_at_k(embeddings, probe, k=10, n_probe=4)
    assert rec >= 0.5, rec  # random 64-d vectors: half the lists ≥ half hits
    # probing more lists can't lower recall
    rec_all = idx.recall_at_k(embeddings, probe, k=10, n_probe=8)
    assert rec_all == 1.0


def test_ivf_deterministic(spark, embeddings):
    a = IVFIndex.build(embeddings, n_lists=4, n_iters=1, seed=7)
    b = IVFIndex.build(embeddings, n_lists=4, n_iters=1, seed=7)
    assert np.array_equal(a.centroids, b.centroids)
    pa = [(r["vec_id"], r["list_id"]) for r in
          a.assignments.select("vec_id", "list_id").orderBy("vec_id")
          .collect()]
    pb = [(r["vec_id"], r["list_id"]) for r in
          b.assignments.select("vec_id", "list_id").orderBy("vec_id")
          .collect()]
    assert pa == pb


def test_ivf_numpy_assignment_path_matches_expressions(spark, embeddings):
    """The Arrow/numpy assignment (large-index path) must agree with the
    column-expression path exactly."""
    import semantic_search_engine_spark.operators.ann as ann_mod
    orig = ann_mod._EXPR_ASSIGN_MAX_COMPONENTS
    try:
        ann_mod._EXPR_ASSIGN_MAX_COMPONENTS = 1  # force numpy path
        a = ann_mod.IVFIndex.build(embeddings, n_lists=4, n_iters=1, seed=3)
    finally:
        ann_mod._EXPR_ASSIGN_MAX_COMPONENTS = orig
    b = ann_mod.IVFIndex.build(embeddings, n_lists=4, n_iters=1, seed=3)
    pa = sorted((r["vec_id"], r["list_id"]) for r in
                a.assignments.select("vec_id", "list_id").collect())
    pb = sorted((r["vec_id"], r["list_id"]) for r in
                b.assignments.select("vec_id", "list_id").collect())
    assert pa == pb


def test_ivf_near_dup_pairs(spark, embeddings, ivf_idx):
    """Planted near-identical vectors must surface as within-list pairs."""
    from pyspark.sql import functions as F
    base = embeddings.limit(0)
    rows = embeddings.filter(F.col("vec_id").isin([1, 2])).collect()
    dups = [(9001 + i, [x * 1.0001 for x in r["embedding"]], r["label"])
            for i, r in enumerate(rows)]
    aug = embeddings.unionByName(
        spark.createDataFrame(dups, embeddings.schema))
    from semantic_search_engine_spark.operators.ann import IVFIndex
    idx = IVFIndex.build(aug, n_lists=8, n_iters=2)
    pairs = {(r["vec_id_a"], r["vec_id_b"]): r["cosine"]
             for r in idx.near_dup_pairs(threshold=0.999).collect()}
    assert (1, 9001) in pairs and (2, 9002) in pairs
    assert all(c > 0.999 for c in pairs.values())


def test_multi_seed_union_recovers_boundary_split_pair(spark):
    """Second-seed IVF union (VERDICT r1 #5): a planted near-dup pair that
    one clustering splits across a list boundary is recovered by unioning a
    second seed's pair set. Seeds found empirically for this fixture: seed
    4 splits the pair, seed 5 co-locates it."""
    import math
    rows = [(i, [math.cos(2 * math.pi * i / 24),
                 math.sin(2 * math.pi * i / 24)]) for i in range(24)]
    theta = 2 * math.pi * 3.5 / 24
    rows += [(100, [math.cos(theta - 0.05), math.sin(theta - 0.05)]),
             (101, [math.cos(theta + 0.05), math.sin(theta + 0.05)])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    single = IVFIndex.build(emb, n_lists=6, n_iters=2, seed=4)
    missed = {(r["vec_id_a"], r["vec_id_b"])
              for r in single.near_dup_pairs(0.99).collect()}
    assert (100, 101) not in missed  # the single-seed boundary miss

    unioned = multi_seed_near_dup_pairs(emb, threshold=0.99, n_lists=6,
                                        n_iters=2, seeds=(4, 5))
    got = {(r["vec_id_a"], r["vec_id_b"]): r["cosine"]
           for r in unioned.collect()}
    assert (100, 101) in got
    assert got[(100, 101)] == pytest.approx(math.cos(0.1), abs=1e-9)


def test_ivf_save_load_roundtrip(spark, embeddings, tmp_path_factory):
    """A persisted IVF index answers identically after reload (search,
    near-dup pairs), with assignments partitioned by list_id on disk."""
    import glob
    from semantic_search_engine_spark.operators.ann import load_ivf, save_ivf
    from semantic_search_engine_spark.sources.store import HadoopTableStore

    store = HadoopTableStore(spark, str(tmp_path_factory.mktemp("ann_wh")))
    idx = IVFIndex.build(embeddings, n_lists=8, n_iters=2, seed=7)
    save_ivf(idx, store, "emb")
    loaded = load_ivf(store, "emb")

    assert np.array_equal(idx.centroids, loaded.centroids)
    probe = [float(x) for x in
             embeddings.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    a = [(r["vec_id"], round(r["cosine"], 9))
         for r in idx.search(probe, k=10, n_probe=4).collect()]
    b = [(r["vec_id"], round(r["cosine"], 9))
         for r in loaded.search(probe, k=10, n_probe=4).collect()]
    assert a == b
    pa = sorted((r["vec_id_a"], r["vec_id_b"])
                for r in idx.near_dup_pairs(0.8).collect())
    pb = sorted((r["vec_id_a"], r["vec_id_b"])
                for r in loaded.near_dup_pairs(0.8).collect())
    assert pa == pb
    # physical layout: one directory per list_id partition
    parts = glob.glob(f"{store.root}/ann_emb_assignments/snap-*/list_id=*")
    assert len(parts) == 8
