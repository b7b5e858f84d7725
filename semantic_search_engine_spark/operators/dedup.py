"""Corpus deduplication operators — exact and MinHash-LSH near-dup.

Training-data-pipeline staples over the ``documents`` table, expressed
entirely in JVM-side ``pyspark.sql.functions`` (no Python UDFs — shingling
is ``transform`` over token arrays, hashing is ``md5``/``xxhash64``,
min-hash is a ``groupBy().agg(min(...))``). All decisions are
deterministic: survivors are the minimum doc_id of each duplicate cluster.

Scale notes:
* exact dedup is one hash-shuffle on a 16-byte fingerprint;
* LSH banding turns the O(n²) near-dup search into per-band bucket joins —
  candidate volume is Σ bucket² per band, controlled by n_hashes/bands;
* clustering combines one-hop min-label propagation with pointer jumping
  (label-of-label), so components of diameter d converge in O(log d)
  rounds; every round materializes with truncated lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textproc import TOKEN_PATTERN_SQL

_TOKENS = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN_SQL}', 0)"


def _shingle_expr(shingle_size: int):
    """w-shingles of the tokenized text column — the ONE definition shared
    by signature generation and exact verification (they must shingle
    identically or Jaccard is measured over different sets)."""
    toks = F.expr(_TOKENS)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_size,
                                        F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1)
                   for j in range(shingle_size)]))


def text_fingerprint(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """(key, fingerprint): md5 of trimmed, whitespace-collapsed lowercase
    text. NULL text maps to a sentinel (all no-content docs are mutual
    duplicates, and no row is silently dropped by a NULL join key)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    fp = F.md5(F.coalesce(norm, F.lit("\x00<null-text>")).cast("binary"))
    return docs.select(key, fp.alias("fingerprint"))


def exact_dedup(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Keep the minimum-key row of every identical-text group.

    Returns (key, fingerprint, keep_key, is_survivor) for every input row —
    callers filter ``is_survivor`` or join back for the drop list.
    """
    fp = text_fingerprint(docs, key)
    keep = fp.groupBy("fingerprint").agg(F.min(key).alias("keep_key"))
    return (fp.join(keep, "fingerprint")
            .withColumn("is_survivor", F.col(key) == F.col("keep_key")))


def shingle_minhash_signatures(docs: DataFrame, key: str = "doc_id",
                               shingle_size: int = 3,
                               n_hashes: int = 8) -> DataFrame:
    """(key, mh_0..mh_{n-1}): MinHash over w-shingles, JVM-only.

    Each hash function is ``xxhash64(shingle || salt_i)``; min over the
    doc's shingle set approximates a uniform permutation minimum.
    """
    toks = F.expr(_TOKENS)
    exploded = (docs
                .filter(F.size(toks) >= shingle_size)
                .select(key, F.explode(_shingle_expr(shingle_size))
                        .alias("sh")))
    aggs = [F.min(F.xxhash64(F.concat(F.col("sh"), F.lit(f":{i}"))))
            .alias(f"mh_{i}") for i in range(n_hashes)]
    return exploded.groupBy(key).agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, key: str = "doc_id",
                        n_hashes: int = 8, bands: int = 4) -> DataFrame:
    """Distinct candidate pairs (key_a < key_b) sharing any LSH band.

    Bands are contiguous slices of the signature; a band's bucket id is the
    md5 of its concatenated minhashes. Each band contributes one
    self-equi-join on (band_id, bucket) — Catalyst plans a hash join per
    band; candidate volume is bounded by bucket sizes, not n².
    """
    if bands < 1 or n_hashes % bands != 0:
        # bands > n_hashes would give every doc the md5("") bucket → a full
        # O(n²) candidate explosion; non-divisible splits silently waste
        # trailing hashes. Fail loudly instead.
        raise ValueError(
            f"n_hashes ({n_hashes}) must be a positive multiple of bands "
            f"({bands})")
    rows_per_band = n_hashes // bands
    band_cols = []
    for bi in range(bands):
        cols = [F.col(f"mh_{bi * rows_per_band + j}").cast("string")
                for j in range(rows_per_band)]
        band_cols.append(F.struct(
            F.lit(bi).alias("band_id"),
            F.md5(F.concat_ws("|", *cols).cast("binary")).alias("bucket")))
    banded = (signatures
              .select(key, F.explode(F.array(*band_cols)).alias("b"))
              .select(key, F.col("b.band_id").alias("band_id"),
                      F.col("b.bucket").alias("bucket")))
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col(f"a.{key}") < F.col(f"b.{key}")))
            .select(F.col(f"a.{key}").alias("key_a"),
                    F.col(f"b.{key}").alias("key_b"))
            .distinct())


def verify_jaccard(docs: DataFrame, pairs: DataFrame, key: str = "doc_id",
                   shingle_size: int = 3,
                   threshold: float = 0.7) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps pairs >= t.

    The shingle explode joins only against candidate keys (semi-join
    pushdown), so verification cost is proportional to candidate volume.
    """
    keys = (pairs.select(F.col("key_a").alias(key))
            .union(pairs.select("key_b")).distinct())
    sh = (docs.join(keys, key, "left_semi")
          .select(key, F.explode(
              F.array_distinct(_shingle_expr(shingle_size))).alias("sh")))
    sizes = sh.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    # shared-shingle counts via a pair-scoped join on the shingle value
    sh_a = sh.select(F.col(key).alias("key_a"), "sh")
    sh_b = sh.select(F.col(key).alias("key_b"), "sh")
    inter = (pairs.join(sh_a, "key_a").join(sh_b, ["key_b", "sh"])
             .groupBy("key_a", "key_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    na = sizes.select(F.col(key).alias("key_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(key).alias("key_b"), F.col("n").alias("n_b"))
    return (pairs.join(inter, ["key_a", "key_b"], "left")
            .na.fill({"n_inter": 0})
            .join(na, "key_a").join(nb, "key_b")
            .withColumn("jaccard",
                        F.col("n_inter")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("key_a", "key_b", "jaccard"))


def cluster_pairs(pairs: DataFrame, n_rounds: int | None = None,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """Connected components: min-label propagation + pointer jumping.

    Each round first takes the min label over one edge hop, then jumps
    pointers (label := label of current label), so label distances halve —
    a component of diameter d converges in O(log d) rounds. Every round is
    materialized with TRUNCATED LINEAGE (otherwise round r re-executes the
    whole upstream candidate/verify plan r times).

    ``n_rounds=None`` (default) iterates to the FIXPOINT: the loop stops
    the first round that changes no label, so any diameter converges and
    no round runs past convergence. An explicit ``n_rounds`` caps the
    rounds (components wider than 2^n_rounds hops may stay split).

    ``checkpoint_dir``: when given, rounds are materialized with reliable
    ``.checkpoint()`` into that directory (survives executor loss — the
    cluster form); otherwise ``localCheckpoint`` (executor-local blocks,
    the single-process form). The session's checkpoint dir is restored
    after the loop (it is session-global state; without the restore the
    setting would bleed into unrelated jobs). Checkpoint FILES are not
    auto-deleted: enable ``spark.cleaner.referenceTracking.cleanCheckpoints``
    or purge ``checkpoint_dir`` after the returned frame is consumed.

    Returns (key, cluster) with cluster = the component's minimum key.
    """
    prev_ckpt_dir = None
    if checkpoint_dir is not None:
        sc = pairs.sparkSession.sparkContext
        prev_ckpt_dir = sc.getCheckpointDir()
        sc.setCheckpointDir(checkpoint_dir)

        def _materialize(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _materialize(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    # 50 halving rounds cover diameter 2^50 — a pure runaway guard
    max_rounds = 50 if n_rounds is None else n_rounds
    try:
        return _cluster_rounds(pairs, max_rounds, _materialize)
    finally:
        # the returned rounds are already materialized on disk, so putting
        # the session-global checkpoint dir back is safe here
        if checkpoint_dir is not None and prev_ckpt_dir is not None:
            pairs.sparkSession.sparkContext.setCheckpointDir(prev_ckpt_dir)


def _cluster_rounds(pairs: DataFrame, max_rounds: int,
                    _materialize) -> DataFrame:
    edges = _materialize(
        pairs.select(F.col("key_a").alias("u"), F.col("key_b").alias("v"))
        .union(pairs.select("key_b", "key_a")))
    labels = _materialize(
        edges.select(F.col("u").alias("key"))
        .distinct()
        .withColumn("cluster", F.col("key")))
    for _ in range(max_rounds):
        prev = labels.withColumn("prev", F.col("cluster"))
        # hop: min label among neighbors
        neighbor_min = (edges
                        .join(prev.withColumnRenamed("key", "v")
                              .select("v", "cluster"), "v")
                        .groupBy("u")
                        .agg(F.min("cluster").alias("nmin")))
        hopped = (prev
                  .join(neighbor_min.withColumnRenamed("u", "key"),
                        "key", "left")
                  .withColumn("cluster",
                              F.least("cluster",
                                      F.coalesce("nmin", "cluster")))
                  .drop("nmin"))
        # jump: follow the label's own label (path halving)
        parent = hopped.select(F.col("key").alias("cluster"),
                               F.col("cluster").alias("grand"))
        stepped = _materialize(
            hopped.join(parent, "cluster", "left")
            .withColumn("cluster",
                        F.least("cluster", F.coalesce("grand", "cluster")))
            .drop("grand"))
        labels = stepped.drop("prev")
        # fixpoint early-exit: one filter over the just-materialized round
        # (labels only ever decrease, so "changed" == "decreased")
        if stepped.filter(F.col("cluster") < F.col("prev")).isEmpty():
            break
    return labels


def build_drop_ledger(feats: DataFrame, mode: str,
                      shingle_size: int = 3, n_hashes: int = 8,
                      bands: int = 4, threshold: float = 0.7) -> DataFrame:
    """Content-duplicate drop ledger over an extracted-features frame —
    the decision record a training-data pipeline keeps for provenance.

    ``feats`` must carry (doc_id, url, partition_id, extracted_sha256,
    text); rows are one per unique url (recrawl resolution already done).
    Returns one row per DROPPED document:

        (doc_id, url, partition_id, keep_doc_id, keep_url, reason)

    with reason ∈ {'exact', 'near'} and keep_* naming the surviving
    cluster representative (minimum doc_id — deterministic and
    parallelism-independent). Exact drops whose keeper was itself
    near-dropped are rewritten to the final survivor, so ``keep_doc_id``
    always names a document that remains in the index (no chains).

    Scale shape: the exact pass is one groupBy on the 32-byte sha —
    already computed by the extract UDF, so no text is re-read; the near
    pass runs only over exact survivors (minhash signatures → banded LSH
    bucket joins → exact-Jaccard verify on candidates → fixpoint
    clustering — never all-pairs). Ledger volume is the duplicate count,
    typically 10–40% of a web crawl.
    """
    if mode not in ("exact", "near"):
        raise ValueError(f"dedup mode must be 'exact' or 'near', got {mode!r}")
    slim = feats.select("doc_id", "url", "partition_id",
                        F.coalesce(F.col("extracted_sha256"),
                                   F.lit("<null-sha>")).alias("sha"))
    keep = slim.groupBy("sha").agg(F.min("doc_id").alias("keep_doc_id"))
    exact_drops = (slim.join(keep, "sha")
                   .filter(F.col("doc_id") != F.col("keep_doc_id"))
                   .select("doc_id", "url", "partition_id", "keep_doc_id",
                           F.lit("exact").alias("reason")))
    if mode == "exact":
        drops = exact_drops
    else:
        survivors = feats.join(
            exact_drops.select("doc_id"), "doc_id", "left_anti")
        clustered = near_dedup(survivors, key="doc_id",
                               shingle_size=shingle_size,
                               n_hashes=n_hashes, bands=bands,
                               threshold=threshold)
        near_drops = (clustered.filter(~F.col("is_survivor"))
                      .select(F.col("key").alias("doc_id"),
                              F.col("cluster").alias("keep_doc_id")))
        near_drops = (survivors.select("doc_id", "url", "partition_id")
                      .join(near_drops, "doc_id")
                      .select("doc_id", "url", "partition_id",
                              "keep_doc_id", F.lit("near").alias("reason")))
        # resolve exact→near keeper chains to the final survivor
        remap = near_drops.select(
            F.col("doc_id").alias("keep_doc_id"),
            F.col("keep_doc_id").alias("final_keep"))
        exact_drops = (exact_drops.join(remap, "keep_doc_id", "left")
                       .withColumn("keep_doc_id",
                                   F.coalesce("final_keep", "keep_doc_id"))
                       .select("doc_id", "url", "partition_id",
                               "keep_doc_id", "reason"))
        drops = exact_drops.unionByName(near_drops)
    keep_urls = feats.select(F.col("doc_id").alias("keep_doc_id"),
                             F.col("url").alias("keep_url"))
    return drops.join(keep_urls, "keep_doc_id").select(
        "doc_id", "url", "partition_id", "keep_doc_id", "keep_url",
        "reason")


def near_dedup(docs: DataFrame, key: str = "doc_id",
               shingle_size: int = 3, n_hashes: int = 8, bands: int = 4,
               threshold: float = 0.7, n_rounds: int | None = None,
               checkpoint_dir: str | None = None) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands → candidate
    pairs → exact-Jaccard verify → cluster → survivor = min key.

    Returns (key, cluster, is_survivor) for every clustered document;
    documents with no near-duplicate don't appear (they all survive).
    """
    sig = shingle_minhash_signatures(docs, key, shingle_size, n_hashes)
    cand = lsh_candidate_pairs(sig, key, n_hashes, bands)
    verified = verify_jaccard(docs, cand, key, shingle_size, threshold)
    clusters = cluster_pairs(verified, n_rounds, checkpoint_dir)
    return clusters.withColumn("is_survivor",
                               F.col("key") == F.col("cluster"))
