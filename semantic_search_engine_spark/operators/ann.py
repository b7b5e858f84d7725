"""Approximate nearest-neighbor search over an embedding column.

Two tiers (the task's similarity-search ladder):

* :func:`brute_force_top_k` — exact cosine top-k via JVM array expressions
  (``zip_with`` + ``aggregate``); the correctness baseline, O(n) per query.
* :class:`IVFIndex` — inverted-file ANN, *spherical* k-means: vectors are
  L2-normalized up front, so Euclidean clustering/probing orders exactly
  like cosine (|a−b|² = 2−2·cos on the unit sphere) and the reported score
  is the true cosine of the original vectors. Centroids are deterministic
  (seeded init, fixed Lloyd iterations); queries probe only the
  ``n_probe`` nearest lists. ``n_probe = n_lists`` degrades to exact
  search (tested).

Scale: assignment uses whole-stage-codegen column expressions while
``n_lists × dim`` stays small, and switches to an Arrow-batched numpy
``argmin`` (centroids shipped once per worker in the closure) beyond that —
a 1024-list × 768-dim index would otherwise put ~800k literal nodes into
one Catalyst projection. Final assignments are repartitioned by list id so
a query's probed-list scan is partition-pruned.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: above this many centroid components, assignment switches from column
#: expressions to the Arrow/numpy path. The expression plan carries one
#: aggregate-fold struct PER CENTROID — past a few hundred components the
#: Catalyst compile time alone dwarfs the Arrow batch transfer it avoids
#: (measured: 44 lists × 64 dims took seconds per assign to compile; the
#: numpy matmul path assigns the same table in milliseconds), so the
#: threshold sits where codegen stays small. Both paths are pinned equal
#: (test_operators.py).
_EXPR_ASSIGN_MAX_COMPONENTS = 512


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(vec_col: str, probe: list[float]):
    """Cosine(vec_col, literal probe) as a pure JVM column expression.

    The probe's norm is a Python-side constant — only the row vector's dot
    and norm are computed per row."""
    p = F.array(*[F.lit(float(x)) for x in probe])
    pnorm = math.sqrt(sum(float(x) * float(x) for x in probe)) or 1.0
    return _dot(F.col(vec_col), p) / (_norm(F.col(vec_col)) * F.lit(pnorm))


def brute_force_top_k(embeddings: DataFrame, probe: list[float], k: int = 10,
                      key: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (key, cosine), ties broken by key ascending."""
    e = embeddings.select(key, F.col(vec_col).cast("array<double>")
                          .alias("v"))
    return (e.select(key, cosine_col("v", probe).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(key)).limit(k))


def _unit(v: np.ndarray) -> np.ndarray:
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


class IVFIndex:
    """Spherical inverted-file ANN index. Deterministic: seeded centroid
    init (the ``n_lists`` rows with smallest ``xxhash64(key, seed)``),
    fixed Lloyd iteration count, ties broken by list id / key."""

    def __init__(self, centroids: np.ndarray, assignments: DataFrame,
                 key: str, vec_col: str):
        self.centroids = centroids            # (n_lists, dim), unit rows
        self.assignments = assignments        # (key, v, vn, list_id)
        self.key = key
        self.vec_col = vec_col

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, embeddings: DataFrame, n_lists: int = 16,
              n_iters: int = 3, seed: int = 42, key: str = "vec_id",
              vec_col: str = "embedding") -> "IVFIndex":
        vnorm = _norm(F.col("v"))
        e = (embeddings
             .select(key, F.col(vec_col).cast("array<double>").alias("v"))
             .withColumn(
                 "vn",
                 F.when(vnorm > 0,
                        F.transform("v", lambda x: x / vnorm))
                 .otherwise(F.col("v")))
             .cache())
        # deterministic init: smallest seeded hash of the key
        init = (e.withColumn("h", F.xxhash64(F.col(key), F.lit(seed)))
                .orderBy("h", key).limit(n_lists).select("vn").collect())
        centroids = np.array([_unit(np.array(r["vn"], dtype=np.float64))
                              for r in init])

        for _ in range(n_iters):
            assigned = cls._assign(e, centroids)
            rows = (assigned.groupBy("list_id")
                    .agg(*[F.avg(F.element_at("vn", i + 1)).alias(f"c{i}")
                           for i in range(centroids.shape[1])])
                    .collect())
            nxt = centroids.copy()  # empty lists keep their old centroid
            for r in rows:
                mean = np.array([r[f"c{i}"]
                                 for i in range(centroids.shape[1])])
                nxt[int(r["list_id"])] = _unit(mean)  # spherical k-means
            centroids = nxt

        assignments = (cls._assign(e, centroids)
                       .repartition(max(n_lists, 1), "list_id")
                       .localCheckpoint(eager=True))
        e.unpersist()
        return cls(centroids, assignments, key, vec_col)

    # ------------------------------------------------------------------
    @staticmethod
    def _assign(e: DataFrame, centroids: np.ndarray) -> DataFrame:
        """argmin_j |vn − c_j|² over unit vectors ≡ argmax cosine.

        Small indexes: column expressions (−2·vn·c_j + |c_j|²; |vn|² is
        constant), whole-stage codegen. Large indexes: Arrow-batched numpy
        argmin with the centroid matrix shipped once per worker.
        """
        if centroids.size <= _EXPR_ASSIGN_MAX_COMPONENTS:
            scores = []
            for j, c in enumerate(centroids):
                cl = F.array(*[F.lit(float(x)) for x in c])
                d = -2.0 * _dot(F.col("vn"), cl) + float(np.dot(c, c))
                scores.append(F.struct(d.alias("d"),
                                       F.lit(j).cast("int").alias("j")))
            best = F.array_min(F.array(*scores))
            return e.withColumn("list_id", best["j"])

        from pyspark.sql.types import IntegerType, StructField, StructType

        cmat = centroids.astype(np.float64)
        # fresh StructType: StructType.add would MUTATE e's schema in place
        schema = StructType(list(e.schema.fields)
                            + [StructField("list_id", IntegerType())])

        def assign_batches(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vn = np.array(pdf["vn"].tolist(), dtype=np.float64)
                sims = vn @ cmat.T                      # (rows, n_lists)
                pdf = pdf.assign(list_id=np.argmax(sims, axis=1)
                                 .astype(np.int32))
                yield pdf

        return e.mapInPandas(assign_batches, schema=schema)

    # ------------------------------------------------------------------
    def search(self, probe: list[float], k: int = 10,
               n_probe: int = 4,
               allowed: "DataFrame | None" = None) -> DataFrame:
        """Top-k within the n_probe nearest lists: (key, cosine).

        ``allowed``: optional PRE-filter — a frame whose ``self.key``
        column names the eligible rows (a metadata predicate resolved
        upstream, e.g. ``doc_meta.filter(lang='en').select('doc_id')``).
        Pre-filtering (semi-join BEFORE ranking, the Qdrant/Weaviate
        semantics) returns the exact top-k OF THE FILTERED SET within
        the probed lists — unlike post-filtering, no result slot is
        wasted on ineligible rows. The stated trade is unchanged from
        unfiltered IVF and sharpens with selectivity: a very selective
        filter empties the nearest lists, so scale ``n_probe`` with
        selectivity (``n_probe=n_lists`` ⇒ exact filtered brute force,
        pinned by test)."""
        if n_probe < 1:
            # ADVICE r4: 0 probed lists would yield silently empty
            # results — refuse rather than "no matches"
            raise ValueError(f"n_probe must be >= 1, got {n_probe}")
        p = _unit(np.asarray(probe, dtype=np.float64))
        d2 = ((self.centroids - p) ** 2).sum(axis=1)
        probe_lists = [int(j) for j in np.argsort(d2, kind="stable")
                       [:n_probe]]
        cand = self.assignments.filter(F.col("list_id").isin(probe_lists))
        if allowed is not None:
            cand = cand.join(
                allowed.select(self.key).distinct(), self.key, "semi")
        return (cand.select(self.key, cosine_col("v", probe).alias("cosine"))
                .orderBy(F.desc("cosine"), F.asc(self.key)).limit(k))

    def near_dup_pairs(self, threshold: float = 0.9) -> DataFrame:
        """Embedding-cosine near-dup candidates at scale: pairs are only
        compared WITHIN an IVF list (the ANN analogue of LSH banding), so
        cost is Σ |list|² instead of n². Near-duplicates have cosine ≈ 1
        and land in the same spherical cluster with high probability;
        recall can be raised by unioning independently-seeded indexes —
        :func:`multi_seed_near_dup_pairs` is that form.

        Returns (key_a, key_b, cosine) with key_a < key_b, cosine >= t.
        """
        ka, kb = f"{self.key}_a", f"{self.key}_b"
        a = self.assignments.select(
            F.col(self.key).alias(ka), F.col("vn").alias("vna"), "list_id")
        b = self.assignments.select(
            F.col(self.key).alias(kb), F.col("vn").alias("vnb"), "list_id")
        cos = F.aggregate(F.zip_with("vna", "vnb", lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        return (a.join(b, ["list_id"])
                .filter(F.col(ka) < F.col(kb))
                .select(ka, kb, cos.alias("cosine"))
                .filter(F.col("cosine") >= threshold))

    # ------------------------------------------------------------------
    # incremental maintenance (frozen coarse quantizer — the
    # FAISS/Milvus lifecycle: lists grow/shrink under fixed centroids,
    # retrain when drift says so)
    # ------------------------------------------------------------------
    def upsert(self, embeddings: DataFrame) -> "IVFIndex":
        """New index with ``embeddings`` added or replaced (matched by
        key). Centroids are FROZEN — only the incoming batch is
        assigned (O(|batch|·n_lists), never the existing table), so
        ingest cost is independent of index size; re-upserted keys may
        move lists (assignment follows the new vector). Search results
        afterwards are identical to assigning the merged vector set
        under the same centroids.

        A batch carrying the same key twice is REFUSED (Iceberg MERGE
        semantics: 'multiple rows match') — silently keeping both would
        duplicate the key in the index, and picking one would be
        order-dependent."""
        _require_unique_keys(embeddings, self.key, "IVFIndex.upsert")
        vnorm = _norm(F.col("v"))
        e = (embeddings
             .select(self.key,
                     F.col(self.vec_col).cast("array<double>").alias("v"))
             .withColumn(
                 "vn",
                 F.when(vnorm > 0,
                        F.transform("v", lambda x: x / vnorm))
                 .otherwise(F.col("v"))))
        fresh = self._assign(e, self.centroids)
        kept = self.assignments.join(
            e.select(self.key), self.key, "left_anti")
        merged = (kept.unionByName(fresh)
                  .repartition(max(self.centroids.shape[0], 1),
                               "list_id")
                  .localCheckpoint(eager=True))
        return IVFIndex(self.centroids, merged, self.key, self.vec_col)

    def remove(self, keys: "DataFrame | list") -> "IVFIndex":
        """New index without the given keys (a DataFrame carrying
        ``self.key``, or a plain list of key values)."""
        if not isinstance(keys, DataFrame):
            spark = self.assignments.sparkSession
            kt = self.assignments.schema[self.key].dataType.simpleString()
            keys = spark.createDataFrame(
                [(k,) for k in keys], f"{self.key} {kt}")
        kept = (self.assignments
                .join(keys.select(self.key), self.key, "left_anti")
                .localCheckpoint(eager=True))
        return IVFIndex(self.centroids, kept, self.key, self.vec_col)

    def list_stats(self) -> DataFrame:
        """Per-list row counts — the drift signal for the frozen
        quantizer: (list_id, n)."""
        return self.assignments.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n"))

    def skew_ratio(self) -> float:
        """max(list size) / mean(list size) over non-empty lists. After
        many frozen-centroid upserts this is the retrain tripwire
        (probe cost is driven by the largest probed lists); ~1 is
        balanced, >`~4` means the data drifted away from the trained
        centroids and a fresh :meth:`build` is due."""
        rows = self.list_stats().collect()
        if not rows:
            return 1.0
        ns = [r["n"] for r in rows]
        return float(max(ns) / (sum(ns) / len(ns)))

    def recall_at_k(self, embeddings: DataFrame, probe: list[float],
                    k: int = 10, n_probe: int = 4) -> float:
        exact = {r[self.key] for r in brute_force_top_k(
            embeddings, probe, k, self.key, self.vec_col).collect()}
        approx = {r[self.key] for r in self.search(probe, k,
                                                   n_probe).collect()}
        return len(exact & approx) / max(len(exact), 1)


def multi_seed_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                              n_lists: int = 16, n_iters: int = 3,
                              seeds: tuple[int, ...] = (42, 1337),
                              key: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Recall lever for IVF-bucketed near-dup detection: union the
    within-list pair sets of independently-seeded indexes.

    A single spherical clustering can put a true near-dup pair on opposite
    sides of a list boundary (the IVF analogue of an LSH band miss); a
    second clustering with a different seed draws different boundaries, so
    a pair missed by one is usually co-located by another — recall rises
    like 1 - Π(miss rate per seed) while cost stays Σ_seeds Σ |list|².

    Returns (key_a, key_b, cosine) deduplicated across seeds.
    """
    if not seeds:
        raise ValueError("multi_seed_near_dup_pairs needs >= 1 seed")
    ka, kb = f"{key}_a", f"{key}_b"
    out = None
    for s in seeds:
        idx = IVFIndex.build(embeddings, n_lists=n_lists, n_iters=n_iters,
                             seed=s, key=key, vec_col=vec_col)
        p = idx.near_dup_pairs(threshold)
        out = p if out is None else out.unionByName(p)
    # same pair found under two seeds carries the identical cosine (same
    # normalized vectors) — groupBy dedups without recomputation
    return out.groupBy(ka, kb).agg(F.max("cosine").alias("cosine"))


#: table-name templates for a persisted IVF index
_IVF_ASSIGN_TBL = "ann_{name}_assignments"
_IVF_CENTROID_TBL = "ann_{name}_centroids"


def save_ivf(index: IVFIndex, store, name: str,
             extra_meta: dict | None = None) -> None:
    """Persist an IVF index through the TableStore: assignments partitioned
    by list_id (query-time partition pruning survives the round trip) and
    the centroid matrix as one tiny table. Index metadata (key/vec_col)
    rides the assignments table's commit meta.

    This makes ANN a real index lifecycle like the text index — build
    once, serve from storage — instead of a per-session in-memory object.

    ``extra_meta``: caller bookkeeping merged into the assignments
    table's commit meta (e.g. ``IndexBuilder.build_ann`` records the
    source embeddings table's ``data_uuid`` so the serve path can detect
    a stale index after an embeddings rebuild).
    """
    import uuid as _uuid

    spark = index.assignments.sparkSession
    # one save identity written to BOTH tables: load_ivf cross-checks it,
    # so a torn re-save (assignments committed, centroids not — or vice
    # versa) is detected even when list counts happen to agree
    save_id = _uuid.uuid4().hex
    store.write(_IVF_ASSIGN_TBL.format(name=name),
                index.assignments.select(index.key, "v", "vn", "list_id"),
                partition_by=["list_id"],
                meta={**(extra_meta or {}),
                      "key": index.key, "vec_col": index.vec_col,
                      "n_lists": int(index.centroids.shape[0]),
                      "save_id": save_id})
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(index.centroids)],
        "list_id int, centroid array<double>")
    store.write(_IVF_CENTROID_TBL.format(name=name), cent,
                meta={"save_id": save_id})


def load_ivf(store, name: str) -> IVFIndex:
    """Inverse of :func:`save_ivf`; searches on the loaded index are
    identical to the original (assignments and centroids round-trip
    exactly; doubles are stored, not re-derived)."""
    meta = store.table_meta(_IVF_ASSIGN_TBL.format(name=name)) or {}
    key = meta.get("key", "vec_id")
    vec_col = meta.get("vec_col", "embedding")
    assignments = store.read(_IVF_ASSIGN_TBL.format(name=name))
    rows = store.read(_IVF_CENTROID_TBL.format(name=name)) \
        .orderBy("list_id").collect()
    if "n_lists" in meta and int(meta["n_lists"]) != len(rows):
        raise ValueError(
            f"torn IVF save '{name}': assignments meta says "
            f"{meta['n_lists']} lists, centroid table has {len(rows)}")
    cmeta = store.table_meta(_IVF_CENTROID_TBL.format(name=name)) or {}
    if meta.get("save_id") is None and cmeta.get("save_id") is None:
        # legacy save (before save_ids existed): the torn-save cross-check
        # cannot run, and agreeing list counts alone don't prove the two
        # tables came from the same save — surface that instead of
        # passing the check silently (ADVICE r2)
        import warnings
        warnings.warn(
            f"IVF index '{name}' predates save ids — torn-save detection "
            f"is unavailable; re-save with save_ivf() to get verified "
            f"loads", stacklevel=2)
    elif meta.get("save_id") != cmeta.get("save_id"):
        raise ValueError(
            f"torn IVF save '{name}': assignments and centroids carry "
            f"different save ids — a re-save crashed between the two "
            f"table commits")
    centroids = np.array([r["centroid"] for r in rows], dtype=np.float64)
    assignments = assignments.repartition(max(len(rows), 1), "list_id")
    return IVFIndex(centroids, assignments, key, vec_col)


def _require_unique_keys(df: DataFrame, key: str, op: str) -> None:
    """Refuse batches with duplicate keys — one aggregation over the
    BATCH (not the index)."""
    r = df.agg(F.count(key).alias("n"),
               F.countDistinct(key).alias("d")).collect()[0]
    if r["n"] != r["d"]:
        raise ValueError(
            f"{op}: batch carries {r['n'] - r['d']} duplicate "
            f"{key!r} rows — one vector per key per batch (dedup "
            f"upstream or split the batch)")


def upsert_ivf(store, name: str, embeddings: DataFrame) -> None:
    """Incrementally add/replace vectors in a PERSISTED IVF index
    without loading it: only the centroid table (n_lists rows) is read
    eagerly; the incoming batch is assigned under the frozen centroids
    and merged into the assignments table through the store's
    partition-pruned copy-on-write, so the commit rewrites only the
    touched ``list_id`` directories.

    Soundness note — ``list_id`` is NOT a function of the key (a
    re-upserted vector whose embedding changed can move lists), so a
    pruned merge keyed on the NEW lists alone could leave the old copy
    stale in an untouched directory. The OLD lists of keys that moved
    are resolved by one semi-join and passed to the store as
    ``extra_touched``: their directories join the rewrite set of the
    SAME single atomic commit, whose key anti-join drops the stale
    copies. Batches with duplicate keys are refused (see
    :meth:`IVFIndex.upsert`)."""
    meta = store.table_meta(_IVF_ASSIGN_TBL.format(name=name)) or {}
    key = meta.get("key", "vec_id")
    vec_col = meta.get("vec_col", "embedding")
    _require_unique_keys(embeddings, key, "upsert_ivf")
    crows = (store.read(_IVF_CENTROID_TBL.format(name=name))
             .orderBy("list_id").collect())
    centroids = np.array([r["centroid"] for r in crows], dtype=np.float64)

    vnorm = _norm(F.col("v"))
    e = (embeddings
         .select(key, F.col(vec_col).cast("array<double>").alias("v"))
         .withColumn(
             "vn",
             F.when(vnorm > 0, F.transform("v", lambda x: x / vnorm))
             .otherwise(F.col("v"))))
    fresh = (IVFIndex._assign(e, centroids)
             .select(key, "v", "vn", "list_id")
             .localCheckpoint(eager=True))  # assign ONCE, reuse below

    assign_tbl = _IVF_ASSIGN_TBL.format(name=name)
    current = store.read(assign_tbl)
    moved_from = (current.select(key, "list_id")
                  .join(fresh.select(key,
                                     F.col("list_id").alias("_new")),
                        key)
                  .filter(F.col("list_id") != F.col("_new"))
                  .select("list_id")
                  .localCheckpoint(eager=True))  # pin BEFORE the commit
    store.merge_by_key(assign_tbl, fresh, key, partition_by=["list_id"],
                       extra_touched=moved_from)


def remove_ivf(store, name: str, keys: DataFrame) -> None:
    """Delete vectors from a persisted IVF index. ``keys`` carries the
    index's key column; their ``list_id``s are resolved by one semi-join
    against the assignments table so the CoW delete prunes to the
    containing list directories only. Keys absent from the index are a
    NO-OP (no empty commit, no data_uuid churn for downstream caches).
    """
    meta = store.table_meta(_IVF_ASSIGN_TBL.format(name=name)) or {}
    key = meta.get("key", "vec_id")
    assign_tbl = _IVF_ASSIGN_TBL.format(name=name)
    located = (store.read(assign_tbl)
               .join(keys.select(key), key, "semi")
               .select(key, "list_id")
               .localCheckpoint(eager=True))
    if located.limit(1).count() == 0:
        return
    store.delete_by_key(assign_tbl, located, key,
                        partition_by=["list_id"])
