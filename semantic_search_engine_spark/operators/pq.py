"""Product quantization (PQ) for embedding compression at corpus scale.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — the standard way a 10^12-vector corpus becomes
searchable RAM: split each d-dim vector into M subvectors, k-means each
subspace to ``ksub ≤ 256`` centroids, and store each vector as M uint8
codes. 64 float64 components (512 B) compress to M = 8 bytes — 64× — and
query-time scoring never decompresses: asymmetric distance computation
(ADC) precomputes the probe's (M, ksub) distance table driver-side and
each candidate's approximate distance is M table lookups.

Spark shapes, all deterministic:

* **Training** is driver-side numpy over a seeded hash-ordered sample
  (≤ ``train_cap`` rows — at 10^12 vectors a 10^5-row sample trains the
  same codebook; collecting the corpus is neither needed nor allowed).
  K-means uses seeded init and a fixed iteration count; empty clusters
  keep their previous centroid (same convention as ``IVFIndex``).
* **Encoding** is one Arrow-batched ``mapInPandas`` pass — the (M, ksub,
  dsub) codebook ships once per worker, each batch is vectorized
  argmin, output is (key, ``binary`` code of length M). No shuffle: at
  10^12 docs this is a map-only column projection.
* **ADC search** precomputes the probe table driver-side, then one
  ``mapInPandas`` over codes emits (key, approx_dist); ``orderBy().
  limit(k)`` is a ``TakeOrderedAndProject`` (per-partition heap, driver
  merge). Composes with IVF: assignments partitioned by ``list_id``
  restrict the code scan to the probed lists.

Vectors are unit-normalized before training/encoding, so approximate
squared L2 orders identically to cosine DESC (``cos = 1 − d²/2`` on the
unit sphere) — rankings are comparable to ``brute_force_top_k`` and
``IVFIndex.search``, recall pinned in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PQ_CODES_TBL = "pq_codes_{name}"
_PQ_CODEBOOK_TBL = "pq_codebook_{name}"


def _unit_rows(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return v / n


def _kmeans(x: np.ndarray, ksub: int, n_iters: int, seed: int
            ) -> np.ndarray:
    """Seeded Lloyd iterations on one subspace sample. Deterministic:
    fixed init (seeded choice without replacement), fixed iteration
    count, empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    k = min(ksub, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(n_iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    if k < ksub:
        # tiny training sets: pad with repeats so codes stay valid uint8
        cents = np.vstack([cents, np.repeat(cents[:1],
                                            ksub - k, axis=0)])
    return cents


class PQCodebook:
    """(M, ksub, dsub) product-quantizer codebook over unit vectors."""

    def __init__(self, centroids: np.ndarray, key: str, vec_col: str):
        assert centroids.ndim == 3
        self.centroids = centroids.astype(np.float64)
        self.m, self.ksub, self.dsub = centroids.shape
        self.dim = self.m * self.dsub
        self.key = key
        self.vec_col = vec_col

    # ------------------------------------------------------------------
    @classmethod
    def train(cls, embeddings: DataFrame, m: int = 8, ksub: int = 256,
              n_iters: int = 8, seed: int = 42, train_cap: int = 20_000,
              key: str = "vec_id", vec_col: str = "embedding"
              ) -> "PQCodebook":
        """Train on a deterministic hash-ordered sample (≤ train_cap
        rows). ``m`` must divide the embedding dimension."""
        sample = (embeddings
                  .select(key,
                          F.col(vec_col).cast("array<double>").alias("v"))
                  .withColumn("h", F.xxhash64(F.col(key), F.lit(seed)))
                  .orderBy("h", key).limit(train_cap)
                  .select("v").collect())
        x = _unit_rows(np.array([r["v"] for r in sample],
                                dtype=np.float64))
        dim = x.shape[1]
        if dim % m:
            raise ValueError(f"m={m} must divide dim={dim}")
        dsub = dim // m
        cents = np.stack([
            _kmeans(x[:, i * dsub:(i + 1) * dsub], ksub, n_iters,
                    seed + i)
            for i in range(m)])
        return cls(cents, key, vec_col)

    # ------------------------------------------------------------------
    def encode(self, embeddings: DataFrame) -> DataFrame:
        """(key, code binary) — one map-only Arrow pass, no shuffle.
        Any extra partition/pruning columns present on the input (e.g.
        an IVF ``list_id``) are carried through untouched."""
        from pyspark.sql.types import (
            BinaryType,
            StructField,
            StructType,
        )

        key, vec_col = self.key, self.vec_col
        m, dsub = self.m, self.dsub
        cents = self.centroids  # ships once per worker via closure
        e = embeddings.select(
            key, F.col(vec_col).cast("array<double>").alias("_v"),
            *[c for c in embeddings.columns if c not in (key, vec_col)])
        out_schema = StructType(
            [f for f in e.schema.fields if f.name != "_v"]
            + [StructField("code", BinaryType())])

        def enc(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = _unit_rows(np.array(pdf["_v"].tolist(),
                                        dtype=np.float64))
                codes = np.empty((len(v), m), dtype=np.uint8)
                for i in range(m):
                    sub = v[:, i * dsub:(i + 1) * dsub]
                    # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² constant per row
                    d = (-2.0 * sub @ cents[i].T
                         + (cents[i] ** 2).sum(axis=1)[None, :])
                    codes[:, i] = np.argmin(d, axis=1).astype(np.uint8)
                out = pdf.drop(columns=["_v"])
                out["code"] = [c.tobytes() for c in codes]
                yield out

        return e.mapInPandas(enc, schema=out_schema)

    # ------------------------------------------------------------------
    def adc_top_k(self, codes: DataFrame, probe: list[float], k: int = 10
                  ) -> DataFrame:
        """Asymmetric distance top-k: (key, approx_dist ASC, approx_cos).

        The probe's (M, ksub) distance table is computed driver-side;
        the scan is M uint8 lookups per candidate — no decompression,
        no float vectors read."""
        p = np.asarray(probe, dtype=np.float64)
        n = np.linalg.norm(p)
        if n > 0:
            p = p / n
        m, dsub, ksub = self.m, self.dsub, self.ksub
        table = np.stack([
            (((p[i * dsub:(i + 1) * dsub][None, :] - self.centroids[i])
              ** 2).sum(axis=1))
            for i in range(m)])  # (m, ksub)
        key = self.key

        def score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                raw = np.frombuffer(
                    b"".join(pdf["code"]), dtype=np.uint8
                ).reshape(len(pdf), m)
                d2 = table[np.arange(m)[None, :], raw].sum(axis=1)
                yield pd.DataFrame({key: pdf[key],
                                    "approx_dist": d2})

        from pyspark.sql.types import DoubleType, StructField, StructType

        in_key = codes.select(key).schema.fields[0]
        scored = codes.select(key, "code").mapInPandas(
            score, schema=StructType(
                [in_key, StructField("approx_dist", DoubleType())]))
        return (scored
                .withColumn("approx_cos",
                            1.0 - F.col("approx_dist") / 2.0)
                .orderBy(F.asc("approx_dist"), F.asc(key)).limit(k))

    # ------------------------------------------------------------------
    def adc_rerank_top_k(self, codes: DataFrame, embeddings: DataFrame,
                         probe: list[float], k: int = 10,
                         shortlist_factor: int = 4) -> DataFrame:
        """ADC shortlist → exact rerank (Jégou '11 §V's IVFADC+R): the
        production recipe. ADC over the 8-byte codes picks a
        ``shortlist_factor·k`` candidate set without touching a float
        vector; only those ≤ factor·k rows are then read from the
        embeddings table and scored exactly. At 10^12 docs the exact
        phase reads 40 vectors, not the corpus — the recall lever costs
        O(k) extra I/O. Output: (key, cosine), same shape as
        ``brute_force_top_k``."""
        from .ann import brute_force_top_k

        short = [r[self.key] for r in
                 self.adc_top_k(codes, probe,
                                k=shortlist_factor * k).collect()]
        pruned = embeddings.filter(F.col(self.key).isin(short))
        return brute_force_top_k(pruned, probe, k, self.key, self.vec_col)

    # ------------------------------------------------------------------
    def recall_at_k(self, embeddings: DataFrame, codes: DataFrame,
                    probe: list[float], k: int = 10) -> float:
        from .ann import brute_force_top_k

        exact = {r[self.key] for r in brute_force_top_k(
            embeddings, probe, k, self.key, self.vec_col).collect()}
        approx = {r[self.key]
                  for r in self.adc_top_k(codes, probe, k).collect()}
        return len(exact & approx) / max(len(exact), 1)


# ---------------------------------------------------------------------------
def save_pq(book: PQCodebook, codes: DataFrame, store, name: str) -> None:
    """Persist codes + codebook through the TableStore with the same
    torn-save protection as ``save_ivf``: one save_id written to both
    commits, cross-checked on load."""
    import uuid as _uuid

    spark = codes.sparkSession
    save_id = _uuid.uuid4().hex
    store.write(_PQ_CODES_TBL.format(name=name), codes,
                meta={"key": book.key, "vec_col": book.vec_col,
                      "m": book.m, "ksub": book.ksub, "dsub": book.dsub,
                      "save_id": save_id})
    rows = [(i, j, [float(x) for x in book.centroids[i, j]])
            for i in range(book.m) for j in range(book.ksub)]
    cb = spark.createDataFrame(
        rows, "m int, j int, centroid array<double>")
    store.write(_PQ_CODEBOOK_TBL.format(name=name), cb,
                meta={"save_id": save_id})


def load_pq(store, name: str) -> tuple[PQCodebook, DataFrame]:
    meta = store.table_meta(_PQ_CODES_TBL.format(name=name)) or {}
    cmeta = store.table_meta(_PQ_CODEBOOK_TBL.format(name=name)) or {}
    if meta.get("save_id") != cmeta.get("save_id"):
        raise ValueError(
            f"torn PQ save '{name}': codes save_id "
            f"{meta.get('save_id')!r} != codebook save_id "
            f"{cmeta.get('save_id')!r}")
    m, ksub, dsub = int(meta["m"]), int(meta["ksub"]), int(meta["dsub"])
    rows = (store.read(_PQ_CODEBOOK_TBL.format(name=name))
            .orderBy("m", "j").collect())
    if len(rows) != m * ksub:
        raise ValueError(
            f"torn PQ save '{name}': expected {m * ksub} codebook rows, "
            f"found {len(rows)}")
    cents = np.array([r["centroid"] for r in rows],
                     dtype=np.float64).reshape(m, ksub, dsub)
    book = PQCodebook(cents, meta.get("key", "vec_id"),
                      meta.get("vec_col", "embedding"))
    return book, store.read(_PQ_CODES_TBL.format(name=name))
