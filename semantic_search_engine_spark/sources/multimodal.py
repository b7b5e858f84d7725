"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Design for binary payload columns at 100 TB scale:

* media is an opaque ``binary`` column plus a *typed* metadata struct — the
  engine never infers formats from bytes at plan time;
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages (never row-at-a-time Python UDFs): one Python
  worker call per Arrow batch, numpy-vectorized inside;
* payload bytes are *column-pruned away* by every stage that only needs
  metadata — the parquet scan of a metadata-only query must not read the
  blob column (verified by test via ``ReadSchema``).

The image/audio codec libraries are not in this container, so the byte-level
decode is STUBBED two ways (clearly marked):

* ``decode_media(..., codec="real")`` raises ``NotImplementedError`` naming
  the library that a production deployment would plug in;
* the default ``codec="fake"`` is a *deterministic* stand-in (sha256-seeded
  statistics of the payload bytes) so every piece of Spark-side plumbing —
  schemas, batch shapes, partitioning, UDF signatures, downstream joins —
  is real and testable end-to-end.

Reference analogue: the dense-feature columns and batched featurizer of the
reference ingest (``data-pipeline/data_ingestion.py:179-218``, 3×384-d
vectors per row) — here generalized to non-text payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField,
    StructType, TimestampType,
)

# ---------------------------------------------------------------------------
# Schema: opaque payload + typed metadata
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),   # stable key (url-like)
    StructField("doc_url", StringType(), True),     # owning document
    StructField("media_type", StringType(), False),  # image|audio|video
    StructField("payload", BinaryType(), True),
    StructField("meta", StructType([
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("codec", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
    ]), True),
    StructField("fetched_at", TimestampType(), True),
])

FEATURE_DIM = 64

FEATURES_SCHEMA = (
    "media_id string, media_type string, feature array<float>, "
    "feature_norm float"
)

FRAMES_SCHEMA = (
    "media_id string, frame_idx int, offset_ms int, frame_payload binary"
)

RESIZED_SCHEMA = (
    "media_id string, payload binary, width int, height int"
)


# ---------------------------------------------------------------------------
# Decode stubs — the ONLY place a codec library would plug in
# ---------------------------------------------------------------------------

def decode_media(payload: bytes, media_type: str, codec: str = "fake"
                 ) -> np.ndarray:
    """Decode one payload to a float sample array.

    ``codec="real"`` is the production hook — STUB: this container ships no
    image/audio libraries, so it raises ``NotImplementedError`` naming the
    dependency a deployment would provide (Pillow / soundfile / PyAV).

    ``codec="fake"`` (default) is a deterministic stand-in: a 256-sample
    float array seeded from sha256(payload) — stable across runs, machines
    and parallelism levels, which is what the plumbing tests need.
    """
    if codec == "real":
        raise NotImplementedError(
            "real media decode requires Pillow (image) / soundfile (audio) "
            "/ PyAV (video) — not available in this environment; plug the "
            "library call in here and keep the same array contract")
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal(256).astype(np.float32)


def _batch_fake_decode(payloads: pd.Series) -> np.ndarray:
    """Vectorized fake decode for a whole Arrow batch → (n, 256) float32."""
    out = np.empty((len(payloads), 256), dtype=np.float32)
    for i, p in enumerate(payloads):  # hashing is per-blob by nature
        out[i] = decode_media(bytes(p) if p is not None else b"", "any")
    return out


# ---------------------------------------------------------------------------
# mapInPandas operators (Arrow-batched; real plumbing, stubbed byte-decode)
# ---------------------------------------------------------------------------

def extract_features(media: DataFrame, feature_dim: int = FEATURE_DIM
                     ) -> DataFrame:
    """payload → dense feature vector (the U1 analogue for media).

    Column-prunes to (media_id, media_type, payload) before the Python
    boundary so Arrow only transfers what the stage uses.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            samples = _batch_fake_decode(pdf["payload"])  # (n, 256)
            # "feature extraction": banded mean-pool to feature_dim, then
            # L2-normalize — numpy-vectorized over the whole batch
            pooled = samples.reshape(len(pdf), feature_dim,
                                     256 // feature_dim).mean(axis=2)
            norms = np.linalg.norm(pooled, axis=1)
            safe = np.where(norms == 0, 1.0, norms)
            feats = (pooled / safe[:, None]).astype(np.float32)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "media_type": pdf["media_type"].to_numpy(),
                "feature": list(feats),
                "feature_norm": norms.astype(np.float32),
            })

    pruned = media.select("media_id", "media_type", "payload")
    return pruned.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing for image payloads.

    STUB: real pixel resampling needs Pillow; the deterministic stand-in
    re-encodes the payload as ``sha256(payload) || width || height`` so
    output bytes are stable and size-bounded. Schema, filtering, batching
    and metadata update are the real thing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wh = width.to_bytes(2, "big") + height.to_bytes(2, "big")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = [hashlib.sha256(bytes(p) if p is not None else b"")
                   .digest() + wh for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "payload": out,
                "width": np.full(len(pdf), width, dtype=np.int32),
                "height": np.full(len(pdf), height, dtype=np.int32),
            })

    imgs = media.filter(F.col("media_type") == "image") \
                .select("media_id", "payload")
    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 16) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.

    Frame *offsets* come from the typed metadata (``meta.duration_ms``) —
    pure plan-side arithmetic; only the per-frame byte extraction is the
    stubbed part (frame_payload = sha256(payload || offset), stable).
    Fan-out (1 video → n frames) happens inside mapInPandas, the canonical
    shape for batch-expanding media operators.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, pays = [], [], [], []
            for mid, dur, payload in zip(pdf["media_id"],
                                         pdf["duration_ms"], pdf["payload"]):
                dur = int(dur) if pd.notna(dur) else 0
                n = min(max(dur // every_ms, 1), max_frames)
                raw = bytes(payload) if payload is not None else b""
                for k in range(n):
                    off = k * every_ms
                    ids.append(mid)
                    idxs.append(k)
                    offs.append(off)
                    pays.append(hashlib.sha256(
                        raw + off.to_bytes(4, "big")).digest())
            if ids:
                yield pd.DataFrame({
                    "media_id": ids,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "offset_ms": pd.Series(offs, dtype="int32"),
                    "frame_payload": pays,
                })

    vids = (media.filter(F.col("media_type") == "video")
            .select("media_id", F.col("meta.duration_ms").alias("duration_ms"),
                    "payload"))
    return vids.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must NOT read the payload column (column
    pruning reaches the scan; asserted in tests via the physical plan)."""
    return (media.groupBy("media_type")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(F.col("meta.n_bytes").cast("long")).alias("total_bytes"),
                 F.avg("meta.duration_ms").alias("avg_duration_ms")))


# ---------------------------------------------------------------------------
# Deterministic synthetic media corpus (tests/bench)
# ---------------------------------------------------------------------------

def generate_media_rows(n: int, seed: int = 7):
    rng = np.random.Generator(np.random.PCG64(seed))
    types = ["image", "audio", "video"]
    for i in range(n):
        mt = types[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 4096)),
                               dtype=np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(64, 4096)) if mt == "image" else None,
            "height": int(rng.integers(64, 4096)) if mt == "image" else None,
            "duration_ms": int(rng.integers(500, 20_000))
            if mt in ("audio", "video") else None,
            "sample_rate": 16_000 if mt == "audio" else None,
            "codec": {"image": "px-fake", "audio": "pcm-fake",
                      "video": "vid-fake"}[mt],
            "n_bytes": len(payload),
        }
        yield {
            "media_id": f"media://{mt}/{i:06d}",
            "doc_url": f"https://site{i % 97:04d}.example/page/{i:05d}",
            "media_type": mt,
            "payload": payload,
            "meta": meta,
            "fetched_at": None,
        }


def media_df(spark: SparkSession, n: int = 300, seed: int = 7,
             n_partitions: int = 8) -> DataFrame:
    rows = list(generate_media_rows(n, seed))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(n_partitions)
