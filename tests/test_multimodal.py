"""Multimodal plumbing: schemas, batch shapes, determinism, column pruning.

The byte-level decode is a documented stub (no codec libs in this
environment) — these tests pin down everything around it: Arrow batch
transfer, fan-out shapes, metadata-driven planning, payload pruning.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_search_engine_spark.sources.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    media_df,
    media_stats,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, tmp_path_factory):
    """Write → re-read parquet so plan-level pruning assertions see a scan."""
    path = str(tmp_path_factory.mktemp("media") / "media.parquet")
    media_df(spark, n=120).write.parquet(path)
    return spark.read.parquet(path)


def test_real_decode_is_marked_not_implemented():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_media(b"abc", "image", codec="real")


def test_fake_decode_is_deterministic():
    a = decode_media(b"payload-bytes", "image")
    b = decode_media(b"payload-bytes", "image")
    assert np.array_equal(a, b)
    assert a.dtype == np.float32 and a.shape == (256,)
    assert not np.array_equal(a, decode_media(b"other", "image"))


def test_extract_features_schema_and_determinism(spark, media):
    feats = extract_features(media)
    assert feats.schema.simpleString() == (
        "struct<media_id:string,media_type:string,feature:array<float>,"
        "feature_norm:float>")
    rows1 = {r["media_id"]: r["feature"] for r in feats.collect()}
    rows2 = {r["media_id"]: r["feature"]
             for r in extract_features(media.repartition(3)).collect()}
    assert rows1 == rows2  # parallelism-independent
    assert len(rows1) == 120
    v = np.array(next(iter(rows1.values())))
    assert v.shape == (FEATURE_DIM,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5  # L2-normalized


def test_resize_only_touches_images(spark, media):
    out = resize_images(media, 224, 224).collect()
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(out) == n_images
    for r in out:
        assert r["width"] == 224 and r["height"] == 224
        assert len(bytes(r["payload"])) == 32 + 4  # sha256 + w/h suffix


def test_sample_frames_fanout_matches_metadata(spark, media):
    frames = sample_frames(media, every_ms=1000, max_frames=16)
    got = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("offset_ms").alias("max_off")).collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("media_type") == "video")
        .select("media_id", F.col("meta.duration_ms").alias("duration_ms"))
        .collect()
    }
    assert set(r["media_id"] for r in got) == set(durations)
    for r in got:
        expected = min(max(durations[r["media_id"]] // 1000, 1), 16)
        assert r["n"] == expected, r["media_id"]
        assert r["max_off"] == (expected - 1) * 1000


def test_metadata_query_prunes_payload_column(spark, media):
    """The parquet scan for a metadata-only aggregate must not read the
    payload blob (ReadSchema check — the 100 TB design point)."""
    plan = media_stats(media)._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "payload" not in read_schema[0], read_schema[0]
    stats = {r["media_type"]: r["n_items"]
             for r in media_stats(media).collect()}
    assert stats == {"image": 40, "audio": 40, "video": 40}
