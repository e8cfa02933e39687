"""Multimodal plumbing tests: schema, batch shape, determinism — the
codec itself is stubbed (no PIL in this environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from degdb_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthetic_media(spark, n=60)


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA
    assert media.count() == 60
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(media):
    out = M.extract_features(media, batch_rows=16)
    rows = out.collect()
    assert len(rows) == 60
    assert all(len(r.features) == M.FEATURE_DIM for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic across runs
    again = {r.media_id: r.features for r in M.extract_features(media).collect()}
    first = {r.media_id: r.features for r in rows}
    assert first == again


def test_strict_mode_raises_without_codec(media):
    if M.HAVE_PIL:
        pytest.skip("codec present")
    with pytest.raises(NotImplementedError):
        M.extract_features(media, strict=True)


def test_resize_plumbing(media):
    out = M.resize_images(media, 128, 128).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    assert all(r.width == 128 and r.height == 128 for r in out)


def test_video_frame_sampling(media):
    out = M.sample_video_frames(media, every_ms=250)
    df = out.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_ts_ms").alias("mx")
    )
    meta = {
        r.media_id: r.duration_ms
        for r in media.filter(F.col("kind") == "video")
        .select("media_id", F.col("meta.duration_ms").alias("duration_ms"))
        .collect()
    }
    for r in df.collect():
        assert r.n == meta[r.media_id] // 250 + 1
        assert r.mx <= meta[r.media_id]


def test_media_similarity_end_to_end(media):
    out = M.media_embedding_topk(media, k=3).collect()
    assert len(out) == 9  # 3 queries × top-3
    assert all(-1.0001 <= r.cosine_sim <= 1.0001 for r in out)
