"""Multimodal binary plumbing: schema, Arrow batching, deterministic stub
features, frame-sample explode shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_etl_spark.ml.multimodal import as_media, decode_real, extract_features, sample_frames
from job_etl_spark.tables import table
from tests.conftest import SF_SMOKE


def test_extract_features_over_binary(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(50)
    media = as_media(docs, "doc_id", "text", "image")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["n_bytes"] > 0 and len(r["feature"]) == 8
    # histogram features normalized
    assert abs(sum(r["feature"]) - 1.0) < 1e-3
    # deterministic: rerun produces identical features
    again = {x["media_id"]: x["feature"] for x in extract_features(media).collect()}
    assert again[r["media_id"]] == r["feature"]


def test_sample_frames_shape(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(10)
    media = as_media(docs, "doc_id", "text", "video")
    frames = sample_frames(media, every_n=10)
    pdf = frames.collect()
    assert all(row["frame_idx"] % 10 == 0 for row in pdf)
    assert all(row["frame_idx"] <= max(row["n_frames"] - 1, 0) for row in pdf)


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"bytes", "image")


def test_resize_images_plumbing(spark):
    """Resize stub: aspect preserved, longer side == max_side, never
    upscaled, payload passes through the Arrow batch unchanged."""
    from job_etl_spark.ml.multimodal import as_media, resize_images
    from job_etl_spark.tables import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents").limit(20)
    media = as_media(docs, "doc_id", "text", "image")
    out = {r["media_id"]: r for r in resize_images(media, max_side=100).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert set(out) == set(src) and len(out) == 20
    for mid, r in out.items():
        n = src[mid]["meta_n_bytes"]
        w0, h0 = max(n % 640, 1), max(n % 480, 1)
        assert max(r["width"], r["height"]) <= 100 or (w0 <= 100 and h0 <= 100)
        if max(w0, h0) > 100:
            assert max(r["width"], r["height"]) == 100  # hit the target side
        assert r["payload"] == src[mid]["payload"]
