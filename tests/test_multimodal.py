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
