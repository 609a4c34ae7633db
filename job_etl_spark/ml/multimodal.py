"""Multimodal column plumbing (BASELINE.json extension).

Image/audio/video payloads are opaque ``binary`` columns + a typed
metadata struct. The decode / feature-extract / resize / frame-sample
steps run as Arrow-batched ``mapInPandas`` — the correct 100 TB shape:
bytes never leave the executor, batches stream through pandas, output is
a typed DataFrame.

The actual codec work is STUBBED (no image/audio libs in this container):
``decode_stub`` produces deterministic pseudo-features from the bytes;
``decode_real`` raises NotImplementedError with the intended dependency.
The Spark-side plumbing — schema, batching, partitioning — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", StringType()),  # binary in real data; see as_media
        StructField("meta_format", StringType()),
        StructField("meta_n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def as_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Normalize any source column into the opaque-media layout: binary
    payload + typed metadata."""
    payload = F.encode(F.col(payload_col), "utf-8") if dict(df.dtypes)[payload_col] == "string" else F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.lit("raw").alias("meta_format"),
        F.octet_length(payload).cast("long").alias("meta_n_bytes"),
    )


def decode_real(payload: bytes, media_type: str):  # pragma: no cover
    """Real decode path — requires PIL/librosa/av, not present here."""
    raise NotImplementedError(
        "media decode requires Pillow (image) / librosa (audio) / PyAV (video); "
        "install and swap decode_stub for the real codec call"
    )


def _pseudo_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature: byte-histogram buckets, normalized."""
    if not payload:
        return [0.0] * dim
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    n = float(len(payload))
    return [round(c / n, 6) for c in buckets]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched decode/feature pipeline over binary payloads.

    Deterministic stub semantics: width/height derived from byte length,
    n_frames from the first byte, feature = byte histogram. Swap the body
    for real codecs without touching the Spark plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            out["n_bytes"] = payloads.map(len).astype("int64")
            out["width"] = (out["n_bytes"] % 640).astype("int32")
            out["height"] = (out["n_bytes"] % 480).astype("int32")
            out["n_frames"] = payloads.map(lambda b: (b[0] % 30) + 1 if b else 0).astype("int32")
            out["feature"] = payloads.map(_pseudo_feature)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize plumbing (mapInPandas, same batch shape as the real codec
    path): scale stub dimensions so the longer side equals ``max_side``
    (aspect preserved, never upscaled), payload re-emitted per batch. The
    real implementation swaps the body for PIL ``Image.thumbnail`` —
    schema, batching, and partitioning stay identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            n_bytes = payloads.map(len).astype("int64")
            w = (n_bytes % 640).astype("int64").clip(lower=1)
            h = (n_bytes % 480).astype("int64").clip(lower=1)
            scale = (max_side / w.combine(h, max)).clip(upper=1.0)
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            out["width"] = (w * scale).round().clip(lower=1).astype("int32")
            out["height"] = (h * scale).round().clip(lower=1).astype("int32")
            out["payload"] = pdf["payload"]
            yield out

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index —
    the explode shape a video pipeline needs; frame bytes are stubbed."""
    feats = extract_features(media)
    idx = F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)))
    return feats.select("media_id", "n_frames", idx.alias("frame_idx"))
