"""Multimodal column plumbing (BASELINE.json extension).

Image/audio/video payloads are opaque ``binary`` columns + a typed
metadata struct. The decode / feature-extract / resize / frame-sample
steps run as Arrow-batched ``mapInPandas`` — the correct 100 TB shape:
bytes never leave the executor, batches stream through pandas, output is
a typed DataFrame.

Decode is REAL (``ml/codecs.py``): pure-stdlib PNG (zlib inflate + all
five scanline filters) and WAV-PCM16 parsing, with Pillow preferred when
importable. ``codec="real"`` decodes pixels/samples; ``codec="stub"``
keeps the deterministic byte-histogram path for payloads that are not
media (e.g. q28's correctness gate runs over document text bytes).
Video frame decode still needs PyAV and stays gated.
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

from job_etl_spark.shipping import ensure_worker_package

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


def decode_real(payload: bytes, media_type: str) -> dict:
    """Real decode: sniffs the payload and runs the stdlib codec
    (ml/codecs.py). -> {width, height, n_frames, feature}. Raises
    MediaDecodeError for formats the pure-python path can't handle
    (video needs PyAV)."""
    from job_etl_spark.ml import codecs

    kind = codecs.sniff(payload)
    if kind == "png":
        w, h, feat = codecs.image_features(payload)
        return {"width": w, "height": h, "n_frames": 1, "feature": feat}
    if kind == "wav":
        rate, duration, feat = codecs.audio_features(payload)
        return {
            "width": None,
            "height": None,
            # a frame per second of audio — the sampling granularity the
            # frame-explode path uses
            "n_frames": max(1, int(duration)),
            "feature": feat,
        }
    if media_type == "video":
        raise codecs.MediaDecodeError("video decode requires PyAV")
    raise codecs.MediaDecodeError(f"unrecognized media payload ({media_type})")


def _pseudo_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature: byte-histogram buckets, normalized."""
    if not payload:
        return [0.0] * dim
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    n = float(len(payload))
    return [round(c / n, 6) for c in buckets]


def extract_features(media: DataFrame, codec: str = "stub") -> DataFrame:
    """Arrow-batched decode/feature pipeline over binary payloads.

    ``codec="real"`` runs the actual decoders (PNG pixels / WAV samples,
    ml/codecs.py) and NULLs the decode columns for undecodable payloads;
    ``codec="stub"`` keeps deterministic pseudo-features (width/height
    from byte length, feature = byte histogram) for non-media payloads.
    Either way the Spark plumbing — schema, batching, partitioning — is
    identical.
    """
    if codec not in ("stub", "real"):
        raise ValueError(f"codec must be 'stub' or 'real', got {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from job_etl_spark.ml.codecs import MediaDecodeError

        for pdf in batches:
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            out["n_bytes"] = payloads.map(len).astype("int64")
            if codec == "stub":
                out["width"] = (out["n_bytes"] % 640).astype("int32")
                out["height"] = (out["n_bytes"] % 480).astype("int32")
                out["n_frames"] = payloads.map(
                    lambda b: (b[0] % 30) + 1 if b else 0
                ).astype("int32")
                out["feature"] = payloads.map(_pseudo_feature)
            else:
                mtypes = pdf["media_type"] if "media_type" in pdf else None

                def dec(i: int, b: bytes) -> dict:
                    mt = mtypes.iloc[i] if mtypes is not None else "unknown"
                    try:
                        return decode_real(b, mt)
                    except MediaDecodeError:
                        return {
                            "width": None,
                            "height": None,
                            "n_frames": None,
                            "feature": None,
                        }

                decoded = [dec(i, b) for i, b in enumerate(payloads)]
                out["width"] = pd.array(
                    [d["width"] for d in decoded], dtype="Int32"
                )
                out["height"] = pd.array(
                    [d["height"] for d in decoded], dtype="Int32"
                )
                out["n_frames"] = pd.array(
                    [d["n_frames"] for d in decoded], dtype="Int32"
                )
                out["feature"] = pd.Series(
                    [d["feature"] for d in decoded], dtype="object"
                )
            yield out

    ensure_worker_package(media.sparkSession)
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 224, codec: str = "stub") -> DataFrame:
    """Resize over Arrow batches. ``codec="real"`` decodes PNG pixels,
    nearest-neighbor thumbnails them (aspect preserved, never upscaled)
    and re-encodes — a true pixel transform (Pillow's ``thumbnail`` when
    importable, stdlib codec otherwise); undecodable payloads pass
    through with NULL dimensions. ``codec="stub"`` scales byte-derived
    dimensions with the same batch shape."""
    if codec not in ("stub", "real"):
        raise ValueError(f"codec must be 'stub' or 'real', got {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from job_etl_spark.ml.codecs import MediaDecodeError, png_resize

        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            if codec == "stub":
                n_bytes = payloads.map(len).astype("int64")
                w = (n_bytes % 640).astype("int64").clip(lower=1)
                h = (n_bytes % 480).astype("int64").clip(lower=1)
                scale = (max_side / w.combine(h, max)).clip(upper=1.0)
                out["width"] = (w * scale).round().clip(lower=1).astype("int32")
                out["height"] = (h * scale).round().clip(lower=1).astype("int32")
                out["payload"] = pdf["payload"]
            else:
                resized = []
                for b in payloads:
                    try:
                        resized.append(png_resize(b, max_side))
                    except MediaDecodeError:
                        resized.append((None, None, b))
                out["width"] = pd.array([r[0] for r in resized], dtype="Int32")
                out["height"] = pd.array([r[1] for r in resized], dtype="Int32")
                out["payload"] = pd.Series([r[2] for r in resized], dtype="object")
            yield out

    ensure_worker_package(media.sparkSession)
    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, codec: str = "stub") -> DataFrame:
    """Frame sampling: one output row per sampled frame index — the
    explode shape a video pipeline needs. ``codec="real"`` takes n_frames
    from the actual decode (1 per image, per-second for audio; video
    frame extraction still needs PyAV); frame BYTES are not materialized
    either way."""
    feats = extract_features(media, codec=codec)
    idx = F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)))
    # zero-frame (or undecodable) media yields no rows — the greatest()
    # floor otherwise emits a phantom frame_idx=0
    return feats.where(F.col("n_frames") > 0).select(
        "media_id", "n_frames", idx.alias("frame_idx")
    )


def with_perceptual_hash(media: DataFrame) -> DataFrame:
    """Image near-dup signal: adds a 64-bit dHash column (``phash``,
    NULL for undecodable payloads) via Arrow-batched ``mapInPandas`` —
    the binary payload never leaves the executor, and downstream dedup
    is plain integer hamming over the hash (``ml/dedup.hamming_distance``
    / the q31 blocked-pair shape), NOT pairwise image comparison."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields
    ) + ", phash bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from job_etl_spark.ml.codecs import MediaDecodeError, perceptual_hash

        for pdf in batches:
            def ph(b):
                if b is None:
                    return None
                try:
                    h = perceptual_hash(bytes(b))
                    # keep within signed int64 for Spark BIGINT
                    return h - (1 << 64) if h >= (1 << 63) else h
                except (MediaDecodeError, ValueError, IndexError):
                    return None

            pdf = pdf.copy()
            pdf["phash"] = pdf["payload"].map(ph).astype("object")
            yield pdf

    ensure_worker_package(media.sparkSession)
    return media.mapInPandas(run, out_schema)


def with_audio_fingerprint(media: DataFrame) -> DataFrame:
    """Audio near-dup signal: adds the 64-bit energy-gradient fingerprint
    (``afp``, NULL for undecodable payloads) via Arrow-batched
    ``mapInPandas`` — the WAV twin of ``with_perceptual_hash``."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields
    ) + ", afp bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from job_etl_spark.ml.codecs import MediaDecodeError, audio_fingerprint

        for pdf in batches:
            def fp(b):
                if b is None:
                    return None
                try:
                    h = audio_fingerprint(bytes(b))
                    return h - (1 << 64) if h >= (1 << 63) else h
                except (MediaDecodeError, ValueError, IndexError):
                    return None

            pdf = pdf.copy()
            pdf["afp"] = pdf["payload"].map(fp).astype("object")
            yield pdf

    ensure_worker_package(media.sparkSession)
    return media.mapInPandas(run, out_schema)


def audio_neardup_pairs(media: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Near-duplicate audio pairs: energy-gradient fingerprints through
    the real WAV decoder, then the pigeonhole-banded hamming comparison
    (candidates keyed on (top-byte block, band, band_bits) — no
    clip×clip pass; exact pair set for the declared threshold)."""
    from pyspark.sql import functions as F

    from job_etl_spark.ml.dedup import simhash_block_pairs

    hashed = (
        with_audio_fingerprint(media)
        .where(F.col("afp").isNotNull())
        .select(
            F.col("media_id").alias("doc_id"),
            F.shiftrightunsigned("afp", 56).alias("block"),
            F.col("afp").alias("simhash"),
        )
    )
    return simhash_block_pairs(hashed, ("block",), max_hamming=max_hamming, bits=64)


def image_neardup_pairs(media: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Near-duplicate image pairs: perceptual hashes, then the same
    pigeonhole-banded hamming comparison as text simhash (candidates keyed
    on (block, band, band_bits) — no image×image pass). The coarse
    top-byte block alone would cap fan-out at 256 buckets (a skew bound at
    corpus scale); the bit-bands inside each block remove that bound while
    keeping the pair set exact for the declared threshold."""
    from pyspark.sql import functions as F

    from job_etl_spark.ml.dedup import simhash_block_pairs

    hashed = (
        with_perceptual_hash(media)
        .where(F.col("phash").isNotNull())
        .select(
            F.col("media_id").alias("doc_id"),
            F.shiftrightunsigned("phash", 56).alias("block"),
            F.col("phash").alias("simhash"),
        )
    )
    return simhash_block_pairs(hashed, ("block",), max_hamming=max_hamming, bits=64)
