"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested — schemas, partitioning, Arrow
batch shape through ``mapInPandas`` — while the actual media decoding is
STUBBED (image/audio libraries are not in this container): pass
``fake=True`` for a deterministic fake "decode" used by tests, or leave the
default which raises ``NotImplementedError`` at evaluation time.

Design for 100 TB of media: binary payloads ride in their own column so
column pruning skips them unless the stage needs bytes; work is
``repartition``-ed by a size-aware key before the decode stage so Arrow
batches stay bounded; every transform is a ``mapInPandas`` over an explicit
output schema (no schema inference at runtime).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata struct accompanying every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("format", T.StringType()),        # jpeg | png | wav | mp4 ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive the cheap metadata fields (n_bytes) JVM-side; callers fill
    format-specific fields at ingest."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long"))


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode: dimensions/luma derived from payload bytes.

    Stands in for a real image decode (PIL/libvips NOT in this container).
    """
    n = len(payload)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    luma = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return w, h, luma


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    feature_dim: int = 8,
    fake: bool = False,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``.

    ``fake=False`` (production signature): raises ``NotImplementedError`` in
    the decode body — the real implementation plugs a decoder into the same
    Arrow-batched iterator without touching the plan shape.
    """
    if batch_partitions:
        df = df.repartition(batch_partitions, F.col(id_col))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not in container; "
                    "use fake=True for plumbing tests"
                )
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, luma = _fake_decode(bytes(payload))
                feats = [float((w * (i + 1) + h) % 97) / 97.0 for i in range(feature_dim)]
                rows.append((int(mid), w, h, luma, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_luma", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=IMAGE_FEATURES_SCHEMA
    )


def image_resize(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    target_w: int = 224,
    target_h: int = 224,
    fake: bool = False,
) -> DataFrame:
    """Resize stage: payload → resized payload + new dims.

    Real implementation plugs PIL/libvips into the same Arrow iterator; the
    fake truncates/pads the byte stream to a deterministic target size so
    batch shape, schema, and downstream plumbing are testable.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL/libvips — not in container; "
                    "use fake=True for plumbing tests"
                )
            rows = []
            target_n = target_w * target_h // 64  # stand-in compressed size
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                resized = (b * (target_n // max(len(b), 1) + 1))[:target_n]
                rows.append((int(mid), resized, target_w, target_h))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "width", "height"])

    return df.select(id_col, payload_col).mapInPandas(resize_batches, schema=out_schema)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_mfcc: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Audio decode + feature stage (duration, rms, MFCC-shaped vector).

    Real implementation decodes wav/mp3 (soundfile/librosa — not in this
    container); the fake derives deterministic values from the payload bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("mfcc", T.ArrayType(T.FloatType())),
        ]
    )

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa — not in "
                    "container; use fake=True for plumbing tests"
                )
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                dur = len(b) * 8  # fake: 8ms per byte
                rms = (sum(x * x for x in b[:256]) / max(min(len(b), 256), 1)) ** 0.5 / 255.0
                mfcc = [float((len(b) * (i + 3)) % 31) / 31.0 for i in range(n_mfcc)]
                rows.append((int(mid), dur, rms, mfcc))
            yield pd.DataFrame(rows, columns=["media_id", "duration_ms", "rms", "mfcc"])

    return df.select(id_col, payload_col).mapInPandas(feat_batches, schema=out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame.

    Real implementation decodes with ffmpeg/av; the fake derives a
    deterministic frame count from payload size so partitioning/explode
    behavior is testable.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/av — not in container; "
                    "use fake=True for plumbing tests"
                )
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = max(1, len(bytes(payload)) // 100)
                for i in range(min(n_frames, 10)):
                    rows.append((int(mid), i, i * every_ms, bytes(payload)[:16]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame"])

    return df.select(id_col, payload_col).mapInPandas(sample_batches, schema=out_schema)
