"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction as Arrow-batched pandas UDFs.

Media columns are ``binary`` with a ``media_type`` tag. Formats that
decode with the stdlib are decoded for REAL (media_codecs.py): BMP and
8-bit PNG images, PCM WAV audio — decode, image features (dims, mean
luminance), nearest-neighbour resize, audio features (rate, duration,
rms). Codec-library formats (JPEG/MP3/H.264 video) raise
``NotImplementedError`` — those libraries are not in this container —
but the Spark plumbing is identical either way: the schema, the
mapInPandas batch shape, the partitioning, and a deterministic
byte-level feature path (sizes + sha256 + frame-count estimate) that an
exact DuckDB oracle validates end-to-end.

At scale: one blob row -> one feature row; the UDF is embarrassingly
parallel per partition, and Arrow moves the binary column zero-copy.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),   # image|audio|video|blob
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("n_frames", IntegerType()),     # 1 + n_bytes // 1024
    StructField("content_sha256", StringType()),
])

FRAME_BYTES = 1024  # deterministic frame-sample stride for the fake path


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to a uint8 numpy array (H, W, C).

    BMP and 8-bit PNG decode for real (pure stdlib, media_codecs.py);
    codec-library formats raise NotImplementedError."""
    from .media_codecs import MediaDecodeError, decode_bmp, decode_png

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:3] == b"\xff\xd8\xff" or payload[:4] in (b"RIFF",
                                                         b"GIF8"):
        raise NotImplementedError(
            "JPEG/WebP/GIF decode requires a codec library not present "
            "in this environment; BMP and PNG decode natively")
    raise MediaDecodeError("image: unrecognized signature")


def decode_audio(payload: bytes) -> "object":
    """Decode an audio payload to (sample_rate, int16 samples (N, ch)).

    PCM WAV decodes for real; compressed codecs raise."""
    from .media_codecs import MediaDecodeError, decode_wav

    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:3] == b"ID3" or payload[:2] in (b"\xff\xfb", b"\xff\xf3"):
        raise NotImplementedError(
            "MP3 decode requires a codec library not present in this "
            "environment; PCM WAV decodes natively")
    raise MediaDecodeError("audio: unrecognized signature")


def sample_video_frames(payload: bytes, every_n: int = 10) -> "object":
    raise NotImplementedError(
        "video frame sampling requires a codec library not present in "
        "this environment")


def _feature_batches(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": payloads.map(lambda b: len(b or b"")).astype(
                "int64"),
            "n_frames": payloads.map(
                lambda b: 1 + len(b or b"") // FRAME_BYTES).astype(
                "int32"),
            "content_sha256": payloads.map(
                lambda b: hashlib.sha256(b or b"").hexdigest()),
        })


def extract_media_features(df: DataFrame) -> DataFrame:
    """media rows -> deterministic byte-level features (the stub decode
    path). Column-pruned input, Arrow batches, one output row per blob."""
    return df.select("media_id", "media_type", "payload") \
        .mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: the utf-8 bytes become
    the opaque payload (the container has no real media files; the
    plumbing — binary column, typed metadata — is what's under test)."""
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video"),
                F.lit("blob")),
        (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"))
    return docs.select(F.col("doc_id").alias("media_id"),
                       mtype.alias("media_type"),
                       F.encode("text", "utf-8").alias("payload"))


# ---------------------------------------------------------------------------
# Real-decode feature and transform UDFs (BMP/PNG/WAV via media_codecs).

from pyspark.sql.types import DoubleType  # noqa: E402

IMAGE_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("mean_luma", DoubleType()),
    StructField("error", StringType()),
])

AUDIO_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("n_channels", IntegerType()),
    StructField("duration_sec", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("error", StringType()),
])

RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("error", StringType()),
])


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode BMP/PNG payloads and emit (dims, channels, mean luminance);
    undecodable blobs become error rows, never task failures."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload or b""))
                    rows.append((mid, img.shape[1], img.shape[0],
                                 img.shape[2], float(img.mean()), None))
                except Exception as e:
                    rows.append((mid, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(rows, columns=[f.name for f in
                                          IMAGE_FEATURE_SCHEMA.fields])

    return df.select("media_id", "payload") \
        .mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Decode PCM WAV payloads to (rate, samples, duration, rms)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        rows = []
        for pdf in it:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, samples = decode_audio(bytes(payload or b""))
                    rms = float(np.sqrt(
                        np.mean(samples.astype("float64") ** 2)))
                    rows.append((mid, rate, samples.shape[0],
                                 samples.shape[1],
                                 samples.shape[0] / rate, rms, None))
                except Exception as e:
                    rows.append((mid, None, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(rows, columns=[f.name for f in
                                          AUDIO_FEATURE_SCHEMA.fields])

    return df.select("media_id", "payload") \
        .mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Decode, nearest-neighbour resize, re-encode as PNG — the
    image-normalization stage of a training-data pipeline."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codecs import encode_png, resize_nearest
        rows = []
        for pdf in it:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload or b""))
                    out = encode_png(resize_nearest(img, width, height))
                    rows.append((mid, out, None))
                except Exception as e:
                    rows.append((mid, None,
                                 f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(rows, columns=[f.name for f in
                                          RESIZED_SCHEMA.fields])

    return df.select("media_id", "payload") \
        .mapInPandas(batches, schema=RESIZED_SCHEMA)
