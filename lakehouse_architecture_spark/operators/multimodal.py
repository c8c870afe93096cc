"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
UDF signatures — is real and tested. The actual media decoding is STUBBED
(this environment has no image/audio libraries): ``decode_image_stub``
parses only the tiny deterministic fake header written by
``encode_fake_image``, and raises ``NotImplementedError`` for real
codecs. Swapping in Pillow/torchaudio happens inside one function whose
contract (bytes in, features out) the tests already pin down.

Scale notes: mapInPandas streams Arrow record batches, so peak memory is
one batch per core, not one partition; `maxRecordsPerBatch` bounds it.
Binary payloads never pass through Python row-by-row.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("format", StringType(), True),      # codec/container
        StructField("payload", BinaryType(), True),     # opaque bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

_MAGIC = b"FAKEIMG1"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload: header + seed-derived pixels."""
    n = min(width * height, 64)
    pixels = bytes(((seed * 2654435761 + i * 40503) >> 7) % 256 for i in range(n))
    return _MAGIC + struct.pack("<iiq", width, height, seed) + pixels


def decode_image_stub(payload: bytes) -> dict:
    """Decode the fake format; real codecs are intentionally unsupported.

    Replace this single function with a Pillow-based decode in a real
    deployment — everything around it (schema, batching, null handling)
    stays identical.
    """
    if payload is None:
        return {"width": None, "height": None, "mean_pixel": None}
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real image codecs unavailable in this environment; "
            "only the FAKEIMG1 test format is decodable"
        )
    w, h, _seed = struct.unpack("<iiq", payload[8:24])
    pixels = payload[24:]
    mean = float(sum(pixels)) / len(pixels) if pixels else None
    return {"width": w, "height": h, "mean_pixel": mean}


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("decoded_width", IntegerType(), True),
        StructField("decoded_height", IntegerType(), True),
        StructField("mean_pixel", StringType(), True),  # str for portability
        StructField("payload_bytes", IntegerType(), True),
    ]
)


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas stage: decode image payloads -> feature columns."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "decoded_width": [f["width"] for f in feats],
                    "decoded_height": [f["height"] for f in feats],
                    "mean_pixel": [
                        None if f["mean_pixel"] is None else f"{f['mean_pixel']:.4f}"
                        for f in feats
                    ],
                    "payload_bytes": [
                        None if p is None else len(p) for p in pdf["payload"]
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        fn, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(df: DataFrame, max_dim: int) -> DataFrame:
    """mapInPandas stage shape for resize: passes payloads through and
    rewrites metadata (the real pixel work is the stubbed decode's job).
    Kept separate from feature extraction so stages compose in a
    pipeline: decode -> resize -> re-encode -> feature-extract."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # nulls arrive as NaN in pandas numeric columns — guard with
            # notna, not truthiness (NaN is truthy)
            scale = [
                min(1.0, max_dim / max(w, h))
                if pd.notna(w) and pd.notna(h)
                else None
                for w, h in zip(pdf["width"], pdf["height"])
            ]
            pdf = pdf.copy()
            pdf["width"] = [
                int(w * s) if s is not None else w
                for w, s in zip(pdf["width"], scale)
            ]
            pdf["height"] = [
                int(h * s) if s is not None else h
                for h, s in zip(pdf["height"], scale)
            ]
            yield pdf

    return df.mapInPandas(fn, schema=df.schema)


def sample_video_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (explode on a computed sequence — JVM-side; the stubbed
    part is only the eventual frame decode)."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


_AUDIO_MAGIC = b"FAKEAUD1"


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Deterministic fake audio payload: header + seed-derived 8-bit PCM."""
    n = min(n_samples, 256)
    pcm = bytes(((seed * 1103515245 + i * 12345) >> 5) % 256 for i in range(n))
    return _AUDIO_MAGIC + struct.pack("<iiq", sample_rate, n_samples, seed) + pcm


def decode_audio_stub(payload: bytes) -> dict:
    """Decode the fake audio format; real codecs intentionally
    unsupported (swap in torchaudio/soundfile here in deployment)."""
    if payload is None:
        return {"sample_rate": None, "n_samples": None, "rms": None}
    if not payload.startswith(_AUDIO_MAGIC):
        raise NotImplementedError(
            "real audio codecs unavailable in this environment; "
            "only the FAKEAUD1 test format is decodable"
        )
    rate, n_samples, _seed = struct.unpack("<iiq", payload[8:24])
    pcm = payload[24:]
    rms = (
        (sum((b - 128) ** 2 for b in pcm) / len(pcm)) ** 0.5 if pcm else None
    )
    return {"sample_rate": rate, "n_samples": n_samples, "rms": rms}


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("duration_computed_ms", IntegerType(), True),
        StructField("rms", StringType(), True),  # str for portability
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas stage: decode audio payloads -> rate/duration/loudness."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_samples": [f["n_samples"] for f in feats],
                    "duration_computed_ms": [
                        int(f["n_samples"] * 1000 / f["sample_rate"])
                        if f["sample_rate"]
                        else None
                        for f in feats
                    ],
                    "rms": [
                        None if f["rms"] is None else f"{f['rms']:.4f}"
                        for f in feats
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        fn, schema=AUDIO_FEATURES_SCHEMA
    )
