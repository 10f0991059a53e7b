"""Multimodal-column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas functions
over mapInPandas.

The Spark-side machinery (schemas, batch iteration, partition-preserving
transforms) is real and tested; the actual media decoding is STUBBED —
image/audio codecs are not available in this environment. Each decode
hook either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the bytes (test mode), so pipelines are
fully exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_image_stub",
    "extract_image_features",
    "sample_video_frames",
    "chunk_audio",
    "resize_images",
]

# Typed metadata that always travels beside an opaque media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without decoding (JVM-side)."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_sha", F.sha2(F.col(payload_col), 256)
    )


def decode_image_stub(payload: bytes) -> list[float]:
    """STUB decode: real implementation needs an image codec (PIL/cv2),
    unavailable here. Deterministic fake: 8 floats derived from a sha256
    of the bytes — stable across runs, so downstream tests are exact."""
    if payload is None:
        return [0.0] * 8
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode: Callable[[bytes], list[float]] = decode_image_stub,
    strict: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, partition-parallel,
    output schema fixed up front (id, features array<float>).

    `strict=True` raises NotImplementedError — the marker that a real
    codec must be wired in before production use.
    """
    if strict:
        raise NotImplementedError(
            "image decoding requires a codec library not present in this environment; "
            "pass decode=<your_fn> or strict=False for the deterministic stub"
        )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [decode(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (frame extraction itself is the stubbed decode). The explode of
    timestamps is JVM-side; only the (stub) frame decode would be Python.
    """
    ts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col(duration_col) - 1, F.lit(0)).cast("long"),
        F.lit(every_ms).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.col(payload_col),
        F.explode(ts).alias("frame_ts_ms"),
    ).withColumn("frame_key", F.concat_ws(":", F.col(id_col), F.col("frame_ts_ms")))


def chunk_audio(
    df: DataFrame,
    chunk_ms: int = 30_000,
    overlap_ms: int = 1_000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """ASR-style audio chunking: overlapping [chunk_start, chunk_end)
    windows over the duration. The chunk grid is a JVM-side
    sequence+explode (no Python); the per-chunk decode/transcribe step
    is the caller's (stubbed) pandas function. One output row per chunk,
    keyed (id, chunk_idx) — the shape a distributed transcription
    pipeline shuffles on."""
    if overlap_ms >= chunk_ms:
        raise ValueError("overlap_ms must be smaller than chunk_ms")
    stride = chunk_ms - overlap_ms
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col(duration_col) - 1, F.lit(0)).cast("long"),
        F.lit(stride).cast("long"),
    )
    out = df.select(
        *df.columns, F.posexplode(starts).alias("chunk_idx", "chunk_start_ms")
    )
    return out.withColumn(
        "chunk_end_ms",
        F.least(F.col("chunk_start_ms") + F.lit(chunk_ms), F.col(duration_col)),
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    resize: Callable[[bytes, int, int], bytes] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Image resize plumbing over mapInPandas: fixed output schema
    (id, width, height, payload binary), Arrow-batched. The actual
    resampling is the stubbed step — the default fake returns a
    deterministic digest-derived payload so downstream byte-level tests
    are exact; `strict=True` raises, marking where a real codec plugs in."""
    if strict:
        raise NotImplementedError(
            "image resizing requires a codec library not present in this "
            "environment; pass resize=<your_fn> or strict=False for the stub"
        )

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        if payload is None:
            return b""
        return hashlib.sha256(payload + f":{w}x{h}".encode()).digest()

    fn = resize or _fake_resize
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField(payload_col, T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": width,
                    "height": height,
                    payload_col: [fn(p, width, height) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
