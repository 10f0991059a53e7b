"""Multimodal-column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas functions
over mapInPandas.

The Spark-side machinery (schemas, batch iteration, partition-preserving
transforms) is real and tested.  IMAGE/VIDEO decoding is STUBBED —
image codecs are not available in this environment; each decode hook
either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the bytes (test mode), so pipelines are
fully exercisable end-to-end.  AUDIO decoding is REAL for PCM WAV
payloads (stdlib ``wave`` — no external codec needed): ``decode_wav`` /
``extract_audio_features`` parse the container and compute signal
features.
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
    "decode_wav",
    "extract_audio_features",
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


AUDIO_FEATURES_FIELDS = [
    ("sample_rate", T.IntegerType()),
    ("n_channels", T.IntegerType()),
    ("n_frames", T.LongType()),
    ("duration_ms", T.LongType()),
    ("rms", T.DoubleType()),
    ("peak", T.DoubleType()),
]


def decode_wav(payload: bytes) -> dict | None:
    """REAL decode for PCM WAV payloads via the stdlib ``wave`` module
    (8/16/32-bit integer PCM) — the one media family decodable without
    an external codec.  Returns container metadata plus normalized
    signal features, or None for undecodable bytes (the caller maps
    that to an all-null feature row, never a task failure)."""
    import io
    import wave

    import numpy as np

    if not payload:
        return None
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            n = w.getnframes()
            sw = w.getsampwidth()
            raw = w.readframes(n)
    except (wave.Error, EOFError, OSError):
        return None
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None or sr <= 0:
        return None
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * sw - 1))
    return {
        "sample_rate": sr,
        "n_channels": ch,
        "n_frames": n,
        "duration_ms": int(n * 1000 / sr),
        "rms": float(np.sqrt(np.mean(x**2))) if x.size else 0.0,
        "peak": float(np.max(np.abs(x))) if x.size else 0.0,
    }


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode: Callable[[bytes], dict | None] = decode_wav,
) -> DataFrame:
    """Arrow-batched audio feature extraction over mapInPandas — same
    plumbing shape as :func:`extract_image_features` but with a REAL
    default decoder (PCM WAV).  Undecodable payloads produce all-null
    feature rows."""
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType, True)]
        + [T.StructField(name, dt, True) for name, dt in AUDIO_FEATURES_FIELDS]
    )
    names = [name for name, _dt in AUDIO_FEATURES_FIELDS]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(p) for p in pdf[payload_col]]
            cols = {id_col: pdf[id_col]}
            for name in names:
                cols[name] = [d.get(name) if d else None for d in decoded]
            yield pd.DataFrame(cols)

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


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
