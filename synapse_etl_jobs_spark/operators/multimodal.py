"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with typed metadata structs;
all per-item work runs in Arrow-batched ``mapInPandas`` so bytes never
round-trip through per-row Python pickling. The actual codecs (Pillow,
ffmpeg, torchaudio…) are NOT in this container, so the decode kernels are
stubbed behind ``_require_codec`` / deterministic fakes — the Spark-side
contract (schemas, batch iteration, partition sizing) is real and tested.

Scale notes: media rows are large — keep ``spark.sql.files.maxPartitionBytes``
moderate and repartition by a size-aware key before mapInPandas so one
task doesn't inherit a partition of 4K videos; the iterator-of-batches
API below streams batches, never materializing a partition in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("mime", StringType()),
        StructField("data", BinaryType()),        # opaque payload
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _require_codec(name: str):
    raise NotImplementedError(
        f"codec backend {name!r} is not available in this environment; "
        "install it and replace the deterministic fake kernel"
    )


def _fake_features(data: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real image encoder: per-chunk byte
    means. Replace with the model forward pass; the Spark plumbing
    (schema, batching) is identical."""
    if not data:
        return [0.0] * dim
    arr = np.frombuffer(data, dtype=np.uint8)
    chunks = np.array_split(arr, dim)
    return [float(c.mean()) if len(c) else 0.0 for c in chunks]


def extract_image_features(df: DataFrame, *, dim: int = 16, use_real_codec: bool = False) -> DataFrame:
    """binary image column → feature vectors, via Arrow-batched mapInPandas."""
    if use_real_codec:
        _require_codec("PIL")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            data = pdf["data"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": data.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": data.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": data.map(lambda b: _fake_features(b or b"", dim)),
                }
            )

    return df.select("media_id", "data").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("rms", FloatType()),          # fake energy proxy
        StructField("n_windows", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("data", BinaryType()),
    ]
)


def extract_audio_features(
    df: DataFrame, *, window_bytes: int = 160, dim: int = 8,
    use_real_codec: bool = False,
) -> DataFrame:
    """binary audio column → windowed feature vectors via mapInPandas.

    Real impl: decode (ffmpeg/torchaudio), resample, log-mel per window.
    Here the kernel treats the payload bytes as PCM-ish samples and emits
    per-chunk byte statistics — deterministic, same batch shape.
    """
    if use_real_codec:
        _require_codec("torchaudio")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "n_bytes": [], "rms": [],
                    "n_windows": [], "features": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                b = bytes(data or b"")
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.float32) - 128.0
                rows["media_id"].append(mid)
                rows["n_bytes"].append(len(b))
                rows["rms"].append(float(np.sqrt((arr ** 2).mean())) if len(arr) else 0.0)
                rows["n_windows"].append(max(len(b) // window_bytes, 0))
                rows["features"].append(_fake_features(b, dim))
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "audio").select(
        "media_id", "data"
    ).mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, *, width: int = 32, height: int = 32,
    use_real_codec: bool = False,
) -> DataFrame:
    """binary image column → resized binary via mapInPandas.

    Real impl: PIL decode → resize → re-encode inside the kernel. The
    stand-in emits a deterministic byte payload of the target size
    (repeating/truncating the source) so downstream plumbing (schemas,
    size accounting, partition shape) is exercised for real.
    """
    if use_real_codec:
        _require_codec("PIL")
    target = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _resize(b):
                b = bytes(b or b"\x00")
                reps = (target + len(b) - 1) // len(b)
                return (b * reps)[:target]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "data": pdf["data"].map(_resize),
                }
            )

    return df.filter(F.col("kind") == "image").select(
        "media_id", "data"
    ).mapInPandas(kernel, RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """video rows → (media_id, frame_idx, frame_ts_ms, frame binary stub).

    Real impl: ffmpeg seek+decode per sampled timestamp inside the kernel.
    Here frames are zero-byte stubs but the fan-out shape (row-per-frame,
    driven by duration metadata) is the production plan.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_ms", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, dur in zip(pdf["media_id"], pdf["duration_ms"]):
                # nullable long arrives as float64 with NaN — and NaN is
                # truthy, so `(dur or 0)` would keep it and int() raises
                dur = 0 if pd.isna(dur) else int(dur)
                n = max(dur // every_ms, 1)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(b"")  # stub: ffmpeg frame bytes
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms"
    ).mapInPandas(kernel, out_schema)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (payload =
    seeded pseudo-random bytes), for plumbing tests/benches."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(seed))), 512)
        .cast("binary")
        .alias("data"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(9000)) + 1000).alias("duration_ms"),
    )
    return df
