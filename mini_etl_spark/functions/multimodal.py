"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-parallel
mapInPandas with Arrow batches, deterministic batch shapes. The *decode
kernels* are stubbed by design: the image/audio libraries are not in this
environment, so each kernel either raises ``NotImplementedError`` (real
mode) or produces a deterministic fake (test mode) with the exact shapes a
real decoder would emit. Swapping in Pillow/torchaudio/ffmpeg later touches
ONLY the kernel body — the distributed plumbing is already correct.

Layout convention (one row per asset):

    asset_id   bigint
    modality   string               -- image | audio | video
    content    binary               -- opaque encoded bytes
    meta       struct<format:string, width:int, height:int,
                      sample_rate:int, duration_ms:int>

At 100 TB the binary column dominates: keep assets in their own parquet
files (large row groups), push *metadata* filters down before ever touching
``content``, and size partitions by bytes not rows
(``spark.sql.files.maxPartitionBytes``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes int, content_sha256 string, "
    f"features array<float>"
)


def decode_image(content: bytes, fmt: str | None) -> np.ndarray:
    """Decode encoded image bytes → HWC uint8 array. STUB: requires an image
    library (Pillow/opencv) not present in this environment."""
    raise NotImplementedError(
        "decode_image: no image codec in this environment — install Pillow "
        "and replace this kernel body (plumbing above is ready)"
    )


def decode_audio(content: bytes, fmt: str | None) -> np.ndarray:
    """Decode encoded audio bytes → float32 waveform. STUB (no audio lib)."""
    raise NotImplementedError(
        "decode_audio: no audio codec in this environment — install "
        "soundfile/torchaudio and replace this kernel body"
    )


def sample_video_frames(content: bytes, fmt: str | None, every_ms: int = 1000) -> list[np.ndarray]:
    """Sample frames from encoded video. STUB (no ffmpeg)."""
    raise NotImplementedError(
        "sample_video_frames: no ffmpeg in this environment — replace this "
        "kernel body; frame-batch plumbing is ready"
    )


def fake_feature_kernel(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a real embed-the-asset kernel: FEATURE_DIM
    floats derived from the sha256 of the bytes. Stable across runs and
    engines — lets every test assert real values through the real plumbing."""
    digest = hashlib.sha256(content).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype("float32")
    return raw / 65535.0


def extract_features(
    df: DataFrame,
    kernel: Callable[[bytes], np.ndarray] | None = None,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Partition-parallel feature extraction over the asset table.

    ``kernel: bytes -> float32[FEATURE_DIM]`` runs inside ``mapInPandas``
    (Arrow batches, zero-copy binary). Default kernel is the deterministic
    fake; pass a real decoder-based kernel when codecs are available.
    Output drops ``content`` (features replace bytes — the output table is
    small, the input table was the heavy one).
    """
    fn = kernel or fake_feature_kernel

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                fn(bytes(c)) if c is not None else np.zeros(FEATURE_DIM, dtype="float32")
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [0 if c is None else len(c) for c in pdf["content"]],
                    "content_sha256": [
                        "" if c is None else hashlib.sha256(bytes(c)).hexdigest()
                        for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def filter_by_meta(
    df: DataFrame,
    modality: str | None = None,
    min_width: int | None = None,
    min_duration_ms: int | None = None,
) -> DataFrame:
    """Metadata-only pruning — runs entirely on the small struct column and
    pushes down to the scan, so filtered assets' bytes are never read
    (column pruning keeps `content` out of the scan until decode time)."""
    out = df
    if modality is not None:
        out = out.filter(F.col("modality") == modality)
    if min_width is not None:
        out = out.filter(F.col("meta.width") >= min_width)
    if min_duration_ms is not None:
        out = out.filter(F.col("meta.duration_ms") >= min_duration_ms)
    return out


def synthetic_assets(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests: binary payloads derived
    from the asset id (so content hashes are stable)."""
    rng = np.random.default_rng(seed)
    rows = []
    modalities = ["image", "audio", "video"]
    for i in range(n):
        m = modalities[i % 3]
        payload = hashlib.sha256(f"asset-{i}".encode()).digest() * (1 + i % 5)
        rows.append(
            (
                i,
                m,
                bytearray(payload),
                (
                    "png" if m == "image" else ("wav" if m == "audio" else "mp4"),
                    int(rng.integers(16, 512)) if m == "image" else None,
                    int(rng.integers(16, 512)) if m == "image" else None,
                    16000 if m == "audio" else None,
                    int(rng.integers(100, 60000)) if m != "image" else None,
                ),
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
