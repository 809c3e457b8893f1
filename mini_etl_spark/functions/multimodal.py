"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-parallel
mapInPandas with Arrow batches, deterministic batch shapes. Decode kernels:
stdlib-decodable formats decode NATIVELY (binary PPM and uncompressed
24-bit BMP by struct parsing; 8-bit non-interlaced PNG by zlib inflate +
scanline unfilter; PCM WAV via the stdlib ``wave`` module; PPM-stream
video walked frame-by-frame — all tested end-to-end through the
distributed plumbing, including resize and frame-sampling operators).
Formats needing a real codec (jpeg/webp, 16-bit/interlaced PNG, mp3,
mp4 containers) decode through Pillow WHEN importable (optional extra)
and raise ``NotImplementedError`` otherwise — swapping in
torchaudio/ffmpeg for audio/video later touches only the dispatch in
each kernel.

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


def _parse_ppm(content: bytes) -> tuple[np.ndarray, int]:
    """Binary PPM (P6): 'P6' <w> <h> <maxval> then raw RGB. Pure parsing —
    the format exists precisely so tools can read images without codecs.
    Returns (HWC array, total bytes consumed) so PPM *streams* can be
    walked frame by frame."""
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("decode_image: 16-bit PPM not supported")
    pixels = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos + 1)
    return pixels.reshape(h, w, 3).copy(), pos + 1 + w * h * 3


def _decode_ppm(content: bytes) -> np.ndarray:
    return _parse_ppm(content)[0]


def _decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): bottom-up BGR rows padded
    to 4 bytes — fixed-layout struct parsing, no codec involved."""
    import struct

    data_offset = struct.unpack_from("<I", content, 10)[0]
    w, h = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"decode_image: only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        off = data_offset + r * row_bytes
        row = np.frombuffer(content, dtype=np.uint8, count=w * 3, offset=off)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR → RGB
    img = np.stack(rows[::-1] if bottom_up else rows)
    return img.copy()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (None/Sub/Up/Average/Paeth). ``raw``
    is h rows of (1 filter byte + stride pixel bytes). Sequential by
    specification (each row depends on the previous), vectorized within
    a row where the filter allows."""
    out = np.zeros((h, stride), dtype=np.int32)
    raw = raw.reshape(h, stride + 1)
    for r in range(h):
        ft, row = int(raw[r, 0]), raw[r, 1:].astype(np.int32)
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.int32)
        if ft == 0:  # None
            out[r] = row
        elif ft == 1:  # Sub
            acc = row.copy()
            for i in range(bpp, stride):
                acc[i] = (acc[i] + acc[i - bpp]) & 0xFF
            out[r] = acc
        elif ft == 2:  # Up
            out[r] = (row + prev) & 0xFF
        elif ft == 3:  # Average
            acc = row.copy()
            for i in range(stride):
                left = acc[i - bpp] if i >= bpp else 0
                acc[i] = (acc[i] + ((left + prev[i]) >> 1)) & 0xFF
            out[r] = acc
        elif ft == 4:  # Paeth
            acc = row.copy()
            for i in range(stride):
                a = acc[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                acc[i] = (acc[i] + pred) & 0xFF
            out[r] = acc
        else:
            raise NotImplementedError(f"decode_image: PNG filter type {ft}")
    return out.astype(np.uint8)


def _decode_png(content: bytes) -> np.ndarray:
    """Native PNG decode — pure stdlib (struct + zlib) + numpy: chunk walk,
    IDAT inflate, scanline unfilter, color-type expansion to RGB. Covers
    the overwhelmingly common web subset: bit depth 8, color types 0
    (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    non-interlaced. Alpha is dropped (features/resize want RGB planes);
    16-bit and Adam7-interlaced images raise for the Pillow fallback."""
    import struct
    import zlib

    pos = len(_PNG_MAGIC)
    idat, plte = b"", None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(content):
        (length,), ctag = struct.unpack_from(">I", content, pos), content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if ctag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctag == b"IDAT":
            idat += data
        elif ctag == b"IEND":
            break
    if w is None:
        raise NotImplementedError("decode_image: malformed PNG (no IHDR)")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"decode_image: PNG depth={depth} interlace={interlace} outside "
            "the native subset (8-bit non-interlaced) — needs Pillow"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"decode_image: PNG color type {ctype}")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise NotImplementedError("decode_image: malformed PNG (IDAT size)")
    img = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise NotImplementedError("decode_image: palette PNG missing PLTE")
        return plte[img[:, :, 0]].copy()
    if ctype == 0:
        return np.repeat(img, 3, axis=2).copy()
    if ctype == 4:
        return np.repeat(img[:, :, :1], 3, axis=2).copy()
    if ctype == 6:
        return img[:, :, :3].copy()
    return img.copy()


def _decode_with_pillow(content: bytes) -> np.ndarray | None:
    """Pillow-backed decode when the library is importable (the optional
    extra for jpeg/webp and exotic PNG subtypes); None when absent so the
    caller can raise the honest NotImplementedError."""
    try:
        from PIL import Image  # optional dependency, never required
    except ImportError:
        return None
    import io

    with Image.open(io.BytesIO(content)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8).copy()


def decode_image(content: bytes, fmt: str | None) -> np.ndarray:
    """Decode image bytes → HWC uint8 RGB array.

    Real pure-stdlib kernels for codec-less and stdlib-decodable formats:
    binary PPM, uncompressed 24-bit BMP, and 8-bit non-interlaced PNG
    (zlib inflate + scanline unfilter — see :func:`_decode_png`). Other
    formats (jpeg/webp, 16-bit/interlaced PNG) decode through Pillow WHEN
    it is importable (optional extra — not in the base environment) and
    raise ``NotImplementedError`` otherwise."""
    content = bytes(content)
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        try:
            return _decode_png(content)
        except NotImplementedError:
            via_pillow = _decode_with_pillow(content)
            if via_pillow is not None:
                return via_pillow
            raise
    via_pillow = _decode_with_pillow(content)
    if via_pillow is not None:
        return via_pillow
    raise NotImplementedError(
        f"decode_image: format {fmt!r} needs an image codec (Pillow/opencv) "
        "not present in this environment — PPM/BMP/8-bit-PNG decode natively"
    )


def decode_audio(content: bytes, fmt: str | None) -> np.ndarray:
    """Decode audio bytes → float32 waveform in [-1, 1] (mono: channels
    averaged). PCM WAV decodes natively via the stdlib ``wave`` module;
    compressed formats (mp3/flac/ogg) still raise — they need an audio
    library this environment lacks."""
    import io
    import wave

    if bytes(content[:4]) != b"RIFF":
        raise NotImplementedError(
            f"decode_audio: format {fmt!r} needs an audio codec "
            "(soundfile/torchaudio) not present in this environment — "
            "PCM WAV decodes natively"
        )
    with wave.open(io.BytesIO(bytes(content))) as wf:
        n_ch, width, n_frames = wf.getnchannels(), wf.getsampwidth(), wf.getnframes()
        raw = wf.readframes(n_frames)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype("float32") / 32768.0
    elif width == 1:  # unsigned 8-bit
        samples = (np.frombuffer(raw, dtype=np.uint8).astype("float32") - 128.0) / 128.0
    else:
        raise NotImplementedError(f"decode_audio: {8 * width}-bit PCM not supported")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples


def sample_video_frames(
    content: bytes, fmt: str | None, every_ms: int = 1000, fps: int = 25
) -> list[np.ndarray]:
    """Sample frames from a video byte stream at one frame per
    ``every_ms`` milliseconds.

    Real kernel for the codec-less case: a PPM-stream "video" (back-to-
    back binary P6 frames — the uncompressed interchange form tools like
    ffmpeg emit with ``-f image2pipe -vcodec ppm``), walked frame by
    frame with the native PPM parser. Container formats (mp4/webm/mkv)
    raise — they need ffmpeg/PyAV; swapping it in touches only the
    dispatch below, the sampling arithmetic and distributed plumbing are
    already exercised."""
    if bytes(content[:2]) != b"P6":
        raise NotImplementedError(
            f"sample_video_frames: container format {fmt!r} needs ffmpeg/PyAV "
            "not present in this environment — PPM streams decode natively"
        )
    frames: list[np.ndarray] = []
    data, pos, idx = bytes(content), 0, 0
    step = max(1, round(fps * every_ms / 1000))
    while pos < len(data) and data[pos : pos + 2] == b"P6":
        frame, consumed = _parse_ppm(data[pos:])
        pos += consumed
        if idx % step == 0:
            frames.append(frame)
        idx += 1
    return frames


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


def resize_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an HWC uint8 array — pure numpy index
    arithmetic, no codec involved. The standard thumbnail/normalize step
    before feature extraction or vision-model batching."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return img[rows][:, cols]


def encode_ppm(img: np.ndarray) -> bytes:
    """HWC uint8 RGB → binary PPM bytes (the codec-less interchange
    format :func:`decode_image` reads back)."""
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def resize_assets(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
) -> DataFrame:
    """Partition-parallel image normalization: decode → nearest-neighbor
    resize → re-encode (PPM), preserving every other column. Arrow batches
    via mapInPandas; assets whose format has no native decoder pass
    through unchanged (count them with a metadata filter upstream). The
    shape of every image-normalization stage — swap the kernel body for
    Pillow when codecs exist."""
    import pandas as pd

    out_schema = df.schema

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def _one(c):
                if c is None:
                    return c
                try:
                    img = decode_image(bytes(c), None)
                except NotImplementedError:
                    return c
                return bytearray(encode_ppm(resize_image(img, width, height)))

            pdf = pdf.copy()
            pdf[content_col] = [_one(c) for c in pdf[content_col]]
            yield pdf

    return df.mapInPandas(_batches, schema=out_schema)


FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame binary, width int, height int"


def sample_frames_assets(
    df: DataFrame,
    every_ms: int = 1000,
    fps: int = 25,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """Distributed frame sampling: one output row per sampled frame
    (id, ``frame_idx``, PPM-encoded ``frame``, width, height). Assets
    whose format has no native decoder are skipped (gate on them with a
    metadata filter if they must error instead). mapInPandas — the frame
    fan-out happens executor-side, the video bytes never move twice."""
    import pandas as pd

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "frame_idx": [], "frame": [], "width": [], "height": []}
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                try:
                    frames = sample_video_frames(bytes(content), None, every_ms, fps)
                except NotImplementedError:
                    continue
                for i, fr in enumerate(frames):
                    out["asset_id"].append(int(aid))
                    out["frame_idx"].append(i)
                    out["frame"].append(bytearray(encode_ppm(fr)))
                    out["width"].append(fr.shape[1])
                    out["height"].append(fr.shape[0])
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


def video_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    every_ms: int = 1000,
    fps: int = 25,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """Near-duplicate VIDEO detection — the multimodal sibling of text
    MinHash dedup: sample frames executor-side
    (:func:`sample_frames_assets`), fingerprint each frame (sha256 of
    its canonical PPM bytes — re-encodes, trims, and container changes
    that preserve pixels collide; any pixel change does not), then an
    exact set-Jaccard inverted-index join over the frame-hash sets
    (:func:`~mini_etl_spark.functions.dedup.set_jaccard_pairs`).

    Two videos sharing ≥ ``threshold`` of their sampled frames pair up —
    catches re-uploads, trims and concatenations of the same footage.
    The video bytes are decoded once and never shuffle: only 32-byte
    frame hashes enter the join, whose pair space is Σ df(frame)² (a
    frame shared by f videos costs f², hot frames capped). Returns
    (id_a, id_b, jaccard). Assets without a native decoder are skipped
    (same contract as the sampler); sensitivity to re-encoded pixels
    needs a perceptual kernel in the sampler — the plumbing is
    unchanged."""
    from pyspark.sql import functions as F

    from mini_etl_spark.functions.dedup import set_jaccard_pairs

    frames = sample_frames_assets(df, every_ms, fps, content_col, id_col)
    sigs = frames.groupBy("asset_id").agg(
        F.collect_set(F.sha2(F.col("frame"), 256)).alias("frame_sigs")
    )
    return set_jaccard_pairs(sigs, "frame_sigs", "asset_id", threshold)
