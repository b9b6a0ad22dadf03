"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested — schema, partition-friendly
batch iteration (``mapInPandas``: Arrow batches, no per-row Python), UDF
signatures, deterministic output — while the actual media decode is stubbed:
this container ships no image/audio libraries, so decode attempts either use
an import-gated real path (PIL/soundfile if ever present) or a clearly
deterministic fake derived from the bytes, and ``strict=True`` raises
``NotImplementedError`` to mark the boundary.

Design for 100 TB: media bytes never leave the executor (no collect); each
transform is a single ``mapInPandas`` pass whose output is narrow metadata,
so downstream shuffles move kilobytes per item, not the media itself.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), True),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def _try_real_image_decode(data: bytes):
    try:
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(data))
        return img.width, img.height, len(img.getbands()), "pil"
    except ImportError:
        return None
    except Exception:
        return (0, 0, 0, "corrupt")


def _fake_dims(data: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real decoder: pseudo-dimensions from the
    content hash. STUB — not real pixel data."""
    h = hashlib.sha256(data).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4, "fake-deterministic")


def image_features(
    df: DataFrame,
    id_col: str = "item_id",
    bin_col: str = "content",
    strict: bool = False,
) -> DataFrame:
    """Per-item image metadata via one Arrow-batched pass.

    ``strict=True``: raise NotImplementedError when no real decoder exists
    (the honest mode); default: deterministic fake dims, real byte stats.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                real = _try_real_image_decode(data) if data else (0, 0, 0, "empty")
                if real is None:
                    if strict:
                        raise NotImplementedError(
                            "no image decoder available in this environment; "
                            "install PIL or run with strict=False"
                        )
                    real = _fake_dims(data)
                w, h, c, decoder = real
                out.append(
                    (
                        item_id,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        w,
                        h,
                        c,
                        decoder,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(op, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("resized_bytes", T.BinaryType(), True),
        T.StructField("resized_sha256", T.StringType(), True),
        T.StructField("resizer", T.StringType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "item_id",
    bin_col: str = "content",
    strict: bool = False,
) -> DataFrame:
    """Resize plumbing (binary in -> binary out, fixed target dims).

    Real implementation needs an image lib; this environment has none, so
    the transform is STUBBED deterministically: output bytes are a
    content-derived sample of the input sized to width*height/64 (so batch
    shapes, Arrow transfer, and downstream hashing are all real).
    ``strict=True`` raises NotImplementedError instead (the honest mode)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                if _try_real_image_decode(data) is None and strict:
                    raise NotImplementedError(
                        "no image decoder in this environment; strict=False "
                        "uses the deterministic stub"
                    )
                n_out = max(1, (width * height) // 64)
                # deterministic fake resample: cycle the source bytes
                fake = (data * (n_out // max(1, len(data)) + 1))[:n_out] if data else b""
                rows.append(
                    (
                        item_id,
                        width,
                        height,
                        fake,
                        hashlib.sha256(fake).hexdigest(),
                        "fake-cycle" if data else "empty",
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.select(id_col, bin_col).mapInPandas(op, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("est_duration_ms", T.LongType(), True),
        T.StructField("rms_proxy", T.DoubleType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def audio_features(
    df: DataFrame,
    bytes_per_ms: int = 32,
    id_col: str = "item_id",
    bin_col: str = "content",
) -> DataFrame:
    """Audio metadata plumbing: duration estimate from byte length at an
    assumed bitrate and an 'RMS' computed over the raw bytes as a stand-in
    signal (STUB — a real impl decodes PCM with an audio lib). The Spark
    side — schema, batching, vectorized numpy per batch — is real."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                if data:
                    arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                    rms = float(np.sqrt(np.mean((arr - 128.0) ** 2)))
                else:
                    rms = 0.0
                rows.append(
                    (
                        item_id,
                        len(data),
                        len(data) // bytes_per_ms,
                        round(rms, 6),
                        hashlib.sha256(data).hexdigest(),
                        "fake-bytes" if data else "empty",
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(op, AUDIO_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 4096,
    max_frames: int = 8,
    id_col: str = "item_id",
    bin_col: str = "content",
) -> DataFrame:
    """'Video' frame sampling stub: real plumbing (one binary in, N binary
    frames out, fan-out inside mapInPandas), fake frame boundaries (fixed
    byte stride — a real impl would keyframe-split with a media lib)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        (item_id, i, hashlib.sha256(chunk).hexdigest(), chunk)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(op, FRAME_SAMPLE_SCHEMA)


def as_binary_items(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Adapter: treat any string/binary column as an opaque media item
    (id, content binary, typed metadata)."""
    c = F.col(payload_col)
    content = c.cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("item_id"),
        content.alias("content"),
        F.struct(
            F.length(c).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
