"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Real, dependency-free decoders for the canonical container formats whose
specs are public and header-parseable with numpy alone:

- **BMP** (24-bpp uncompressed BITMAPINFOHEADER): full decode to a pixel
  array — width/height/channel extraction, bottom-up row order, 4-byte row
  padding — plus a nearest-neighbor resize + re-encode path.
- **WAV** (RIFF PCM16): chunk walk to the ``fmt ``/``data`` chunks, sample
  rate/bit-depth/channel extraction, and real RMS over the int16 samples.
- **VID0** (a simple length-prefixed frame container of BMP frames, defined
  here): real frame-boundary parsing + per-frame BMP decode.

Formats outside these (JPEG/PNG/MP3/...) need codec libraries this
container doesn't ship; those fall back to an import-gated PIL path, then
to a clearly-labeled deterministic fake (``decoder='fake-deterministic'``),
and ``strict=True`` raises ``NotImplementedError`` at that boundary.

Design for 100 TB: media bytes never leave the executor (no collect); each
transform is a single ``mapInPandas`` pass whose output is narrow metadata,
so downstream shuffles move kilobytes per item, not the media itself.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# ---------------------------------------------------------------------------
# Dependency-free codecs (public file formats, numpy only)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a 24-bpp uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, 4-byte padding)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) // 4 * 4
    data_size = row_size * h
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # BMP stores BGR bottom-up; our in-memory convention is RGB top-down
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + data_size, 0, 0, 54,
        40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0,
    )
    return header + rows.tobytes()


def decode_bmp(data: bytes):
    """Parse a 24-bpp uncompressed BMP. Returns (width, height, channels,
    pixels (h, w, 3) uint8 top-down RGB) or None when not such a BMP."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    data_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    if data_offset + row_size * h > len(data):
        return None
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        px = px[::-1]
    return w, h, 3, np.ascontiguousarray(px)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode an int16 mono sample array as a canonical RIFF/WAVE PCM file."""
    raw = samples.astype("<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(raw), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(raw))
        + raw
    )


def decode_wav(data: bytes):
    """Walk RIFF chunks of a PCM WAV. Returns (sample_rate, bits, channels,
    samples int16 array) or None when not PCM16 WAV."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        return None
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        return None
    samples = np.frombuffer(pcm, dtype="<i2")
    return rate, bits, channels, samples


VIDEO_MAGIC = b"VID0"


def encode_video(frames: list[bytes]) -> bytes:
    """Length-prefixed frame container: ``VID0 | u32 n | (u32 len | frame)*``."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_video(data: bytes):
    """Parse a VID0 container into its frame byte-slices, or None."""
    if len(data) < 8 or data[:4] != VIDEO_MAGIC:
        return None
    (n,) = struct.unpack_from("<I", data, 4)
    pos, frames = 8, []
    for _ in range(n):
        if pos + 4 > len(data):
            return None
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + ln > len(data):
            return None
        frames.append(data[pos : pos + ln])
        pos += ln
    return frames


# ---------------------------------------------------------------------------
# Deterministic fixture synthesizers (media generated from row ids, so the
# decoded header fields are SQL-derivable — the correctness oracle)
# ---------------------------------------------------------------------------

ITEM_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _synth_bmp_bytes(i: int) -> bytes:
    """Canonical fixture BMP for id ``i``: w=4+i%16, h=4+(i//16)%16,
    gray row value (i+y)%256 — every field SQL-derivable from ``i``."""
    w, h = 4 + i % 16, 4 + (i // 16) % 16
    v = (np.arange(h, dtype=np.int64) + i) % 256
    px = np.broadcast_to(
        v.astype(np.uint8)[:, None, None], (h, w, 3)
    )
    return encode_bmp(np.ascontiguousarray(px))


def _synth_wav_bytes(i: int) -> bytes:
    """Fixture WAV for id ``i``: n=64+i%128 samples at 8 kHz,
    sample[s] = (((i + 7*s) % 256) - 128) * 64."""
    n = 64 + i % 128
    s = np.arange(n, dtype=np.int64)
    samples = (((i + 7 * s) % 256) - 128) * 64
    return encode_wav(samples.astype(np.int16))


def _synth_video_bytes(i: int) -> bytes:
    """Fixture video for id ``i``: 2+i%4 BMP frames, frame f sized
    w=4+(i+f)%8, h=4+(i*3+f)%8, gray row value (i+f+y)%256."""
    frames = []
    for f in range(2 + i % 4):
        w, h = 4 + (i + f) % 8, 4 + (i * 3 + f) % 8
        v = (np.arange(h, dtype=np.int64) + i + f) % 256
        px = np.broadcast_to(v.astype(np.uint8)[:, None, None], (h, w, 3))
        frames.append(encode_bmp(np.ascontiguousarray(px)))
    return encode_video(frames)


def _synthesize(df: DataFrame, id_col: str, make: "callable") -> DataFrame:
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"item_id": ids, "content": [make(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(op, ITEM_SCHEMA)


def synthesize_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One real BMP per row, deterministically derived from the id."""
    return _synthesize(df, id_col, _synth_bmp_bytes)


def synthesize_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One real PCM16 WAV per row, deterministically derived from the id."""
    return _synthesize(df, id_col, _synth_wav_bytes)


def synthesize_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One VID0 container of BMP frames per row, derived from the id."""
    return _synthesize(df, id_col, _synth_video_bytes)


def _ahash_plan_bits(i: int) -> "np.ndarray":
    """Planned 64-bit aHash pattern for near-dup fixture id ``i``: base
    bits are the md5 digit parities of the GROUP id (g = i//4, digits of
    md5(str(g)) then md5('x:'+str(g)), >= '8' means 1); the member
    j = i%4 flips bits at positions g%61 .. g%61+j-1 (distinct, no mod-64
    wrap since g%61 <= 60 and j <= 3)."""
    g, j = i // 4, i % 4
    digits = (
        hashlib.md5(str(g).encode()).hexdigest()
        + hashlib.md5(f"x:{g}".encode()).hexdigest()
    )
    bits = np.array([int(d, 16) >= 8 for d in digits[:64]], dtype=np.uint8)
    p = g % 61
    bits[p : p + j] ^= 1
    return bits


def _synth_near_dup_bmp_bytes(i: int) -> bytes:
    """8x8 BMP whose aHash is exactly :func:`_ahash_plan_bits`: pixel
    (x, y) gray is 255*bit[y*8+x] (downsample is the identity on 8x8, and
    the integer mean threshold passes a {0,255} pattern through)."""
    bits = _ahash_plan_bits(i)
    px = np.repeat(
        (bits * np.uint8(255)).reshape(8, 8)[:, :, None], 3, axis=2
    )
    return encode_bmp(np.ascontiguousarray(px))


def synthesize_near_dup_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Visual NEAR-duplicate fixtures (the perceptual-hash use case: the
    same image re-encoded or slightly edited, not byte-identical): ids in
    a group of 4 share an md5-derived base pattern and differ pairwise by
    |j_a - j_b| <= 3 hash bits, so every within-group pair is a banded-
    hamming hit; cross-group patterns differ by ~32 bits.  All formulas
    are closed-form SQL-replayable for the correctness oracle."""
    return _synthesize(df, id_col, _synth_near_dup_bmp_bytes)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_n_bytes", T.LongType(), True),
        T.StructField("frame_width", T.IntegerType(), True),
        T.StructField("frame_height", T.IntegerType(), True),
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

    Decode order: real BMP parser (dependency-free, this module) → PIL if
    installed → deterministic fake dims.  ``pixel_sum`` is the exact sum of
    all decoded pixel bytes (null when no real decode happened) — a
    byte-level integrity check the SQL oracle can recompute.
    ``strict=True``: raise NotImplementedError instead of faking."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                px_sum = None
                if not data:
                    real = (0, 0, 0, "empty")
                else:
                    bmp = decode_bmp(data)
                    if bmp is not None:
                        w0, h0, c0, px = bmp
                        px_sum = int(px.astype(np.int64).sum())
                        real = (w0, h0, c0, "bmp")
                    else:
                        real = _try_real_image_decode(data)
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
                        px_sum,
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
        T.StructField("out_n_bytes", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
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
    """Resize binary images to fixed target dims (binary in -> binary out).

    BMP inputs get a REAL nearest-neighbor resize: decode to a pixel array,
    index-map ``src = (dst * src_dim) // dst_dim`` in both axes with numpy,
    re-encode as BMP.  ``pixel_sum`` is the exact sum of resized pixel
    bytes (SQL-derivable for fixture images).  Non-BMP inputs fall back to
    the deterministic byte-cycle stub (``resizer='fake-cycle'``) unless
    ``strict=True``, which raises at that boundary."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                bmp = decode_bmp(data) if data else None
                if bmp is not None:
                    w0, h0, _, px = bmp
                    xs = (np.arange(width, dtype=np.int64) * w0) // width
                    ys = (np.arange(height, dtype=np.int64) * h0) // height
                    out_px = np.ascontiguousarray(px[ys][:, xs])
                    enc = encode_bmp(out_px)
                    rows.append(
                        (
                            item_id,
                            width,
                            height,
                            len(enc),
                            int(out_px.astype(np.int64).sum()),
                            enc,
                            hashlib.sha256(enc).hexdigest(),
                            "bmp-nn",
                        )
                    )
                    continue
                if data and strict:
                    raise NotImplementedError(
                        "no decoder for this format in this environment; "
                        "strict=False uses the deterministic stub"
                    )
                n_out = max(1, (width * height) // 64)
                # deterministic fake resample: cycle the source bytes
                fake = (data * (n_out // max(1, len(data)) + 1))[:n_out] if data else b""
                rows.append(
                    (
                        item_id,
                        width,
                        height,
                        len(fake),
                        None,
                        fake,
                        hashlib.sha256(fake).hexdigest(),
                        "fake-cycle" if data else "empty",
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.select(id_col, bin_col).mapInPandas(op, RESIZE_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("ahash_hex", T.StringType(), True),
        T.StructField("band0", T.IntegerType(), True),
        T.StructField("band1", T.IntegerType(), True),
        T.StructField("band2", T.IntegerType(), True),
        T.StructField("band3", T.IntegerType(), True),
        T.StructField("hasher", T.StringType(), True),
    ]
)


def image_ahash(
    df: DataFrame,
    id_col: str = "item_id",
    bin_col: str = "content",
    strict: bool = False,
) -> DataFrame:
    """Perceptual average-hash (aHash) per image in one Arrow-batched pass
    — the standard visual-duplicate key (identical or near-identical
    renderings collide; format/size/re-encode differences don't).

    BMP inputs get the REAL pipeline: decode, true 8x8 nearest-neighbor
    downsample (same index map as :func:`resize_images`), integer
    grayscale ``(r+g+b)//3``, then bit ``j`` = 1 iff
    ``64*gray_j >= sum(gray)`` — an integer-exact mean threshold (ties
    high) a SQL oracle can replay closed-form for fixture images.  The 64
    bits pack row-major MSB-first into ``ahash_hex`` (16 hex chars) plus
    four 16-bit band ints for LSH-style banded joins (hamming <= 3 between
    two hashes guarantees at least one equal band, by pigeonhole).

    Non-BMP content falls back to a clearly-labeled deterministic fake
    (sha256-derived, ``hasher='fake-deterministic'``) unless ``strict``.

    100-TB shape: media bytes stay executor-side; output is 9 narrow
    columns, so the dedup groupBy/band-join downstream shuffles ~40 bytes
    per image regardless of media size.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                bmp = decode_bmp(data) if data else None
                if bmp is not None:
                    w0, h0, _, px = bmp
                    xs = (np.arange(8, dtype=np.int64) * w0) // 8
                    ys = (np.arange(8, dtype=np.int64) * h0) // 8
                    gray = px[ys][:, xs].astype(np.int64).sum(axis=2) // 3
                    total = int(gray.sum())
                    bits = (64 * gray.reshape(-1) >= total).astype(np.uint8)
                    packed = np.packbits(bits).tobytes()
                    bands = [
                        int.from_bytes(packed[2 * k : 2 * k + 2], "big")
                        for k in range(4)
                    ]
                    out.append(
                        (item_id, w0, h0, packed.hex(), *bands, "bmp-ahash")
                    )
                    continue
                if data and strict:
                    raise NotImplementedError(
                        "no image decoder available in this environment; "
                        "install PIL or run with strict=False"
                    )
                dg = hashlib.sha256(data).digest()[:8]
                bands = [
                    int.from_bytes(dg[2 * k : 2 * k + 2], "big") for k in range(4)
                ]
                out.append(
                    (
                        item_id,
                        None,
                        None,
                        dg.hex(),
                        *bands,
                        "fake-deterministic" if data else "empty",
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in AHASH_SCHEMA.fields])

    return df.select(id_col, bin_col).mapInPandas(op, AHASH_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("est_duration_ms", T.LongType(), True),
        T.StructField("rms_proxy", T.DoubleType(), True),
        T.StructField("sumsq", T.LongType(), True),
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
    """Per-item audio metadata via one Arrow-batched pass.

    RIFF/WAVE PCM16 inputs get a REAL decode (chunk walk in this module):
    sample rate / sample count from the headers, duration from
    ``n_samples * 1000 // rate``, RMS over the int16 samples, and ``sumsq``
    — the exact integer sum of squared samples, which a SQL oracle can
    recompute for fixture audio.  Other formats fall back to the documented
    byte-proxy stub (``decoder='fake-bytes'``)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                wav = decode_wav(data) if data else None
                if wav is not None:
                    rate, _bits, _ch, samples = wav
                    s = samples.astype(np.int64)
                    sumsq = int((s * s).sum())
                    n = len(s)
                    rms = float(np.sqrt(sumsq / n)) if n else 0.0
                    rows.append(
                        (
                            item_id,
                            len(data),
                            rate,
                            n,
                            n * 1000 // rate if rate else 0,
                            round(rms, 6),
                            sumsq,
                            hashlib.sha256(data).hexdigest(),
                            "wav",
                        )
                    )
                    continue
                if data:
                    arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                    rms = float(np.sqrt(np.mean((arr - 128.0) ** 2)))
                else:
                    rms = 0.0
                rows.append(
                    (
                        item_id,
                        len(data),
                        None,
                        None,
                        len(data) // bytes_per_ms,
                        round(rms, 6),
                        None,
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
    every_n_frames: int = 1,
) -> DataFrame:
    """Video frame sampling (one binary in, N binary frames out, fan-out
    inside one ``mapInPandas`` pass).

    VID0 containers (``encode_video``) get REAL frame-boundary parsing:
    the length-prefixed frame table is walked, every ``every_n_frames``-th
    frame (up to ``max_frames``) is emitted with its true byte length, and
    BMP frames are header-decoded for ``frame_width``/``frame_height``.
    Other inputs fall back to the fixed byte-stride split (the documented
    keyframe-less stub; width/height null)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                frames = decode_video(data) if data else None
                if frames is not None:
                    emitted = 0
                    for i, chunk in enumerate(frames):
                        if i % every_n_frames or emitted >= max_frames:
                            continue
                        emitted += 1
                        bmp = decode_bmp(chunk)
                        w, h = (bmp[0], bmp[1]) if bmp is not None else (None, None)
                        rows.append(
                            (
                                item_id,
                                i,
                                len(chunk),
                                w,
                                h,
                                hashlib.sha256(chunk).hexdigest(),
                                chunk,
                            )
                        )
                    continue
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        (
                            item_id,
                            i,
                            len(chunk),
                            None,
                            None,
                            hashlib.sha256(chunk).hexdigest(),
                            chunk,
                        )
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


def keyframe_select(
    df: DataFrame,
    k: int = 3,
    id_col: str = "item_id",
    bin_col: str = "content",
) -> DataFrame:
    """Key-frame selection by inter-frame change — the deterministic
    pixel-delta baseline of shot-boundary detection (frame i scores
    the exact integer SUM of absolute per-pixel deltas vs frame i-1;
    no codec, no floats).  Frame 0 is always a keyframe (rank 1, the
    shot opener); the remaining ``k - 1`` slots go to the largest
    deltas, ties to the earlier frame.

    Selection happens entirely INSIDE one Arrow ``mapInPandas`` pass —
    frames of one container never leave their batch, media bytes never
    shuffle (the multimodal scale rule).  Non-VID0 or undecodable
    content yields no rows.  Frames whose dimensions differ from their
    predecessor score the sum of BOTH frames' pixel mass (maximal
    change — a hard cut to a new geometry).

    Returns ``(item_id, frame_index, rank, change_score, frame_sha256,
    frame)``.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data) if data is not None else b""
                frames = decode_video(data) if data else None
                if not frames:
                    continue
                decoded = [decode_bmp(fr) for fr in frames]
                scored = []  # (score, index)
                prev = None
                for i, dec in enumerate(decoded):
                    px = dec[3].astype(np.int64) if dec is not None else None
                    if i == 0:
                        scored.append((None, 0))  # always selected
                    elif px is None or prev is None:
                        scored.append((0, i))
                    elif px.shape != prev.shape:
                        scored.append((int(px.sum() + prev.sum()), i))
                    else:
                        scored.append((int(np.abs(px - prev).sum()), i))
                    prev = px if px is not None else prev
                rest = sorted(
                    (s for s in scored[1:]), key=lambda t: (-t[0], t[1])
                )[: max(0, k - 1)]
                picks = [scored[0]] + rest
                for rank, (score, i) in enumerate(picks, start=1):
                    chunk = frames[i]
                    rows.append(
                        (
                            item_id,
                            i,
                            rank,
                            score if score is not None else 0,
                            hashlib.sha256(chunk).hexdigest(),
                            chunk,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id", "frame_index", "rank", "change_score",
                    "frame_sha256", "frame",
                ],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(bin_col).alias(bin_col)
    ).mapInPandas(
        op,
        schema=(
            "item_id long, frame_index int, rank int, change_score long, "
            "frame_sha256 string, frame binary"
        ),
    )
