"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

Decoded FOR REAL in pure numpy: BMP (24-bit uncompressed) and WAV (PCM16)
parse the actual on-disk layout (header validation, bottom-up BGR rows,
little-endian samples); baseline AND progressive JPEG go through a full
multi-scan bitstream decoder (operators/jpeg.py: DQT/DHT/SOF/SOS parse,
Huffman, spectral-selection + successive-approximation scans, dequantize,
IDCT, 3-component YCbCr, sampling factors, restart markers); and PNG goes
through a full container + from-scratch RFC 1951 inflate + unfilter path
(operators/png.py: 8-bit gray/GA/RGB/RGBA/palette, stored/fixed/
dynamic-Huffman blocks); and animated GIF — the multi-frame "video"
container — through a from-scratch variable-width LZW + frame-composition
decoder (operators/gif.py: sub-block framing, dictionary growth/clear,
KwKwK, interlacing, left/top sub-rectangle composition). Codecs this
container genuinely cannot handle
(interlaced PNG, MP3, real video codecs) are STUBBED behind NotImplementedError
— with ``fake_decode`` as the deterministic stand-in so the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) stays real and
tested either way. Swapping in Pillow/torchaudio later only replaces the
per-batch kernel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


# ---------------------------------------------------------------------------
# real decoders: BMP 24-bit uncompressed, WAV PCM16 — pure numpy
# ---------------------------------------------------------------------------

import struct


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 BGR pixel array → uncompressed 24-bit BMP bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, 4-byte row
    stride)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1].reshape(h, w * 3)  # bottom-up
    return header + rows.tobytes()


def decode_bmp24(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → (h, w, 3) uint8 BGR array. Validates
    magic, bit depth, and compression — a real parse of the on-disk layout,
    not a stub."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp}, comp={comp})")
    stride = (w * 3 + 3) & ~3
    flipped = h > 0
    h = abs(h)
    body = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1] if flipped else rows


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 sample array → RIFF/WAVE PCM16 mono bytes."""
    assert samples.dtype == np.int16
    body = samples.astype("<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(body), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", len(body))
        + body
    )


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → (int16 samples, sample rate). Walks the chunk
    list (fmt / data) like a real parser."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            fmt, _ch, rate = struct.unpack_from("<HHI", data, pos)
            if fmt != 1:
                raise NotImplementedError(f"only PCM WAV (got format {fmt})")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=pos)
        pos += size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples.astype(np.int16), rate


def decode_media(data: bytes, media_type: str):
    """Decode entry point: real pure-numpy parsers for the formats this
    environment can handle — uncompressed BMP24/WAV-PCM16, baseline +
    progressive JPEG (operators/jpeg.py: multi-scan decoder incl.
    3-component YCbCr, sampling factors, restart markers, Annex-G
    progressive scans), PNG (operators/png.py: full chunk/zlib/RFC 1951
    inflate/unfilter path, 8-bit gray/GA/RGB/RGBA/palette) and animated GIF
    (operators/gif.py: variable-width LZW, frame composition, interlacing —
    the multi-frame "video" container). MP3 / real video codecs /
    interlaced PNG still raise (they need external codec libraries — swap
    in Pillow/ffmpeg where available)."""
    if media_type == "bmp":
        return decode_bmp24(data)
    if media_type == "wav":
        return decode_wav_pcm16(data)
    if media_type in ("jpeg", "jpg"):
        from .jpeg import decode_baseline

        return decode_baseline(data)
    if media_type == "png":
        from .png import decode_png

        return decode_png(data)
    if media_type == "gif":
        from .gif import decode_gif

        return decode_gif(data)
    raise NotImplementedError(
        f"decoding {media_type!r} requires external codec libraries "
        "(Pillow / ffmpeg / torchaudio); use fake_decode for plumbing tests"
    )


def fake_decode(data: bytes, media_type: str, feat_dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256 of the payload seeds
    a fixed-size float vector. Same batch shape/dtype a real extractor has."""
    digest = hashlib.sha256(data).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(feat_dim).astype(np.float32)


def cycle_bytes(text: str | None, n: int) -> np.ndarray:
    """utf-8 bytes of `text` cycled/truncated to exactly n bytes (empty →
    zeros) — the deterministic payload synthesizer for multimodal tests."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if b.size == 0:
        return np.zeros(n, dtype=np.uint8)
    return np.resize(b, n)


def raw_payload_udf(n_bytes: int):
    """pandas UDF: text → its utf-8 bytes cycled to n_bytes (an opaque
    'video' payload for the frame-sampling path)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _raw(texts: pd.Series) -> pd.Series:
        return pd.Series([cycle_bytes(t, n_bytes).tobytes() for t in texts])

    return _raw


def bmp_payload_udf(w: int, h: int):
    """pandas UDF: text → uncompressed 24-bit BMP whose pixel bytes are the
    text's utf-8 bytes cycled to fill w×h×3 — the deterministic image
    synthesizer for the oracle-checked decode path."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _bmp(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_bmp24(cycle_bytes(t, w * h * 3).reshape(h, w, 3)) for t in texts]
        )

    return _bmp


def jpeg_payload_udf(w_blocks: int, h_blocks: int):
    """pandas UDF: text → baseline JPEG of a BLOCK-CONSTANT grayscale image
    (8×8 block (i,j) filled with the (i·w+j)-th cycled text byte), encoded
    with an all-ones quantization table. Flat blocks have zero AC energy and
    an integral DC term, so the decode (operators/jpeg.py) is EXACT — which
    is what lets a SQL oracle value-check a lossy-format codec path
    end-to-end: the oracle recomputes the block values straight from the
    text bytes."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .jpeg import encode_gray_baseline

    ones = np.ones((8, 8), dtype=np.int64)

    @pandas_udf(BinaryType())
    def _jpg(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            vals = cycle_bytes(t, w_blocks * h_blocks).reshape(h_blocks, w_blocks)
            img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
            out.append(encode_gray_baseline(img, quant=ones))
        return pd.Series(out)

    return _jpg


def jpeg_progressive_payload_udf(w_blocks: int, h_blocks: int):
    """pandas UDF: text → PROGRESSIVE (SOF2) JPEG of the same block-constant
    grayscale image as jpeg_payload_udf — six scans (DC first + refinement,
    two spectral AC bands first + refinement, successive approximation
    Al=1). Identical quantized coefficients to the baseline encoding, so the
    same lossless oracle contract holds and the decode exercises the whole
    T.81 Annex-G multi-scan path."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .jpeg import encode_gray_progressive

    ones = np.ones((8, 8), dtype=np.int64)

    @pandas_udf(BinaryType())
    def _jpg(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            vals = cycle_bytes(t, w_blocks * h_blocks).reshape(h_blocks, w_blocks)
            img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
            out.append(encode_gray_progressive(img, quant=ones, al=1))
        return pd.Series(out)

    return _jpg


JPEG_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_px", DoubleType()),
        StructField("min_px", LongType()),
        StructField("max_px", LongType()),
    ]
)


def _gray_stats(
    df: DataFrame, media_type: str, media_col: str, id_col: str
) -> DataFrame:
    """mapInPandas: REAL codec decode → grayscale image stats. With
    power-of-two pixel counts the integer-sum/count divisions are exact
    doubles — oracle-comparable."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def _f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, data in zip(pdf["doc_id"], pdf["media"]):
                img = decode_media(bytes(data), media_type)
                s = img.astype(np.int64)
                out.append(
                    (
                        did,
                        img.shape[1],
                        img.shape[0],
                        s.sum() / float(s.size),
                        int(s.min()),
                        int(s.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "mean_px", "min_px", "max_px"],
            )

    return src.mapInPandas(_f, JPEG_FEATURES_SCHEMA)


def jpeg_gray_stats(
    df: DataFrame, media_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Baseline-JPEG decode (full SOF0 bitstream: Huffman, dequantize,
    IDCT) → image stats."""
    return _gray_stats(df, "jpeg", media_col, id_col)


def png_payload_udf(w: int, h: int):
    """pandas UDF: text → PNG of a w×h grayscale image whose pixel (r, c)
    is the (r·w + c)-th cycled text byte. PNG is LOSSLESS (stored-block
    zlib, filter 0 — operators/png.py), so unlike the block-constant JPEG
    construction no structural restriction is needed for the oracle: any
    byte pattern round-trips exactly."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .png import encode_png

    @pandas_udf(BinaryType())
    def _png(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_png(cycle_bytes(t, w * h).reshape(h, w)) for t in texts]
        )

    return _png


def png_gray_stats(
    df: DataFrame, media_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """PNG decode (full chunk/zlib/inflate/unfilter path) → image stats."""
    return _gray_stats(df, "png", media_col, id_col)


# deterministic 256-entry palette the SQL oracle can recompute per index i:
# (r, g, b) = (i, (7·i) mod 256, 255 − i)
def _oracle_palette() -> np.ndarray:
    i = np.arange(256)
    return np.stack([i, (7 * i) % 256, 255 - i], axis=1).astype(np.uint8)


def png_palette_payload_udf(w: int, h: int):
    """pandas UDF: text → indexed-color (type 3) PNG whose pixel (r, c)
    INDEX is the (r·w + c)-th cycled text byte, resolved through the fixed
    oracle palette. Exercises the PLTE chunk + index→RGB decode path."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .png import encode_png_palette

    pal = _oracle_palette()

    @pandas_udf(BinaryType())
    def _png(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_png_palette(cycle_bytes(t, w * h).reshape(h, w), pal)
                for t in texts
            ]
        )

    return _png


PNG_PALETTE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("min_px", LongType()),
        StructField("max_px", LongType()),
    ]
)


def png_palette_stats(
    df: DataFrame, media_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Palette-PNG decode (PLTE lookup → RGB) → per-channel integer sums +
    global min/max. Integer outputs only, so the DuckDB oracle compares
    exactly with no float-division parity concerns."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def _f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import decode_png

        for pdf in batches:
            out = []
            for did, data in zip(pdf["doc_id"], pdf["media"]):
                img = decode_png(bytes(data)).astype(np.int64)  # (h, w, 3)
                out.append(
                    (
                        did,
                        img.shape[1],
                        img.shape[0],
                        int(img[:, :, 0].sum()),
                        int(img[:, :, 1].sum()),
                        int(img[:, :, 2].sum()),
                        int(img.min()),
                        int(img.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height",
                    "sum_r", "sum_g", "sum_b", "min_px", "max_px",
                ],
            )

    return src.mapInPandas(_f, PNG_PALETTE_SCHEMA)


def wav_payload_udf(n_samples: int, rate: int = 16000):
    """pandas UDF: text → PCM16 WAV whose samples are the text's utf-8 bytes
    cycled to 2·n_samples and viewed as little-endian int16."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _wav(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_wav_pcm16(
                    cycle_bytes(t, 2 * n_samples).view("<i2").astype("int16"), rate
                )
                for t in texts
            ]
        )

    return _wav


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mean_b", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_r", DoubleType()),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mean_amp", DoubleType()),
        StructField("energy", DoubleType()),
    ]
)


def image_channel_means(
    df: DataFrame, media_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas: decode each BMP payload (real parse) → per-channel pixel
    means (BGR). Means of ≤ 2^16 uint8 values divided by a power-of-two pixel
    count are exact doubles — oracle-comparable without rounding."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def _f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, data in zip(pdf["doc_id"], pdf["media"]):
                img = decode_bmp24(bytes(data))
                m = img.reshape(-1, 3).astype(np.int64).sum(axis=0) / float(
                    img.shape[0] * img.shape[1]
                )
                out.append((did, m[0], m[1], m[2]))
            yield pd.DataFrame(
                out, columns=["doc_id", "mean_b", "mean_g", "mean_r"]
            )

    return src.mapInPandas(_f, IMAGE_FEATURES_SCHEMA)


def audio_stats(
    df: DataFrame, media_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas: decode each WAV payload (real parse) → mean amplitude and
    mean energy over the int16 samples (integer sums / power-of-two counts —
    exact doubles)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def _f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, data in zip(pdf["doc_id"], pdf["media"]):
                samples, _rate = decode_wav_pcm16(bytes(data))
                s = samples.astype(np.int64)
                n = max(len(s), 1)
                out.append((did, s.sum() / float(n), (s * s).sum() / float(n)))
            yield pd.DataFrame(out, columns=["doc_id", "mean_amp", "energy"])

    return src.mapInPandas(_f, AUDIO_FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_binary_frames(
    df: DataFrame,
    media_col: str = "payload",
    id_col: str = "doc_id",
    frame_size: int = 256,
    every: int = 4,
) -> DataFrame:
    """Frame sampling over an opaque binary payload (the video-style access
    pattern: fixed-size frames, keep every k-th): mapInPandas emits
    (doc_id, frame_idx, frame_sha) for frames 0, every, 2·every, … — payloads
    stay inside Arrow record batches; only sampled frames are hashed.
    A real codec would replace the fixed-stride slicing with keyframe
    offsets; the partitioning/batching shape is identical."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def _f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, data in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(data) if data is not None else b""
                n_frames = len(payload) // frame_size
                for idx in range(0, n_frames, every):
                    frame = payload[idx * frame_size : (idx + 1) * frame_size]
                    out.append((did, idx, hashlib.sha256(frame).hexdigest()))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_sha"])

    return src.mapInPandas(_f, FRAME_SCHEMA)


def extract_media_features(
    df: DataFrame,
    media_col: str = "html",
    url_col: str = "url",
    media_type: str = "html",
    feat_dim: int = 8,
    decoder=fake_decode,
) -> DataFrame:
    """mapInPandas over (url, binary) → MEDIA_META_SCHEMA rows. Binary
    payloads stay inside Arrow record batches end-to-end; keep
    spark.sql.execution.arrow.maxRecordsPerBatch small if payloads are
    multi-MB so batches fit executor memory."""
    src = df.select(
        F.col(url_col).alias("url"), F.col(media_col).alias("media")
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf["url"], pdf["media"]):
                payload = bytes(data) if data is not None else b""
                rows.append(
                    {
                        "url": url,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "media_type": media_type,
                        "feature": decoder(payload, media_type, feat_dim),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA])

    return src.mapInPandas(_extract, MEDIA_META_SCHEMA)


def gif_payload_udf(w: int, h: int, n_frames: int, interlace: bool = True):
    """pandas UDF: text → ANIMATED GIF89a of n_frames w×h indexed frames;
    frame f's pixel (r, c) INDEX is cycled text byte (f·w·h + r·w + c),
    resolved through the fixed oracle palette. Real LZW compression
    (operators/gif.py); interlace=True routes every frame through the
    4-pass row ordering so the decoder's deinterlacer is on the hot path."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .gif import encode_gif

    pal = _oracle_palette()
    npx = w * h

    @pandas_udf(BinaryType())
    def _gif(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            px = cycle_bytes(t, n_frames * npx)
            frames = [
                px[f * npx : (f + 1) * npx].reshape(h, w)
                for f in range(n_frames)
            ]
            out.append(encode_gif(frames, pal, interlace=interlace))
        return pd.Series(out)

    return _gif


GIF_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("min_px", LongType()),
        StructField("max_px", LongType()),
    ]
)


def gif_frame_stats(
    df: DataFrame, media_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL multi-frame decode: walk the GIF container (LZW decompress,
    deinterlace, compose onto the logical screen), resolve indices through
    the global palette, and emit one row per frame with per-channel integer
    sums — the keyframe-extraction surface over a genuinely compressed
    multi-frame bitstream. Integer outputs only, exact oracle compare."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def _f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gif import decode_gif

        for pdf in batches:
            out = []
            for did, data in zip(pdf["doc_id"], pdf["media"]):
                frames, pal = decode_gif(bytes(data))
                for fi, idx in enumerate(frames):
                    rgb = pal[idx].astype(np.int64)  # (h, w, 3)
                    out.append(
                        (
                            did,
                            fi,
                            idx.shape[1],
                            idx.shape[0],
                            int(rgb[:, :, 0].sum()),
                            int(rgb[:, :, 1].sum()),
                            int(rgb[:, :, 2].sum()),
                            int(rgb.min()),
                            int(rgb.max()),
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in GIF_FRAME_SCHEMA])

    return src.mapInPandas(_f, GIF_FRAME_SCHEMA)
