"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque `binary` columns with typed metadata
structs; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched pandas UDFs over mapInPandas.

Decode tiers (image_metadata(decoder=...)):
  * "header" — REAL metadata decode with the stdlib: container-header
    parsing for PNG / GIF / JPEG / BMP (format + pixel dimensions),
    no external codecs needed;
  * "pil"    — full decode via Pillow when installed (import-gated;
    raises a clear error when absent);
  * "auto"   — pil if importable, else header;
  * "stub"   — the round-1 deterministic md5 fake, kept for fixtures.
Pixel-level kernels (frame sampling, feature embedding) remain
deterministic fakes in this container — clearly marked — while the
Spark-side schemas, batching, and UDF signatures are real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

IMAGE_META_SCHEMA = StructType([
    StructField("key", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("content_md5", StringType(), False),
    StructField("format", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("key", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_md5", StringType(), False),
])

EMBED_SCHEMA = StructType([
    StructField("key", StringType(), False),
    StructField("feature", ArrayType(DoubleType()), False),
])


def _decode_image_stub(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decode (round-1 fixture semantics)."""
    h = hashlib.md5(payload or b"").hexdigest()
    width = 64 + int(h[:4], 16) % 1024
    height = 64 + int(h[4:8], 16) % 1024
    fmt = ["png", "jpeg", "webp", "gif"][int(h[8], 16) % 4]
    return fmt, width, height


def parse_image_header(payload: bytes):
    """REAL stdlib container-header decode -> (format, width, height),
    or (None, None, None) for unrecognized/truncated payloads.

    PNG: IHDR width/height big-endian at offsets 16/20.
    GIF: logical-screen w/h little-endian at 6/8.
    BMP: BITMAPINFOHEADER w/h little-endian at 18/22.
    JPEG: scan segment markers to the first SOFn frame header.
    """
    import struct

    b = payload or b""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return "png", int(w), int(h)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", int(w), int(h)
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return "bmp", int(w), abs(int(h))
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return "jpeg", int(w), int(h)
            i += 2 + seg_len
    return None, None, None


def _decode_image_pil(payload: bytes):
    """Full decode via Pillow (import-gated extra)."""
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "decoder='pil' requires Pillow; install the multimodal extra "
            "or use decoder='header' (stdlib container parse)"
        ) from e
    with Image.open(io.BytesIO(payload)) as im:
        return im.format.lower() if im.format else None, im.width, im.height


def _pick_decoder(decoder: str):
    if decoder == "auto":
        try:
            import PIL  # noqa: F401

            decoder = "pil"
        except ImportError:
            decoder = "header"
    if decoder == "header":
        return parse_image_header
    if decoder == "pil":
        return _decode_image_pil
    if decoder == "stub":
        return _decode_image_stub
    raise ValueError(f"unknown decoder {decoder!r}")


def image_metadata(df: DataFrame, key_col: str, bin_col: str,
                   decoder: str = "stub") -> DataFrame:
    """binary -> typed metadata struct rows (mapInPandas)."""
    decode = _pick_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[bin_col]):
                blob = bytes(payload) if payload is not None else b""
                fmt, w, h = decode(blob)
                rows.append({
                    "key": str(key),
                    "n_bytes": len(blob),
                    "content_md5": hashlib.md5(blob).hexdigest(),
                    "format": fmt, "width": w, "height": h,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA])

    return df.select(key_col, bin_col).mapInPandas(run, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, key_col: str, bin_col: str,
                  every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """'Video' frame sampling stub: one pseudo-frame per byte stride
    (real impl: pyav keyframe extraction); shows the 1->N mapInPandas
    fan-out shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[bin_col]):
                blob = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, len(blob) // every_n_bytes))
                for i in range(n):
                    chunk = blob[i * every_n_bytes:(i + 1) * every_n_bytes]
                    rows.append({
                        "key": str(key), "frame_idx": i,
                        "frame_md5": hashlib.md5(chunk).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return df.select(key_col, bin_col).mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def feature_embed(df: DataFrame, key_col: str, bin_col: str,
                  dim: int = 8) -> DataFrame:
    """Deterministic fake feature extractor (md5-chunk floats in
    [0, 1)); real impl: a vision/audio encoder via Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[bin_col]):
                blob = bytes(payload) if payload is not None else b""
                h = hashlib.md5(blob).hexdigest()
                vec = [int(h[i * 4:(i + 1) * 4], 16) / 65536.0
                       for i in range(dim)]
                rows.append({"key": str(key), "feature": vec})
            yield pd.DataFrame(rows, columns=["key", "feature"])

    return df.select(key_col, bin_col).mapInPandas(run, EMBED_SCHEMA)
