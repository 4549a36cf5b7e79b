"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque `binary` columns with typed metadata
structs; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched pandas UDFs over mapInPandas. The image/audio codecs are
NOT present in this container, so the decode kernels are STUBBED with
a clearly-marked deterministic fake (md5-derived) behind
`EFIN_MULTIMODAL_REAL_DECODE`; everything Spark-side — schemas,
batching, partitioning, UDF signatures — is real and tested.
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
    """STUB: deterministic fake decode. A real deployment swaps this
    for PIL/libvips (`raise NotImplementedError` if real decode is
    demanded without the codec present)."""
    import os

    if os.environ.get("EFIN_MULTIMODAL_REAL_DECODE"):
        raise NotImplementedError(
            "real image decode requires PIL/libvips, not present here"
        )
    h = hashlib.md5(payload or b"").hexdigest()
    width = 64 + int(h[:4], 16) % 1024
    height = 64 + int(h[4:8], 16) % 1024
    fmt = ["png", "jpeg", "webp", "gif"][int(h[8], 16) % 4]
    return fmt, width, height


def image_metadata(df: DataFrame, key_col: str, bin_col: str) -> DataFrame:
    """binary -> typed metadata struct rows (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[bin_col]):
                blob = bytes(payload) if payload is not None else b""
                fmt, w, h = _decode_image_stub(blob)
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
