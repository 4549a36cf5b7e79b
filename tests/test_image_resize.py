"""REAL stdlib image pixel decode + resize (operators/multimodal.py:
decode_image_pixels / encode_bmp / resize_nearest / image_resize).
PNG test vectors are hand-assembled (zlib + explicit filter bytes), so
every one of the five scanline filters is exercised without any
imaging library."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from edgar_finance_ontology_spark.operators.multimodal import (
    decode_image_pixels, encode_bmp, image_resize, resize_nearest,
)


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload)))


def make_png(px: np.ndarray, filters: list[int]) -> bytes:
    """Encode [H,W,3] uint8 RGB as a PNG whose row y uses filter
    filters[y] (the exact inverse of the decoder under test)."""
    h, w, _ = px.shape
    stride = w * 3
    raw = bytearray()
    recon = px.reshape(h, stride).astype(np.int32)
    for y in range(h):
        f = filters[y]
        raw.append(f)
        prev = recon[y - 1] if y else np.zeros(stride, dtype=np.int32)
        cur = recon[y]
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
            raw.append((int(cur[x]) - pred) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _rand_px(rng, h, w):
    return np.array([[[rng.randrange(256) for _ in range(3)]
                      for _ in range(w)] for _ in range(h)],
                    dtype=np.uint8)


def test_png_decode_all_filters():
    import random

    rng = random.Random(5)
    px = _rand_px(rng, 5, 7)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                    [0, 1, 2, 3, 4]):
        got = decode_image_pixels(make_png(px, list(filters)))
        assert got is not None and np.array_equal(got, px), filters


def test_bmp_roundtrip_and_padding():
    import random

    rng = random.Random(9)
    for w in (1, 2, 3, 4, 5):  # exercise every stride-padding case
        px = _rand_px(rng, 3, w)
        got = decode_image_pixels(encode_bmp(px))
        assert got is not None and np.array_equal(got, px), w


def test_resize_nearest_semantics():
    # 2x2 checkerboard up to 4x4: each source pixel becomes a 2x2 block
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    up = resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[0, 0], px[0, 0])
    assert np.array_equal(up[0, 3], px[0, 1])
    assert np.array_equal(up[3, 0], px[1, 0])
    assert np.array_equal(up[3, 3], px[1, 1])
    # downscale back recovers the original
    assert np.array_equal(resize_nearest(up, 2, 2), px)


def test_unsupported_payloads_return_none():
    assert decode_image_pixels(b"") is None
    assert decode_image_pixels(b"\xff\xd8\xff\xe0 jpeg-ish") is None
    # 16-bit-depth PNG is out of stdlib scope -> None, not garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"IEND", b""))
    assert decode_image_pixels(png16) is None


def test_image_resize_operator(spark):
    import random

    rng = random.Random(11)
    px = _rand_px(rng, 6, 4)
    rows = [
        ("png1", bytearray(make_png(px, [0, 2, 1, 3, 4, 0]))),
        ("bmp1", bytearray(encode_bmp(px))),
        ("bad1", bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "k string, img binary")
    got = {r["key"]: r for r in
           image_resize(df, "k", "img", width=2, height=3).collect()}
    want = resize_nearest(px, 2, 3)
    for key in ("png1", "bmp1"):
        r = got[key]
        assert r["ok"] and (r["src_width"], r["src_height"]) == (4, 6)
        back = decode_image_pixels(bytes(r["resized_bmp"]))
        assert np.array_equal(back, want), key
    assert got["bad1"]["ok"] is False
    assert got["bad1"]["resized_bmp"] is None


def test_multimodal_dedup_end_to_end(spark):
    """The full multimodal near-dup story on REAL kernels end to end:
    decode -> resize (canonicalizing dimensions) -> MLP embed -> ANN.
    Two renderings of the same image at different sizes must become
    mutual nearest neighbors over an unrelated distractor."""
    import random

    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.multimodal import (
        feature_embed,
    )
    from edgar_finance_ontology_spark.operators.similarity import (
        brute_force_topk,
    )

    rng = random.Random(23)
    base = _rand_px(rng, 16, 16)
    big = resize_nearest(base, 32, 32)          # same content, 2x scale
    other = _rand_px(rng, 16, 16)               # unrelated
    rows = [
        ("a_small", bytearray(encode_bmp(base))),
        ("a_big", bytearray(make_png(big, [0] * 32))),
        ("other", bytearray(encode_bmp(other))),
    ]
    df = spark.createDataFrame(rows, "k string, img binary")
    resized = image_resize(df, "k", "img", width=8, height=8)
    assert resized.where("NOT ok").count() == 0
    emb = feature_embed(
        resized.where("ok"), "key", "resized_bmp", encoder="mlp"
    ).select(F.col("key").alias("vec_id"),
             F.col("feature").alias("embedding"))
    top1 = {r["query_id"]: r["neighbor_id"] for r in
            brute_force_topk(emb, emb, k=1, id_col="vec_id").collect()}
    assert top1["a_small"] == "a_big"
    assert top1["a_big"] == "a_small"
