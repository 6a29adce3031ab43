"""Unit tests for the r8 pure-stdlib PNG decoder (multimodal.decode_image
codec='png'): all five scanline filters, grayscale + RGB luma, chunk-CRC
verification, and loud failures on unsupported formats. PNGs here are
synthesized with REAL zlib compression (not the stored-block oracle
path), so the inflate side is exercised too.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from gene_level_metadata_pipeline_spark.operators import multimodal as mm

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def _png(width, height, ctype, scanlines: bytes, depth=8, interlace=0):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0,
                       interlace)
    return (
        SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def _filter_encode(pixels, width, height, bpp, filters):
    """Forward-filter raw pixel rows with the given per-row filter types
    (the encoder side of the decoder's reconstruction)."""
    stride = width * bpp
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = bytes(pixels[y * stride:(y + 1) * stride])
        ft = filters[y]
        out.append(ft)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            up = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - a
            elif ft == 2:
                v = row[x] - up
            elif ft == 3:
                v = row[x] - ((a + up) >> 1)
            elif ft == 4:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else up if pb <= pc else c
                v = row[x] - pred
            out.append(v & 0xFF)
        prev = row
    return bytes(out)


def _decode(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    return {
        r.doc_id: r
        for r in mm.decode_image(df, codec="png").collect()
    }


def test_png_gray8_all_five_filters(spark):
    """4x5 grayscale, one row per filter type — a decoder that skips or
    mis-implements ANY reconstruction diverges."""
    w, h = 4, 5
    pixels = [(13 * i + 7) % 256 for i in range(w * h)]
    sl = _filter_encode(pixels, w, h, 1, [0, 1, 2, 3, 4])
    out = _decode(spark, [_png(w, h, 0, sl)])
    r = out[0]
    assert (r.width, r.height, r.mode) == (w, h, "png-gray8")
    assert r.pixels == pixels


def test_png_rgb8_luma(spark):
    """2x2 RGB with Sub/Paeth filters: decoder must reconstruct with
    bpp=3 offsets and emit the exact integer luma."""
    w, h = 2, 2
    rgb = [10, 200, 30, 255, 0, 128, 7, 7, 7, 90, 180, 45]
    sl = _filter_encode(rgb, w, h, 3, [1, 4])
    out = _decode(spark, [_png(w, h, 2, sl)])
    r = out[0]
    assert (r.width, r.height, r.mode) == (w, h, "png-rgb8")
    want = [
        (299 * rgb[i] + 587 * rgb[i + 1] + 114 * rgb[i + 2]) // 1000
        for i in range(0, 12, 3)
    ]
    assert r.pixels == want


def test_png_multi_idat_chunks(spark):
    """IDAT data may be split across chunks — the decoder must
    concatenate before inflating."""
    w, h = 2, 2
    pixels = [1, 2, 3, 4]
    z = zlib.compress(_filter_encode(pixels, w, h, 1, [0, 0]))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", z[:3]) + _chunk(b"IDAT", z[3:])
        + _chunk(b"IEND", b"")
    )
    assert _decode(spark, [png])[0].pixels == pixels


def _expect_raises(spark, payload, match):
    # coalesce(1): see test_jpeg_decode — one task, no kill-race
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, payload binary"
    ).coalesce(1)
    with pytest.raises(Exception) as ei:
        mm.decode_image(df, codec="png").collect()
    assert match in str(ei.value)


def test_png_bad_crc_fails_loud(spark):
    w, h = 2, 2
    sl = _filter_encode([1, 2, 3, 4], w, h, 1, [0, 0])
    png = bytearray(_png(w, h, 0, sl))
    png[-20] ^= 0xFF  # corrupt inside the IDAT chunk
    _expect_raises(spark, bytes(png), "CRC")


def test_png_unsupported_formats_fail_loud(spark):
    sl16 = _filter_encode([1, 2, 3, 4], 2, 1, 2, [0])  # fake 16-bit row
    _expect_raises(spark, _png(2, 1, 0, sl16, depth=16), "only 8-bit")
    sl = _filter_encode([1, 2], 2, 1, 1, [0])
    _expect_raises(spark, _png(2, 1, 0, sl, interlace=1), "only 8-bit")
    _expect_raises(spark, b"GIF89a not a png", "not a PNG")
