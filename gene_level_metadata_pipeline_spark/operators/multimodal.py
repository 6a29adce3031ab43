"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages. FOUR real codec paths: WAV/PCM
audio decodes with the pure-stdlib ``wave`` + ``array`` modules
(:func:`decode_audio`), uncompressed 24-bit BMP images parse with
pure-stdlib ``struct`` (:func:`decode_image` ``codec='bmp'``), 8-bit
grayscale/RGB PNG decodes with pure-stdlib ``zlib`` — full chunk-CRC
verification + all five scanline filters (``codec='png'``, r8) — and
baseline sequential JPEG decodes with a pure-stdlib Huffman + IDCT
implementation (``codec='jpeg'``, r9; the PIL gate is GONE) — which
also powers a REAL video path: Motion-JPEG in RIFF/AVI containers
(:func:`sample_frames` ``codec='mjpeg-avi'``, r9). The one remaining
media library (ffmpeg) is NOT in this container, so compressed audio
and inter-frame video codecs
stay stubbed behind ``NotImplementedError`` — but everything
Spark-side is real and tested: schema, partition-preserving batch
iteration, UDF signatures, and the deterministic fake extractor that
stands in for a real one.

Scale notes: payload columns dominate row size → keep them out of shuffles
(extract features first, then drop the payload), bump
``spark.sql.files.maxPartitionBytes`` down so a partition of binaries fits
executor memory, and never collect payloads to the driver.

Throughput (r10, VERDICT r9 item 1): the per-PIXEL work in every codec
is numpy-vectorized inside the same Arrow stages — the JPEG IDCT runs
once over the whole image's block stack with a term-ordered
accumulation that replays the scalar reference bit-for-bit, PNG
Sub/Up/None filters reconstruct as whole-row vector ops (Average/Paeth
keep the spec's serial loop), BMP rows and the BT.601 luma fold are
array slices, and WAV peak is one vector abs/max. Outputs are
byte-identical to the r9 scalar loops (A/B-verified on randomized
images; the codec oracles and unit suites pin it). Only the
bit-serial JPEG Huffman walk remains per-symbol Python — the
irreducible part of a pure-Python entropy decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from gene_level_metadata_pipeline_spark.materialize import (
    materialize as _materialize,
)

__all__ = [
    "attach_binary_payload",
    "extract_features",
    "decode_image",
    "decode_audio",
    "resize_image",
    "sample_frames",
    "ahash_bits",
    "dhash_bits",
    "image_near_dup_pairs",
]

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, head_bytes array<int>"
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stand-in ingestion: materialize an opaque binary column + metadata
    struct from existing data (real pipelines read image/audio bytes from
    object storage). Returns (id, payload binary, meta struct<modality,
    n_bytes>)."""
    payload = F.to_binary(F.col(text_col), F.lit("utf-8"))
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("modality"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    The deterministic fake extractor: byte length, additive checksum, and
    the first 4 byte values — exercising exactly the batch shape a real
    image featurizer uses (payload bytes in, fixed-width features out,
    payload dropped on output so downstream shuffles stay thin).
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len),
                    "checksum": payloads.map(lambda b: int(sum(b))),
                    "head_bytes": payloads.map(lambda b: [int(x) for x in b[:4]]),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


DECODE_SCHEMA = (
    "doc_id long, width int, height int, mode string, pixels array<int>"
)


# ---- baseline-sequential JPEG core (pure stdlib + numpy IDCT) ---------
# Shared by decode_image(codec='jpeg') and sample_frames
# (codec='mjpeg-avi'): module-level so both Arrow stages reference one
# implementation by name, and so the trig tables / Huffman cache / bit
# reader are built ONCE per executor instead of once per image (r10 —
# the per-image constant cost used to include 64 math.cos calls and a
# 6-method class definition). See decode_image's docstring for the
# decode contract (LUMA plane, deterministic rounding, fail-loud
# surface). The IDCT is numpy-vectorized across every non-DC-only block
# of the image with a term-ordered accumulation that replays the scalar
# reference loop's float additions EXACTLY (same multiply tree, same
# (v,u) add order, zero-coefficient terms add IEEE ±0.0 which never
# changes a sum) — outputs are byte-identical to the r9 per-pixel
# Python loops, pinned by tests/test_jpeg_decode.py's independent
# encoder and the image_jpeg_decode / video_mjpeg_frames oracles.

import math as _math
import struct as _struct

import numpy as _np

# zigzag index -> natural index (row*8 + col) of the 8x8 block,
# ITU T.81 fig 5
_JPEG_ZZ_NAT = _np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=_np.int64)
_JPEG_COS = _np.array([
    [_math.cos((2 * x + 1) * u * _math.pi / 16) for x in range(8)]
    for u in range(8)
])
_JPEG_CC = _np.array([1 / _math.sqrt(2)] + [1.0] * 7)
# A[v, u, y] = cc[u] * (cc[v] * cos[v][y]) — the exact multiply tree of
# the scalar reference term ((cc[u] * cv) * blk) * cos[u][x], cv =
# cc[v] * cos[v][y]; elementwise numpy float64 ops are the same IEEE
# operations, so downstream products stay bit-identical
_JPEG_A = _JPEG_CC[None, :, None] * (
    _JPEG_CC[:, None] * _JPEG_COS
)[:, None, :]

# canonical-table cache: (BITS||HUFFVAL bytes) -> decode dict. Corpora
# reuse a handful of tables (most encoders emit the Annex K defaults),
# so at scale this drops the per-image table rebuild to a dict hit.
_HUFF_CACHE: dict = {}


def _build_huff(bits, vals):
    # canonical code assignment, T.81 Annex C
    key = bytes(bits) + bytes(vals)
    t = _HUFF_CACHE.get(key)
    if t is not None:
        return t
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    if len(_HUFF_CACHE) >= 512:
        _HUFF_CACHE.clear()
    _HUFF_CACHE[key] = table
    return table


class _Bits:
    """Entropy-segment bit reader: un-stuffs FF00, stops
    loudly on any real marker mid-symbol."""

    def __init__(self, b, pos):
        self.b, self.pos, self.cur, self.n = b, pos, 0, 0

    def bit(self):
        if self.n == 0:
            if self.pos >= len(self.b):
                raise ValueError(
                    "decode_image[jpeg]: truncated scan"
                )
            byte = self.b[self.pos]
            self.pos += 1
            if byte == 0xFF:
                # ADVICE r9: a payload ENDING on 0xFF must raise the
                # documented truncation ValueError, not IndexError
                if self.pos >= len(self.b):
                    raise ValueError(
                        "decode_image[jpeg]: truncated scan "
                        "(0xFF at end of data, stuffing byte missing)"
                    )
                nxt = self.b[self.pos]
                self.pos += 1
                if nxt != 0x00:
                    raise ValueError(
                        "decode_image[jpeg]: marker "
                        f"{nxt:#04x} inside entropy data"
                    )
            self.cur, self.n = byte, 8
        self.n -= 1
        return (self.cur >> self.n) & 1

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, idx):
        # byte-align and consume the expected RSTn marker
        self.n = 0
        if (
            self.pos + 1 >= len(self.b)
            or self.b[self.pos] != 0xFF
            or self.b[self.pos + 1] != 0xD0 + (idx % 8)
        ):
            raise ValueError(
                "decode_image[jpeg]: missing RST"
                f"{idx % 8} at restart interval"
            )
        self.pos += 2

    def huff(self, table):
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError(
            "decode_image[jpeg]: invalid Huffman code"
        )


def _extend(v, s):
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block_coefs(r, dct, act, q, pred, out_row):
    """Entropy-decode one block into ``out_row`` (int64[64], ZIGZAG
    order, dequantized). Returns the new DC predictor. The Huffman walk
    is inherently bit-serial; everything per-PIXEL (IDCT, level shift,
    rounding, clamp) moved to the vectorized :func:`_idct_stack`."""
    s = r.huff(dct)
    diff = _extend(r.bits(s), s) if s else 0
    dc = pred + diff
    out_row[0] = dc * q[0]
    k = 1
    while k < 64:
        rs = r.huff(act)
        run, size = rs >> 4, rs & 15
        if rs == 0x00:
            break  # EOB
        if rs == 0xF0:
            k += 16  # ZRL
            continue
        k += run
        if k > 63 or size == 0:
            raise ValueError(
                "decode_image[jpeg]: AC run past block end"
            )
        out_row[k] = _extend(r.bits(size), size) * q[k]
        k += 1
    return dc


def _idct_stack(zig):
    """Vectorized exact IDCT of a stack of dequantized blocks.

    ``zig``: int64 (n, 64) in zigzag order. Returns int64 (n, 8, 8)
    pixel blocks, byte-identical to the scalar reference:

    * DC-only blocks take the mathematically EXACT constant fast path —
      the 2-D IDCT of a DC-only block is C(0)²·F(0,0)/4 = F(0,0)/8 at
      every pixel (flat regions dominate real JPEGs, so this is the hot
      path at corpus scale; the general path is pinned equal by unit).
    * General blocks accumulate per-(v,u) term planes in the reference
      loop's exact (v-major, u-minor) order with its exact multiply
      tree ((cc[u]·(cc[v]·cos_vy))·coef)·cos_ux, so every float64 add
      sequence per pixel is identical; (v,u) slots that are zero in
      SOME blocks of the stack contribute IEEE ±0.0, which never
      changes a finite sum (x + ±0.0 == x; a -0.0 accumulator flipping
      to +0.0 is erased by /4 + 128).
    * Rounding is the same deterministic round-half-away-from-zero
      (the BLAS round4 discipline), then clamp to [0, 255].
    """
    n = zig.shape[0]
    out = _np.empty((n, 8, 8), dtype=_np.int64)
    dc_only = ~(zig[:, 1:] != 0).any(axis=1)
    if dc_only.any():
        t = zig[dc_only, 0].astype(_np.float64) / 8.0 + 128.0
        p = _np.where(t >= 0, _np.floor(t + 0.5), -_np.floor(-t + 0.5))
        out[dc_only] = _np.clip(p, 0, 255).astype(
            _np.int64
        )[:, None, None]
    gen = ~dc_only
    if gen.any():
        nat = _np.zeros((int(gen.sum()), 64), dtype=_np.float64)
        nat[:, _JPEG_ZZ_NAT] = zig[gen].astype(_np.float64)
        coefs = nat.reshape(-1, 8, 8)  # [block, v, u]
        acc = _np.zeros((coefs.shape[0], 8, 8))
        for v in range(8):
            for u in range(8):
                col = coefs[:, v, u]
                if not col.any():
                    continue
                # ((A[v,u,y]) * coef) * cos[u][x] — reference tree
                acc += (_JPEG_A[v, u][None, :, None] * col[:, None, None]
                        ) * _JPEG_COS[u][None, None, :]
        t = acc / 4.0 + 128.0
        p = _np.where(t >= 0, _np.floor(t + 0.5), -_np.floor(-t + 0.5))
        out[gen] = _np.clip(p, 0, 255).astype(_np.int64)
    return out


def _jpeg_parse_headers(b: bytes):
    """Marker walk up to and including SOS. Returns
    (w, h, comps, qt, hdc, hac, dri, scan, entropy_pos)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError(
            "decode_image[jpeg]: not a JPEG payload"
        )
    pos = 2
    qt: dict = {}
    hdc: dict = {}
    hac: dict = {}
    sof = None
    dri = 0
    scan = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(
                "decode_image[jpeg]: expected marker, got "
                f"{b[pos]:#04x}"
            )
        m = b[pos + 1]
        pos += 2
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # standalone markers
        (ln,) = _struct.unpack_from(">H", b, pos)
        if pos + ln > len(b):
            raise ValueError(
                "decode_image[jpeg]: truncated segment "
                f"for marker {m:#04x}"
            )
        seg = b[pos + 2:pos + ln]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError(
                        "decode_image[jpeg]: 16-bit quant "
                        "tables unsupported"
                    )
                # ADVICE r9: a short DQT segment must fail loud here,
                # not as an IndexError inside decode_block later
                if i + 65 > len(seg):
                    raise ValueError(
                        "decode_image[jpeg]: truncated DQT segment "
                        f"({len(seg) - i - 1} of 64 entries)"
                    )
                qt[tq] = list(seg[i + 1:i + 65])
                i += 65
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                (hdc if tc == 0 else hac)[th] = _build_huff(
                    bits, vals
                )
                i += 17 + n
        elif m == 0xC0:  # SOF0 baseline sequential
            prec = seg[0]
            h, w = _struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                tqi = seg[8 + 3 * ci]
                if hv != 0x11:
                    raise ValueError(
                        "decode_image[jpeg]: chroma "
                        "subsampling unsupported "
                        f"(H/V={hv:#04x}); 1x1 only"
                    )
                comps.append((cid, tqi))
            if prec != 8 or nc not in (1, 3):
                raise ValueError(
                    "decode_image[jpeg]: only 8-bit "
                    "1- or 3-component baseline supported"
                )
            sof = (w, h, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "decode_image[jpeg]: only baseline "
                f"sequential (SOF0) supported, got SOF "
                f"marker {m:#04x}"
            )
        elif m == 0xDD:  # DRI
            (dri,) = _struct.unpack(">H", seg)
        elif m == 0xDA:  # SOS
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError(
                    "decode_image[jpeg]: truncated SOS"
                )
            scan = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                 seg[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            pos += ln
            break
        pos += ln
    if sof is None or scan is None:
        raise ValueError(
            "decode_image[jpeg]: missing SOF0/SOS"
        )
    w, h, comps = sof
    if len(scan) != len(comps):
        raise ValueError(
            "decode_image[jpeg]: partial scans unsupported"
        )
    return w, h, comps, qt, hdc, hac, dri, scan, pos


def _jpeg_decode(raw) -> tuple[int, int, str, list[int]]:
    b = bytes(raw)
    w, h, comps, qt, hdc, hac, dri, scan, pos = _jpeg_parse_headers(b)
    tq_of = dict(comps)
    for cid, td, ta in scan:
        if (
            cid not in tq_of or tq_of[cid] not in qt
            or td not in hdc or ta not in hac
        ):
            raise ValueError(
                "decode_image[jpeg]: scan references an "
                "undefined component/quant/Huffman table"
            )
    r = _Bits(b, pos)
    mx, my = (w + 7) // 8, (h + 7) // 8
    preds = {cid: 0 for cid, _, _ in scan}
    # luma plane only: Y IS the BT.601 luma the bmp/png
    # codecs compute from RGB, so the output contract is
    # shared across all three image codecs. Entropy decode fills the
    # Y coefficient stack (MCU order == block-row-major), non-Y
    # components are fully decoded (the bit stream demands it) into a
    # discarded scratch row; ALL per-pixel work happens once, in the
    # vectorized _idct_stack over the whole image.
    n_blocks = mx * my
    ycoef = _np.zeros((n_blocks, 64), dtype=_np.int64)
    scratch = _np.zeros(64, dtype=_np.int64)
    n_mcu = 0
    for by in range(my):
        for bx in range(mx):
            if dri and n_mcu and n_mcu % dri == 0:
                r.align_restart(n_mcu // dri - 1)
                preds = {c: 0 for c in preds}
            for idx, (cid, td, ta) in enumerate(scan):
                if idx == 0:  # Y component
                    row = ycoef[n_mcu]
                else:
                    scratch[:] = 0
                    row = scratch
                preds[cid] = _decode_block_coefs(
                    r, hdc[td], hac[ta], qt[tq_of[cid]],
                    preds[cid], row,
                )
            n_mcu += 1
    blocks = _idct_stack(ycoef)  # (n_blocks, 8, 8)
    plane = (
        blocks.reshape(my, mx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(my * 8, mx * 8)
    )
    px = plane[:h, :w].ravel().tolist()
    mode = "jpeg-gray8" if len(comps) == 1 else "jpeg-ycc8"
    return w, h, mode, px


def decode_image(
    df: DataFrame, payload_col: str = "payload", codec: str = "jpeg"
) -> DataFrame:
    """Decode binary → (width, height, mode, pixel array) via Arrow-batched
    mapInPandas.

    ``codec='bmp'`` is a REAL decoder (round-7 sitting 2, the
    decode_audio precedent): uncompressed 24-bit BI_RGB Windows bitmaps
    parse with pure-stdlib ``struct`` — no PIL, no libjpeg — emitting
    exact integer luma pixels ``(299·R + 587·G + 114·B) // 1000`` in
    row-major TOP-DOWN order (bottom-up storage un-flipped; negative
    biHeight top-down files honored). Malformed headers / unsupported
    bpp / compression fail LOUD. ``codec='png'`` (r8) inflates with
    stdlib zlib, verifies every chunk CRC, and reconstructs all five
    scanline filters. ``codec='jpeg'`` (r9, VERDICT r8 item 5 — the
    gate PIL used to hold) is a pure-stdlib BASELINE SEQUENTIAL
    decoder: full marker walk (DQT multi-table, DHT canonical-code
    reconstruction from BITS/HUFFVAL, SOF0, DRI), entropy decode with
    FF00 un-stuffing and RSTn restart handling (DC predictors reset,
    byte-aligned), per-block DC-prediction + AC run/size symbols
    (EOB/ZRL), zigzag dequantization, and an exact float 2-D IDCT with
    deterministic round-half-away-from-zero and [0,255] clamp. 1- and
    3-component (no chroma subsampling: 1x1 only) images decode; the
    pixel contract is the LUMA plane — for 3-component JPEGs that is
    the Y channel directly, the same BT.601 luma the bmp/png codecs
    compute from RGB. Progressive (SOF2), arithmetic coding, 16-bit
    quant tables and subsampled chroma fail LOUD — a silent wrong
    decode would poison a training corpus. ``codec='fake'`` is the
    deterministic stand-in that exercises the identical Spark-side
    plumbing — schema, batch iteration, payload-in / fixed-width-out
    shape: a 2×2 "image" whose pixels are the first 4 payload bytes
    (zero-padded).
    """
    if codec == "bmp":
        def batches(it: Iterator) -> Iterator:
            import struct

            import pandas as pd

            def parse(raw) -> tuple[int, int, list[int]]:
                b = bytes(raw)
                if b[:2] != b"BM":
                    raise ValueError("decode_image[bmp]: not a BMP payload")
                (pix_off,) = struct.unpack_from("<I", b, 10)
                hdr_size, w, h, planes, bpp, comp = struct.unpack_from(
                    "<IiiHHI", b, 14
                )
                if hdr_size < 40 or planes != 1:
                    raise ValueError("decode_image[bmp]: bad info header")
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"decode_image[bmp]: only uncompressed 24-bit "
                        f"BI_RGB supported (bpp={bpp}, compression={comp})"
                    )
                topdown, hh = h < 0, abs(h)
                stride = (w * 3 + 3) // 4 * 4
                # r10: vectorized row walk — same integer BT.601 luma,
                # fail-loud on short pixel data (the per-pixel loop
                # raised a bare IndexError there)
                if pix_off + hh * stride > len(b) or pix_off < 0:
                    raise ValueError(
                        "decode_image[bmp]: truncated pixel data"
                    )
                rows = (
                    _np.frombuffer(
                        b, _np.uint8, hh * stride, pix_off
                    )
                    .reshape(hh, stride)[:, : w * 3]
                    .astype(_np.int64)
                )
                if not topdown:
                    rows = rows[::-1]
                px = (
                    (299 * rows[:, 2::3] + 587 * rows[:, 1::3]
                     + 114 * rows[:, 0::3]) // 1000
                ).ravel().tolist()
                return w, hh, px

            for pdf in it:
                recs = []
                for doc_id, raw in zip(pdf["doc_id"], pdf[payload_col]):
                    w, hh, px = parse(raw)
                    recs.append((doc_id, w, hh, "bmp24", px))
                yield pd.DataFrame(recs, columns=[
                    "doc_id", "width", "height", "mode", "pixels",
                ])

        return df.mapInPandas(batches, schema=DECODE_SCHEMA)
    if codec == "png":
        def batches(it: Iterator) -> Iterator:
            import struct
            import zlib

            import pandas as pd

            SIG = b"\x89PNG\r\n\x1a\n"

            def parse(raw) -> tuple[int, int, str, list[int]]:
                b = bytes(raw)
                if b[:8] != SIG:
                    raise ValueError("decode_image[png]: not a PNG payload")
                ihdr = None
                idat = bytearray()
                pos = 8
                while pos + 12 <= len(b):
                    (ln,) = struct.unpack_from(">I", b, pos)
                    typ = b[pos + 4:pos + 8]
                    data = b[pos + 8:pos + 8 + ln]
                    (crc,) = struct.unpack_from(">I", b, pos + 8 + ln)
                    if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                        raise ValueError(
                            f"decode_image[png]: bad {typ!r} chunk CRC"
                        )
                    pos += 12 + ln
                    if typ == b"IHDR":
                        ihdr = data
                    elif typ == b"IDAT":
                        idat += data
                    elif typ == b"IEND":
                        break
                if ihdr is None or not idat:
                    raise ValueError("decode_image[png]: missing IHDR/IDAT")
                w, h, depth, ctype, comp, filt, inter = struct.unpack(
                    ">IIBBBBB", ihdr
                )
                if depth != 8 or ctype not in (0, 2) or comp or filt or inter:
                    raise ValueError(
                        f"decode_image[png]: only 8-bit non-interlaced "
                        f"grayscale/RGB supported (depth={depth}, "
                        f"color_type={ctype}, interlace={inter})"
                    )
                bpp = 1 if ctype == 0 else 3
                stride = w * bpp
                sl = zlib.decompress(bytes(idat))
                if len(sl) != h * (1 + stride):
                    raise ValueError(
                        f"decode_image[png]: scanline size mismatch "
                        f"({len(sl)} != {h * (1 + stride)})"
                    )
                # r10 vectorized defilter: None (0) is a copy, Sub (1)
                # is a per-channel running sum mod 256 (cumsum in int64
                # then &0xFF == the iterated (a+b)&0xFF chain), Up (2)
                # is one vector add vs the previous row. Average (3)
                # and Paeth (4) carry a true per-pixel serial
                # dependency through a nonlinearity (>>1 / min-abs
                # predictor), so they keep the reference scalar loop —
                # same bytes either way, pinned by the filter-matrix
                # unit tests and the image_png_decode oracle.
                arr = _np.frombuffer(sl, _np.uint8).reshape(h, 1 + stride)
                fts = arr[:, 0]
                raws = arr[:, 1:]
                prev = _np.zeros(stride, dtype=_np.int64)
                out_rows = []
                for y in range(h):
                    ft = int(fts[y])
                    line = raws[y].astype(_np.int64)
                    if ft == 0:
                        cur = line
                    elif ft == 1:
                        cur = line
                        for ch in range(bpp):
                            _np.cumsum(
                                cur[ch::bpp], out=cur[ch::bpp]
                            )
                        cur &= 0xFF
                    elif ft == 2:
                        cur = (line + prev) & 0xFF
                    elif ft in (3, 4):
                        ln = line.tolist()
                        pv = prev.tolist()
                        for x in range(stride):
                            a = ln[x - bpp] if x >= bpp else 0
                            up = pv[x]
                            if ft == 3:
                                v = ln[x] + ((a + up) >> 1)
                            else:
                                c = pv[x - bpp] if x >= bpp else 0
                                p = a + up - c
                                pa, pb, pc = (
                                    abs(p - a), abs(p - up), abs(p - c)
                                )
                                pred = (
                                    a if pa <= pb and pa <= pc
                                    else up if pb <= pc else c
                                )
                                v = ln[x] + pred
                            ln[x] = v & 0xFF
                        cur = _np.array(ln, dtype=_np.int64)
                    else:
                        raise ValueError(
                            f"decode_image[png]: bad filter {ft} row {y}"
                        )
                    out_rows.append(cur)
                    prev = cur
                recon = _np.concatenate(out_rows)
                if ctype == 0:
                    return w, h, "png-gray8", recon.tolist()
                px = (
                    (299 * recon[0::3] + 587 * recon[1::3]
                     + 114 * recon[2::3]) // 1000
                ).tolist()
                return w, h, "png-rgb8", px

            for pdf in it:
                recs = []
                for doc_id, raw in zip(pdf["doc_id"], pdf[payload_col]):
                    w, hh, mode, px = parse(raw)
                    recs.append((doc_id, w, hh, mode, px))
                yield pd.DataFrame(recs, columns=[
                    "doc_id", "width", "height", "mode", "pixels",
                ])

        return df.mapInPandas(batches, schema=DECODE_SCHEMA)
    if codec == "jpeg":
        def batches(it: Iterator) -> Iterator:
            import pandas as pd

            for pdf in it:
                recs = []
                for doc_id, raw in zip(pdf["doc_id"], pdf[payload_col]):
                    w, hh, mode, px = _jpeg_decode(raw)
                    recs.append((doc_id, w, hh, mode, px))
                yield pd.DataFrame(recs, columns=[
                    "doc_id", "width", "height", "mode", "pixels",
                ])

        return df.mapInPandas(batches, schema=DECODE_SCHEMA)
    if codec == "fake":
        def batches(it: Iterator) -> Iterator:
            import pandas as pd

            for pdf in it:
                payloads = pdf[payload_col]
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "width": 2,
                    "height": 2,
                    "mode": "L",
                    "pixels": payloads.map(
                        lambda b: [int(x) for x in b[:4]] + [0] * (4 - len(b[:4]))
                    ),
                })
    else:
        raise ValueError(f"decode_image: unknown codec {codec!r}")
    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, sample_width int, "
    "n_frames long, peak int, head_samples array<int>"
)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    codec: str = "wav",
    head_n: int = 8,
) -> DataFrame:
    """Decode audio payloads → (sample_rate, n_channels, sample_width,
    n_frames, peak, head_samples) via Arrow-batched mapInPandas.

    ``codec='wav'`` is a REAL decoder (round-7, VERDICT r6 task 8): RIFF
    WAV with 16-bit PCM parses with the pure-stdlib ``wave`` module and
    ``array('h')`` — no container codecs required — so the audio
    modality runs real bytes end-to-end: header fields come from the
    actual chunk structure, ``peak`` is the max absolute sample over
    every decoded frame, ``head_samples`` the first ``head_n`` decoded
    int16 samples (interleaved channel order). All exact integers.
    Malformed payloads fail LOUD (wave.Error propagates) — silent
    nulls would hide corpus corruption. Compressed codecs (mp3/ogg/
    flac) still need ffmpeg and stay gated; with the r9 JPEG decoder
    the NotImplementedError surface is ffmpeg-only (compressed audio +
    video frame sampling).

    Scale shape: identical to every featurizer here — payload bytes in,
    fixed-width features out, payload dropped so downstream shuffles
    stay thin; decoding is embarrassingly partition-parallel.
    """
    if codec == "wav":
        def batches(it: Iterator) -> Iterator:
            import io
            import wave

            import pandas as pd

            for pdf in it:
                recs = []
                for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                    with wave.open(io.BytesIO(bytes(b))) as w:
                        sw = w.getsampwidth()
                        if sw != 2:
                            raise ValueError(
                                f"decode_audio: only 16-bit PCM supported, "
                                f"got sample_width={sw} (doc {doc_id})"
                            )
                        n = w.getnframes()
                        # r10: vectorized sample scan — '<i2' pins WAV's
                        # little-endian int16 on any host; abs in int32
                        # so -32768 peaks at 32768, as the scalar
                        # big-int abs did
                        samples = _np.frombuffer(
                            w.readframes(n), dtype="<i2"
                        )
                        peak = (
                            int(_np.abs(samples.astype(_np.int32)).max())
                            if samples.size else 0
                        )
                        recs.append((
                            doc_id, w.getframerate(), w.getnchannels(),
                            sw, n, peak,
                            samples[:head_n].astype(int).tolist(),
                        ))
                yield pd.DataFrame(recs, columns=[
                    "doc_id", "sample_rate", "n_channels", "sample_width",
                    "n_frames", "peak", "head_samples",
                ])

        return df.mapInPandas(batches, schema=AUDIO_SCHEMA)
    if codec == "ffmpeg":
        raise NotImplementedError(
            "compressed audio (mp3/ogg/flac) requires ffmpeg (not in this "
            "container); WAV/PCM decodes for real via codec='wav'"
        )
    raise ValueError(f"decode_audio: unknown codec {codec!r}")


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize decoded images (input = decode_image output schema) by
    nearest-neighbor sampling over the pixel array — pure Catalyst array
    indexing (no Python at all): out[y][x] = in[y*h/H][x*w/W]. A real
    bilinear/codec resize would slot into the same shape as a
    mapInPandas stage; nearest-neighbor is exact, deterministic, and
    keeps resize on the JVM fast path.

    Plan shape (r10, VERDICT r9 item 2): ONE ``transform`` lambda over a
    ``sequence(0, W*H-1)`` — constant plan size whatever the target.
    The r9 form built W x H separate Column objects (a 224x224 resize
    was ~50k Catalyst expressions in one select: minutes of analysis
    before a single row moved); the lambda form is the same arithmetic
    per element, evaluated inside codegen, with a plan the analyzer
    walks in constant time."""
    if width < 1 or height < 1:
        raise ValueError(
            f"resize_image: target {width}x{height} must be >= 1x1"
        )

    # bind INPUT columns to df explicitly: inside the transform lambda a
    # bare F.col("width") resolves against the enclosing select's output
    # aliases (lit(width) AS width), silently reading the TARGET size
    in_w, in_h, in_px = df["width"], df["height"], df["pixels"]

    def pick(i):
        y = F.floor(i / F.lit(width))  # i // width
        x = i - y * width
        src_y = F.floor(y * in_h / F.lit(height))
        src_x = F.floor(x * in_w / F.lit(width))
        return in_px[(src_y * in_w + src_x).cast("int")]

    return df.select(
        "doc_id",
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        "mode",
        F.transform(
            F.sequence(F.lit(0), F.lit(width * height - 1)), pick
        ).alias("pixels"),
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 30,
    frame_bytes: int = 4,
    codec: str = "ffmpeg",
) -> DataFrame:
    """Sample every Nth frame from a video container payload.

    ``codec='mjpeg-avi'`` is a REAL video path (r9): Motion-JPEG in a
    RIFF/AVI container parses with pure stdlib — the RIFF chunk walk
    (word-aligned sizes, LIST recursion into ``movi``/``rec `` lists)
    collects the stream-0 video chunks (``00dc``/``00db``), every Nth
    is decoded by the shared baseline-JPEG core (:func:`_jpeg_decode`,
    the ``decode_image`` codec), and each sampled frame emits a DECODED
    row (doc_id, frame_idx, width, height, mode, pixels) — the luma
    contract all four image codecs share. MJPEG is exactly
    "a JPEG per frame", which is why it is the honest first real video
    codec: no inter-frame prediction to fake. Non-AVI payloads, AVIs
    with no video chunks, and non-JPEG frame bytes fail LOUD.
    ``codec='ffmpeg'`` (inter-frame codecs: H.264 etc.) stays gated —
    ffmpeg is not in this container. ``codec='fake'`` treats the
    payload as concatenated fixed-size frames of ``frame_bytes`` bytes —
    the deterministic stand-in certifying the Spark-side contract: one
    input row fans out to one row per sampled frame (frame_idx, frame
    binary), payload dropped on output."""
    if codec == "ffmpeg":
        raise NotImplementedError(
            "inter-frame video codecs require ffmpeg (not in this "
            "container); Motion-JPEG AVI decodes for real via "
            "codec='mjpeg-avi'; codec='fake' is the plumbing-certified "
            "stand-in"
        )
    if codec == "mjpeg-avi":
        if every_n < 1:
            raise ValueError(f"sample_frames: every_n={every_n} < 1")

        def batches(it: Iterator) -> Iterator:
            import struct

            import pandas as pd

            def video_chunks(b: bytes) -> list[bytes]:
                if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
                    raise ValueError(
                        "sample_frames[mjpeg-avi]: not a RIFF/AVI "
                        "payload"
                    )
                out: list[bytes] = []

                def walk(pos: int, end: int) -> None:
                    while pos + 8 <= end:
                        fourcc = b[pos:pos + 4]
                        (sz,) = struct.unpack_from("<I", b, pos + 4)
                        body = pos + 8
                        if body + sz > len(b):
                            raise ValueError(
                                "sample_frames[mjpeg-avi]: truncated "
                                f"chunk {fourcc!r}"
                            )
                        if fourcc == b"LIST":
                            if b[body:body + 4] in (b"movi", b"rec "):
                                walk(body + 4, body + sz)
                        elif (
                            fourcc[:2] == b"00"
                            and fourcc[2:4] in (b"dc", b"db")
                        ):
                            out.append(b[body:body + sz])
                        pos = body + sz + (sz & 1)  # word-aligned

                walk(12, len(b))
                if not out:
                    raise ValueError(
                        "sample_frames[mjpeg-avi]: no stream-0 video "
                        "chunks in movi list"
                    )
                return out

            for pdf in it:
                recs = []
                for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                    frames = video_chunks(bytes(raw))
                    for idx in range(0, len(frames), every_n):
                        w, h, mode, px = _jpeg_decode(frames[idx])
                        recs.append((doc_id, idx, w, h, mode, px))
                yield pd.DataFrame(recs, columns=[
                    "doc_id", "frame_idx", "width", "height", "mode",
                    "pixels",
                ])

        return df.mapInPandas(
            batches,
            schema=(
                "doc_id long, frame_idx long, width int, height int, "
                "mode string, pixels array<int>"
            ),
        )
    if codec != "fake":
        raise ValueError(f"sample_frames: unknown codec {codec!r}")

    n_frames = F.floor(F.octet_length("payload") / F.lit(frame_bytes))
    idxs = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        df.where(n_frames > 0)
        .select("doc_id", "payload", F.explode(idxs).alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("long"),
            F.substring(
                F.col("payload"),
                (F.col("frame_idx") * frame_bytes + 1).cast("int"),
                frame_bytes,
            ).alias("frame"),
        )
    )


# ---- perceptual hashing + image near-dup (r10, VERDICT r9 item 7) -----
# aHash/dHash over the decoded luma plane, pure Catalyst integer
# arithmetic (no Python, no floats — both hashes are exact, so the
# DuckDB oracle replays them bit-for-bit), feeding the SAME banded-LSH
# cap/star candidate machinery the text near-dup path uses. The
# reference-shaped use case: figure/plot dedup in a multimodal corpus —
# a re-encoded copy of an image (PNG of the same pixels, a re-saved
# BMP) hashes IDENTICALLY because the hash sees only decoded pixels
# (property-pinned by test), and near-copies land within a small
# Hamming distance.


def ahash_bits(pixels, width, height) -> "Column":
    """Average-hash bit array (64 x 0/1 ints) of a decoded image:
    nearest-neighbor downsample to 8x8 (the resize_image index
    arithmetic), bit_i = 1 iff 64·px_i > Σpx — the integer-exact form
    of "pixel above the mean" (no division, so no rounding convention
    to disagree on). Column args may be names or Columns.

    One-expression form — convenient for ad-hoc use, but the per-bit
    comparison re-evaluates the 64-element total fold under every one
    of the 64 bits in the interpreted HOF path (~4k ops per row);
    :func:`image_near_dup_pairs` uses the staged attribute-bound
    equivalent (:func:`_ahash_sample` + a checkpointed total column),
    pinned output-identical by unit test."""
    px = F.col(pixels) if isinstance(pixels, str) else pixels
    w = F.col(width) if isinstance(width, str) else width
    h = F.col(height) if isinstance(height, str) else height
    sample = _ahash_sample(px, w, h)
    total = F.aggregate(
        sample,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
    return F.transform(
        sample,
        lambda x: F.when(
            x.cast("bigint") * 64 > total, F.lit(1)
        ).otherwise(F.lit(0)),
    )


def _ahash_sample(px, w, h) -> "Column":
    """The 8x8 nearest-neighbor sample array shared by ahash_bits and
    its staged form (the resize_image index arithmetic)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: px[
            (
                F.floor(F.floor(i / 8) * h / 8) * w
                + F.floor((i % 8) * w / 8)
            ).cast("int")
        ],
    )


def dhash_bits(pixels, width, height) -> "Column":
    """Difference-hash bit array (64 x 0/1 ints): sample a 9x8 grid
    (nearest neighbor), bit(r,c) = 1 iff grid[r][c+1] > grid[r][c] —
    the gradient-direction hash, robust to global brightness shifts.
    Exact integer comparisons only."""
    px = F.col(pixels) if isinstance(pixels, str) else pixels
    w = F.col(width) if isinstance(width, str) else width
    h = F.col(height) if isinstance(height, str) else height

    def g(r, c):
        return px[
            (
                F.floor(r * h / 8) * w + F.floor(c * w / 9)
            ).cast("int")
        ]

    return F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(
            g(F.floor(i / 8), (i % 8) + 1) > g(F.floor(i / 8), i % 8),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def image_near_dup_pairs(
    decoded: DataFrame,
    id_col: str = "doc_id",
    method: str = "ahash",
    bands: int = 4,
    max_hamming: int = 6,
    max_bucket_size: int | None = 1000,
    observation=None,
    oversize: str = "drop",
) -> DataFrame:
    """Near-duplicate image pairs over decode_image output: perceptual
    hash (``method`` = 'ahash' or 'dhash') -> banded LSH candidates ->
    exact Hamming confirm.

    Scale shape: the 64-bit hash splits into ``bands`` equal bit-bands
    (identical copies share EVERY band; a pair within Hamming distance
    d survives banding unless its differing bits hit every band — the
    standard LSH recall s-curve), candidate generation is the SAME
    window-capped / star-mode bucket core as the text MinHash path
    (``dedup._banded_bucket_pairs`` — runaway buckets of boilerplate
    images obey the same cap telemetry, :func:`dedup.warn_capped_buckets`
    reads the same Observation), and only candidates pay the exact
    64-bit Hamming distance (two thin joins on the id). Returns
    (doc_a, doc_b, hamming) with ``hamming <= max_hamming``.

    Everything is exact integer arithmetic end-to-end, so the pipeline
    is engine-replayable — certified by the image_phash_near_dup
    oracle. A re-encoded copy (same pixels, different container bytes)
    hashes identically by construction: the hash never sees bytes.
    """
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        _banded_bucket_pairs,
    )

    if method not in ("ahash", "dhash"):
        raise ValueError(
            f"image_near_dup_pairs: method={method!r} must be "
            "'ahash' or 'dhash'"
        )
    if 64 % bands != 0:
        raise ValueError(
            f"image_near_dup_pairs: bands={bands} must divide 64 "
            "(ragged bands would silently weight bits unevenly)"
        )
    if oversize not in ("drop", "star"):
        raise ValueError(
            f"image_near_dup_pairs: oversize={oversize!r} must be "
            "'drop' or 'star'"
        )
    if observation is not None and max_bucket_size is None:
        raise ValueError(
            "image_near_dup_pairs: observation requires max_bucket_size "
            "(no cap means no metrics; Observation.get would never "
            "return)"
        )
    if method == "ahash":
        # Staged form of ahash_bits: the interpreted HOF path has no
        # common-subexpression elimination across a lambda boundary, so
        # the one-expression form re-runs the 64-element total fold
        # under every one of the 64 bits (~4k ops/row — measured 6s
        # over 5k sf0.1 rows, the whole query's hot spot). Materialize
        # (sample, total) behind a checkpoint so the bit comparison
        # reads two ATTRIBUTES: one sample pass + one fold + 64
        # compares per row. Output pinned bit-identical to ahash_bits
        # by unit test; the checkpointed frame is 64 ints + a bigint
        # per row.
        smp = decoded.select(
            F.col(id_col),
            _ahash_sample(F.col("pixels"), F.col("width"), F.col("height"))
            .alias("__smp"),
        )
        smpt = smp.select(
            F.col(id_col),
            F.col("__smp"),
            F.aggregate(
                F.col("__smp"),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x.cast("bigint"),
            ).alias("__tot"),
        ).transform(_materialize)
        hashed = smpt.select(
            F.col(id_col),
            F.transform(
                F.col("__smp"),
                lambda x: F.when(
                    x.cast("bigint") * 64 > F.col("__tot"), F.lit(1)
                ).otherwise(F.lit(0)),
            ).alias("__bits"),
        ).transform(_materialize)  # reused by buckets AND confirms
    else:
        hashed = decoded.select(
            F.col(id_col),
            dhash_bits("pixels", "width", "height").alias("__bits"),
        ).transform(_materialize)  # reused by buckets AND confirms
    rows = 64 // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "",
                *[
                    F.col("__bits")[b * rows + j].cast("string")
                    for j in range(rows)
                ],
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    buckets = hashed.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.col("bb.band_hash").alias("band_hash"),
    )
    cand = _banded_bucket_pairs(
        buckets, id_col, max_bucket_size, observation, oversize,
        caller="image_near_dup_pairs",
    )
    ha = hashed.select(
        F.col(id_col).alias("__ia"), F.col("__bits").alias("__ba")
    )
    hb = hashed.select(
        F.col(id_col).alias("__ib"), F.col("__bits").alias("__bb2")
    )
    return (
        cand.join(ha, cand.doc_a == F.col("__ia"))
        .join(hb, cand.doc_b == F.col("__ib"))
        .select(
            "doc_a",
            "doc_b",
            F.aggregate(
                F.zip_with(
                    F.col("__ba"),
                    F.col("__bb2"),
                    lambda x, y: F.when(x != y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def normalize_per_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "norm"
) -> DataFrame:
    """Grouped-map applyInPandas: per-group min-max normalization.

    The grouped Pandas-UDF scale path (Arrow batch per group) for logic
    that genuinely wants a dataframe library — here deliberately chosen
    with EXACT semantics (min/max involve no summation, so results are
    bit-identical to any SQL engine and oracle-checkable; single-value
    groups normalize to 0.0). At 100 TB the shuffle key is the group
    column; groups must fit in executor memory — the standard
    applyInPandas contract.
    """
    schema = f"{group_col} long, {value_col} double, {out_col} double"

    def norm(pdf):
        lo, hi = pdf[value_col].min(), pdf[value_col].max()
        span = hi - lo
        pdf = pdf[[group_col, value_col]].copy()
        pdf[out_col] = 0.0 if span == 0 else (pdf[value_col] - lo) / span
        return pdf

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(norm, schema)
