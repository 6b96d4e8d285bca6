"""REAL pixel decode: baseline JPEG (JFIF / ITU T.81 SOF0) — a
from-scratch codec, no image library.

This closes the last "not attempted" codec from the multimodal family
(BMP/WAV/PNG/GIF are real as of rounds 3-4; JPEG was documented as
needing a DCT).  numpy IS in this container, so the DCT is an 8x8
orthonormal matrix product — everything else (markers, Huffman,
zigzag, byte stuffing, restart intervals, chroma subsampling,
fixed-point colour conversion) is plain integer Python.

Reference analogue: the PIL/pdf2image raster side of
/root/reference/pdfextraction.py:16,72-73 (convert_from_bytes yields
JPEG-backed PIL images).  The reference shells out to poppler for the
pixels; this module implements the decode itself.

Oracle strategy (mirrors PNG/GIF): the synthesizer emits images that
are CONSTANT per 16x16 MCU, so every 8x8 block is DC-only and the
lossy DCT-quantize-IDCT pipeline is EXACTLY invertible (quant tables
are all 1s; the DC of a constant block is 8*(v-128), an integer).
Colour conversion runs in documented fixed-point integer arithmetic
that the DuckDB twin replays verbatim — so the oracle never parses
JPEG, yet any defect in the marker walk, Huffman tables, bit packing,
restart handling, subsampling or IDCT breaks the value hash.  The
full AC path (runs, ZRL, EOB, multi-symbol blocks) is exercised
exactly in pytest by comparing the bitstream round trip against a
coefficient-domain replay (Huffman is lossless, so they must agree
bit-for-bit on ANY content and ANY quant table).

Fixed-point colour model (the contract the oracle replays; all
divisions are on non-negative values because DuckDB's // truncates
toward zero while Python's floors):

  Y  = (19595*R + 38470*G +  7471*B + 32768) // 65536
  Cb = min(255, (8388608 - 11058*R - 21710*G + 32768*B + 32768) // 65536)
  Cr = min(255, (8388608 + 32768*R - 27439*G -  5329*B + 32768) // 65536)

  R' = clamp((Y*65536 +  91881*(Cr-128)                 + 32768 + 16777216) // 65536 - 256)
  G' = clamp((Y*65536 -  22554*(Cb-128) - 46802*(Cr-128) + 32768 + 16777216) // 65536 - 256)
  B' = clamp((Y*65536 + 116130*(Cb-128)                 + 32768 + 16777216) // 65536 - 256)
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

# ---------------------------------------------------------------------------
# DCT: 8x8 orthonormal DCT-II matrix.  M[u, x] = 0.5 * c(u) * cos((2x+1)u pi/16)
# with c(0) = 1/sqrt(2).  M is orthogonal, so FDCT = M s M^T, IDCT = M^T S M.
# ---------------------------------------------------------------------------

from pdf_extraction_spark.operators.balance import rebalance_if_undersplit

_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 ** 0.5) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_DCT_MT = _DCT_M.T.copy()


def fdct2(block: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT of one level-shifted 8x8 block (float64)."""
    return _DCT_M @ block @ _DCT_MT


def idct2(coef: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT of one 8x8 coefficient block (float64)."""
    return _DCT_MT @ coef @ _DCT_M


# Zigzag index k -> raster index within the 8x8 block (T.81 figure 5).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# ---------------------------------------------------------------------------
# Huffman tables: the T.81 Annex K "typical" tables every real encoder
# ships.  (bits[i] = #codes of length i+1, then the symbol list.)  The
# decoder NEVER assumes these — it builds tables from the file's DHT
# segments — but the synthesizer emits them so the blobs match
# real-world JPEGs.
# ---------------------------------------------------------------------------

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


@lru_cache(maxsize=64)
def _codes_cached(bits: bytes, vals: bytes) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                # more codes than the canonical space holds (violates
                # Kraft): a corrupt DHT must fail parse, not crash the
                # LUT build with an out-of-range index
                raise ValueError("invalid Huffman code counts")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    return _codes_cached(bytes(bits), bytes(vals))


@lru_cache(maxsize=64)
def _decode_lut(bits: bytes, vals: bytes) -> list[int]:
    """65536-entry lookup for 16-bit-peek Huffman decoding: index with the
    next 16 bits of the stream, get (length << 8) | symbol (0 = invalid
    prefix).  Built once per distinct table (cached), so per-image DHT
    parsing costs a dict probe, not a table rebuild."""
    lut = [0] * 65536
    for sym, (code, ln) in _codes_cached(bits, vals).items():
        base = code << (16 - ln)
        packed = (ln << 8) | sym
        for i in range(base, base + (1 << (16 - ln))):
            lut[i] = packed
    return lut


def build_huffman_decoder(bits: list[int], vals: list[int]) -> list[int]:
    """Decoder table for one DHT definition (the 16-bit-peek LUT)."""
    return _decode_lut(bytes(bits), bytes(vals))


# ---------------------------------------------------------------------------
# Fixed-point colour conversion (the documented oracle contract).
# All intermediate values are non-negative before the >>16 so Python
# floor-division and DuckDB truncating-division agree.
# ---------------------------------------------------------------------------


def rgb_to_ycbcr(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    r = r.astype(np.int64)
    g = g.astype(np.int64)
    b = b.astype(np.int64)
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = np.minimum(255, (8388608 - 11058 * r - 21710 * g + 32768 * b + 32768) >> 16)
    cr = np.minimum(255, (8388608 + 32768 * r - 27439 * g - 5329 * b + 32768) >> 16)
    return y, cb, cr


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    y = y.astype(np.int64)
    cbd = cb.astype(np.int64) - 128
    crd = cr.astype(np.int64) - 128
    bias = 32768 + 16777216

    def fin(v):
        return np.clip((v >> 16) - 256, 0, 255)

    r = fin((y << 16) + 91881 * crd + bias)
    g = fin((y << 16) - 22554 * cbd - 46802 * crd + bias)
    b = fin((y << 16) + 116130 * cbd + bias)
    return r, g, b


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit packer with JPEG byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def align_ones(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)


def _magnitude_size(v: int) -> int:
    s = 0
    v = abs(v)
    while v:
        s += 1
        v >>= 1
    return s


def _encode_block(
    writer: _BitWriter,
    zz: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    last_nz: int = 63,
) -> int:
    """Huffman-encode one zigzagged quantized block; returns the new DC
    predictor.  ``last_nz`` is the index of the last nonzero AC entry
    (0 = DC-only), precomputed vectorized by _quantize_plane so the
    common smooth/DC-only block skips the 64-entry scan.  Raises
    ValueError on coefficients outside baseline range."""
    dc = zz[0]
    diff = dc - pred
    size = _magnitude_size(diff)
    if size > 11:
        raise ValueError("DC difference out of baseline range")
    code, ln = dc_codes[size]
    writer.put(code, ln)
    if size:
        writer.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zln = ac_codes[0xF0]
            writer.put(zrl, zln)
            run -= 16
        size = _magnitude_size(v)
        if size > 10:
            raise ValueError("AC coefficient out of baseline range")
        code, ln = ac_codes[(run << 4) | size]
        writer.put(code, ln)
        writer.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run or last_nz < 63:
        eob, eln = ac_codes[0x00]
        writer.put(eob, eln)
    return dc


_ZZ_ARR = np.array(ZIGZAG)


def _quantize_block(pixels: np.ndarray, qtable: np.ndarray) -> list[int]:
    """Level-shift, FDCT, quantize, zigzag one 8x8 uint8 block."""
    coef = fdct2(pixels.astype(np.float64) - 128.0)
    q = np.floor(coef / qtable + 0.5).astype(np.int64)
    flat = q.reshape(64)
    return [int(flat[ZIGZAG[k]]) for k in range(64)]


def _quantize_plane(
    plane: np.ndarray, qtable: np.ndarray
) -> tuple[list[list[int]], list[int]]:
    """Batched _quantize_block over a padded plane: one FDCT for every
    8x8 block, returning (zigzagged coefficient rows, last-nonzero
    index per row) in raster block order (row-major (by, bx))."""
    ph, pw = plane.shape
    blocks = (
        plane.astype(np.float64).reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        - 128.0
    )
    # batched FDCT  M b M^T  via two broadcasted matmuls (no einsum —
    # its per-call path search costs more than the 8x8 contraction)
    coef = np.matmul(np.matmul(_DCT_M, blocks.reshape(-1, 8, 8)), _DCT_MT)
    q = np.floor(coef / qtable + 0.5).astype(np.int64)
    qz = q.reshape(-1, 64)[:, _ZZ_ARR]
    nz = qz != 0
    last_nz = np.where(nz[:, 1:].any(axis=1), 63 - np.argmax(nz[:, :0:-1], axis=1), 0)
    return qz.tolist(), last_nz.tolist()


def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def _prepare_planes(img, luma_q, chroma_q):
    """The shared lossy pixel pipeline BOTH encoders (baseline and
    progressive) run before entropy coding: validate, pad to the MCU
    grid by edge replication, fixed-point RGB->YCbCr, 4:2:0 chroma
    subsampling (2x2 integer mean, round-half-up).  Keeping this in one
    place is what makes the progressive==baseline pixel-exact
    cross-check in tests/test_jpeg_progressive.py meaningful.  Returns
    (gray, h, w, mcux, mcuy, [(plane, qtable, hs, vs)], lq, cq)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    lq = np.ones((8, 8), np.int64) if luma_q is None else np.asarray(luma_q, np.int64)
    cq = np.ones((8, 8), np.int64) if chroma_q is None else np.asarray(chroma_q, np.int64)
    if (lq < 1).any() or (lq > 255).any() or (cq < 1).any() or (cq > 255).any():
        raise ValueError("8-bit quant tables only")
    mcu = 8 if gray else 16
    mcux = (w + mcu - 1) // mcu
    mcuy = (h + mcu - 1) // mcu
    padw, padh = mcux * mcu, mcuy * mcu
    if gray:
        ypl = np.pad(img, ((0, padh - h), (0, padw - w)), mode="edge").astype(np.int64)
        planes = [(ypl, lq, 1, 1)]
    else:
        padded = np.pad(img, ((0, padh - h), (0, padw - w), (0, 0)), mode="edge")
        y, cb, cr = rgb_to_ycbcr(padded[:, :, 0], padded[:, :, 1], padded[:, :, 2])

        # 4:2:0: integer mean of each 2x2 with round-half-up
        def sub(p):
            return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2

        planes = [(y, lq, 2, 2), (sub(cb), cq, 1, 1), (sub(cr), cq, 1, 1)]
    return gray, h, w, mcux, mcuy, planes, lq, cq


def encode_baseline_jpeg(
    img: np.ndarray,
    *,
    luma_q: np.ndarray | None = None,
    chroma_q: np.ndarray | None = None,
    restart_interval: int = 0,
    extra_segments: bytes = b"",
    interleave: bool = True,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array as a
    baseline JFIF JPEG.  Colour images use 4:2:0 subsampling (2x2
    integer-mean chroma) — the layout virtually all camera/web JPEGs
    use; grayscale is a single non-subsampled component.  Quant tables
    default to all-1s (the exactness contract for constant blocks);
    pass real tables for lossy realism.  ``restart_interval`` > 0 emits
    DRI + RSTn markers every that-many MCUs.  ``extra_segments`` is
    spliced between APP0 and DQT so tests can plant COM/APPn blocks the
    decoder must skip."""
    gray, h, w, mcux, mcuy, planes, lq, cq = _prepare_planes(img, luma_q, chroma_q)

    dc_l = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    comp_tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * 2

    # quantize every block of every plane in one batched FDCT per plane,
    # then walk MCUs emitting the entropy-coded stream
    quantized = [_quantize_plane(plane, qt) for plane, qt, _, _ in planes]
    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    header = _header_bytes(
        h, w, gray, lq.tobytes(), cq.tobytes(), restart_interval, extra_segments,
        interleave,
    )
    if not interleave:
        # sequential layout (T.81 A.2.2): one SOS per component, blocks
        # in raster order over the component's OWN ceil(samples/8) grid
        # (padding blocks beyond it are never transmitted)
        out = bytearray(header)
        for ci, (plane, qt, hs, vs) in enumerate(planes):
            dcc, acc = comp_tables[ci] if not gray else (dc_l, ac_l)
            rows, lasts = quantized[ci]
            bw = plane.shape[1] // 8
            compw = (w * hs + hmax - 1) // hmax
            comph = (h * vs + vmax - 1) // vmax
            nbx, nby = (compw + 7) // 8, (comph + 7) // 8
            tsel = 0 if ci == 0 else 1
            sos = bytes([1, ci + 1, (tsel << 4) | tsel, 0, 63, 0])
            out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
            writer = _BitWriter()
            pred = 0
            unit = 0
            rst_idx = 0
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and unit and unit % restart_interval == 0:
                        writer.align_ones()
                        writer.out += bytes([0xFF, 0xD0 + rst_idx])
                        rst_idx = (rst_idx + 1) & 7
                        pred = 0
                    unit += 1
                    n = by * bw + bx
                    pred = _encode_block(writer, rows[n], pred, dcc, acc, lasts[n])
            writer.align_ones()
            out += writer.out
        return bytes(out) + b"\xff\xd9"
    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.align_ones()
                writer.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) & 7
                preds = [0] * len(planes)
            for ci, (plane, qt, hs, vs) in enumerate(planes):
                dcc, acc = comp_tables[ci] if not gray else (dc_l, ac_l)
                rows, lasts = quantized[ci]
                nbx = plane.shape[1] // 8
                for by in range(vs):
                    for bx in range(hs):
                        n = (my * vs + by) * nbx + (mx * hs + bx)
                        preds[ci] = _encode_block(
                            writer, rows[n], preds[ci], dcc, acc, lasts[n]
                        )
            mcu_count += 1
    writer.align_ones()

    return header + bytes(writer.out) + b"\xff\xd9"  # EOI


@lru_cache(maxsize=256)
def _header_bytes(
    h: int,
    w: int,
    gray: bool,
    lq_raw: bytes,
    cq_raw: bytes,
    restart_interval: int,
    extra_segments: bytes,
    interleave: bool = True,
) -> bytes:
    """Everything before the entropy-coded data (SOI..SOS — or SOI..DRI
    when ``interleave`` is False: sequential encoders emit their own
    per-component SOS segments).  Depends only on dims/tables/restart/
    extras, so a synth fleet hitting the same few combinations builds
    each preamble once."""
    lq = np.frombuffer(lq_raw, np.int64).reshape(8, 8)
    cq = np.frombuffer(cq_raw, np.int64).reshape(8, 8)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += extra_segments
    zz_l = bytes(int(lq.reshape(64)[ZIGZAG[k]]) for k in range(64))
    out += seg(0xDB, b"\x00" + zz_l)
    if not gray:
        zz_c = bytes(int(cq.reshape(64)[ZIGZAG[k]]) for k in range(64))
        out += seg(0xDB, b"\x01" + zz_c)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        sof += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC0, sof)
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    if interleave:
        sos = bytes([ncomp])
        sos += bytes([1, 0x00]) if gray else bytes([1, 0x00, 2, 0x11, 3, 0x11])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    stops at any real marker, and surfaces RSTn boundaries.  Huffman
    decoding peeks 16 bits and resolves symbols through the cached LUT
    in one probe instead of walking the code bit by bit."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        byte = d[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(d):
                return False
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: consumed via expect_restart
            else:
                return False  # real marker (EOI/next segment): scan is over
        else:
            self.pos += 1
        # mask consumed high bits before shifting the new byte in — the
        # accumulator must stay O(24 bits), not grow with the stream
        # (unmasked, every shift is O(bits consumed so far) and decode
        # goes quadratic in image size)
        self._acc = ((self._acc & ((1 << self._n) - 1)) << 8) | byte
        self._n += 8
        return True

    def read_bit(self) -> int | None:
        if self._n == 0 and not self._fill():
            return None
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int | None:
        while self._n < n:
            if not self._fill():
                return None
        self._n -= n
        return (self._acc >> self._n) & ((1 << n) - 1)

    def decode_huff(self, lut: list[int]) -> int | None:
        while self._n < 16:
            if not self._fill():
                break
        avail = self._n
        if avail == 0:
            return None
        if avail >= 16:
            peek = (self._acc >> (avail - 16)) & 0xFFFF
        else:
            peek = (self._acc << (16 - avail)) & 0xFFFF
        packed = lut[peek]
        ln = packed >> 8
        if ln == 0 or ln > avail:
            return None
        self._n -= ln
        return packed & 0xFF

    def expect_restart(self, idx: int) -> bool:
        """Discard pad bits, consume RSTn, check the modulo-8 sequence."""
        self._acc = 0
        self._n = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            return False
        nxt = d[self.pos + 1]
        if nxt != 0xD0 + (idx & 7):
            return False
        self.pos += 2
        return True


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def parse_jpeg(raw: bytes):
    """Decode a baseline (SOF0) or progressive (SOF2) JFIF blob;
    returns (w, h, channels, pixels) with pixels an (h, w, channels)
    uint8 ndarray (channels 1 or 3, RGB order), or None if the blob is
    not decodable.  Handles: APPn/COM/unknown-segment skip, multi-table
    DQT (8- and 16-bit precision), multi-table DHT, DRI + RSTn sequence
    verification, byte stuffing, interleaved MCUs with per-component
    sampling factors up to 2x2, and JFIF fixed-point colour
    conversion.  Progressive frames decode through the multi-scan path
    (spectral selection + successive approximation, EOBn runs, AC
    refinement — see _decode_progressive_scan).  Arithmetic coding,
    12-bit precision and hierarchical modes return None."""
    n = len(raw)
    if n < 4 or raw[0] != 0xFF or raw[1] != 0xD8:
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], list[int]] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)], progressive)
    store = None  # progressive coefficient accumulators, one per component
    restart_interval = 0
    while pos + 2 <= n:  # EOI is bare (no length), so 2 bytes suffice
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            if store is not None:  # progressive: EOI closes the scan series
                return _finalize_progressive(frame, store, qtables)
            return None  # EOI before SOS
        if pos + 2 > n:
            return None
        seglen = int.from_bytes(raw[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            return None
        body = raw[pos + 2 : pos + seglen]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                b += 1
                cnt = 64 * (2 if prec else 1)
                if b + cnt > len(body):
                    return None
                if prec:
                    vals = [
                        int.from_bytes(body[b + 2 * k : b + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                else:
                    vals = list(body[b : b + 64])
                tab = np.zeros(64, np.int64)
                for k in range(64):
                    tab[ZIGZAG[k]] = vals[k]
                qtables[tid] = tab.reshape(8, 8)
                b += cnt
        elif marker == 0xC4:
            b = 0
            while b + 17 <= len(body):
                tclass, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                cnt = sum(bits)
                if b + 17 + cnt > len(body):
                    return None
                vals = list(body[b + 17 : b + 17 + cnt])
                try:
                    htables[(tclass, tid)] = build_huffman_decoder(bits, vals)
                except ValueError:
                    return None  # non-canonical code counts
                b += 17 + cnt
        elif marker in (0xC0, 0xC2):
            if len(body) < 6 or body[0] != 8:
                return None
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3) or len(body) < 6 + 3 * ncomp or not fh or not fw:
                return None
            comps = []
            for c in range(ncomp):
                cid, sam, tq = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = sam >> 4, sam & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    return None
                comps.append((cid, hs, vs, tq))
            frame = (fh, fw, comps, marker == 0xC2)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline/non-progressive frame
        elif marker == 0xDD:
            if len(body) != 2:
                return None
            restart_interval = int.from_bytes(body, "big")
        elif marker == 0xDA:
            if frame is None or len(body) < 1:
                return None
            fh, fw, comps, progressive = frame
            ns = body[0]
            if len(body) != 1 + 2 * ns + 3 or ns > len(comps) or ns < 1:
                return None
            scan_ci: list[int] = []  # frame-component index per scan component
            tsels: list[tuple[int, int]] = []
            for s in range(ns):
                cs, tsel = body[1 + 2 * s], body[2 + 2 * s]
                match = [i for i, c in enumerate(comps) if c[0] == cs]
                if not match:
                    return None
                scan_ci.append(match[0])
                tsels.append((tsel >> 4, tsel & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if progressive:
                if store is None:
                    store = _progressive_store(fh, fw, comps)
                pos = _decode_progressive_scan(
                    raw, pos + seglen, fh, fw, comps, scan_ci, tsels,
                    ss, se, ah, al, store, htables, restart_interval,
                )
                if pos is None:
                    return None
                continue
            # baseline fast path: the single fully-interleaved scan
            # virtually every real file uses (for one-component frames
            # only with 1x1 sampling — a non-interleaved scan covers
            # ceil(samples/8) blocks, not sampling-factor MCUs)
            if ns == len(comps) and (ns > 1 or comps[0][1] == comps[0][2] == 1):
                scan = []  # hs, vs, tq, td, ta
                for ci, (td, ta) in zip(scan_ci, tsels):
                    _, hs, vs, tq = comps[ci]
                    scan.append((hs, vs, tq, td, ta))
                pixels = _decode_scan(raw, pos + seglen, fh, fw, scan, qtables, htables, restart_interval)
                if pixels is None:
                    return None
                ch = 1 if ns == 1 else 3
                return fw, fh, ch, pixels
            # spec-legal sequential layouts (T.81 A.2.2): per-component
            # or partial-interleave scans accumulate like progressive
            # ones and finalize at EOI
            if store is None:
                store = _progressive_store(fh, fw, comps)
            pos = _decode_baseline_scan_store(
                raw, pos + seglen, fh, fw, comps, scan_ci, tsels,
                store, htables, restart_interval,
            )
            if pos is None:
                return None
            continue
        pos += seglen
    return None


def _decode_scan(raw, pos, fh, fw, scan, qtables, htables, restart_interval):
    hmax = max(s[0] for s in scan)
    vmax = max(s[1] for s in scan)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    # one flat coefficient row per 8x8 block, in (my, mx, by, bx) order;
    # dequant + IDCT + clamp run BATCHED per component after the scan
    coefs: list[list[list[int]]] = []
    for hs, vs, tq, td, ta in scan:
        if tq not in qtables or (0, td) not in htables or (1, ta) not in htables:
            return None
        coefs.append([])
    reader = _BitReader(raw, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    rst_idx = 0
    zz = ZIGZAG
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not reader.expect_restart(rst_idx):
                    return None
                rst_idx = (rst_idx + 1) & 7
                preds = [0] * len(scan)
            for ci, (hs, vs, tq, td, ta) in enumerate(scan):
                dct = htables[(0, td)]
                act = htables[(1, ta)]
                for _ in range(vs * hs):
                    coef = [0] * 64
                    size = reader.decode_huff(dct)
                    if size is None or size > 11:
                        return None
                    if size:
                        bitsv = reader.receive(size)
                        if bitsv is None:
                            return None
                        preds[ci] += _extend(bitsv, size)
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = reader.decode_huff(act)
                        if sym is None:
                            return None
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            return None
                        bitsv = reader.receive(size)
                        if bitsv is None:
                            return None
                        coef[zz[k]] = _extend(bitsv, size)
                        k += 1
                    coefs[ci].append(coef)
            mcu_count += 1
    planes = []
    for ci, (hs, vs, tq, td, ta) in enumerate(scan):
        c = np.asarray(coefs[ci], np.float64).reshape(-1, 8, 8) * qtables[tq]
        # batched IDCT  M^T C M  via two broadcasted matmuls
        px = np.matmul(np.matmul(_DCT_MT, c), _DCT_M)
        px = np.clip(np.floor(px + 128.5), 0, 255).astype(np.int64)
        # (my, mx, by, bx, 8, 8) -> rows (my, by, u), cols (mx, bx, v)
        plane = (
            px.reshape(mcuy, mcux, vs, hs, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * vs * 8, mcux * hs * 8)
        )
        planes.append(plane)
    return _assemble_pixels(planes, [(s[0], s[1]) for s in scan], fh, fw)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode: coefficients accumulate across scans —
# spectral selection picks a zigzag band per scan, successive
# approximation delivers them a bit layer at a time (T.81 Annex G).
# The entropy layer is the hard part: AC first scans use EOBn run
# lengths across whole blocks; AC refinement scans interleave
# correction bits for already-nonzero coefficients with the
# newly-significant ones.  This port follows the reference algorithm
# structure of T.81 G.2 (the same one libjpeg implements).
# ---------------------------------------------------------------------------


def _progressive_store(fh, fw, comps):
    """Per-component coefficient accumulators over the PADDED
    interleaved grid (natural order per 64-row), plus grid geometry:
    (array, bw, bh, nbx, nby) — bw/bh the padded grid, nbx/nby the
    non-interleaved block counts that single-component scans cover."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    store = []
    for cid, hs, vs, tq in comps:
        bw, bh = mcux * hs, mcuy * vs
        compw = (fw * hs + hmax - 1) // hmax
        comph = (fh * vs + vmax - 1) // vmax
        nbx, nby = (compw + 7) // 8, (comph + 7) // 8
        store.append((np.zeros((bh * bw, 64), np.int64), bw, bh, nbx, nby))
    return store


def _refine_nonzero(reader, row, z, p1, m1):
    """Read one correction bit for an already-nonzero coefficient and
    apply it toward larger magnitude (T.81 G.1.2.3 / G.2)."""
    bit = reader.read_bit()
    if bit is None:
        return False
    if bit and (row[z] & p1) == 0:
        row[z] += p1 if row[z] >= 0 else m1
    return True


def _decode_progressive_scan(
    raw, pos, fh, fw, comps, scan_ci, tsels, ss, se, ah, al, store, htables, restart_interval
):
    """Decode one SOS of a progressive frame into the coefficient
    store; returns the byte offset of the next marker, or None."""
    if ss == 0:
        if se != 0:
            return None
        dc_scan = True
    else:
        if se < ss or se > 63 or len(scan_ci) != 1:
            return None
        dc_scan = False
    if al > 13 or (ah and ah != al + 1):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(raw, pos)
    zz = ZIGZAG
    p1, m1 = 1 << al, -(1 << al)

    # build the per-scan-component work list: (coef array, grid width,
    # blocks-per-MCU geometry, huffman tables)
    work = []
    for ci, (td, ta) in zip(scan_ci, tsels):
        arr, bw, bh, nbx, nby = store[ci]
        _, hs, vs, tq = comps[ci]
        if dc_scan and ah == 0 and (0, td) not in htables:
            return None
        if not dc_scan and (1, ta) not in htables:
            return None
        work.append((arr, bw, hs, vs, nbx, nby,
                     htables.get((0, td)), htables.get((1, ta))))

    interleaved = len(scan_ci) > 1
    preds = [0] * len(scan_ci)
    eobrun = 0
    unit = 0  # MCU counter (interleaved) or block counter (single comp)
    rst_idx = 0

    def restart_boundary():
        nonlocal rst_idx, preds, eobrun
        if not reader.expect_restart(rst_idx):
            return False
        rst_idx = (rst_idx + 1) & 7
        preds = [0] * len(scan_ci)
        eobrun = 0
        return True

    if dc_scan:
        units = (
            [(my, mx) for my in range(mcuy) for mx in range(mcux)]
            if interleaved
            else [(by, bx) for by in range(work[0][5]) for bx in range(work[0][4])]
        )
        for uy, ux in units:
            if restart_interval and unit and unit % restart_interval == 0:
                if not restart_boundary():
                    return None
            for wi, (arr, bw, hs, vs, nbx, nby, dct, act) in enumerate(work):
                blocks = (
                    [((uy * vs + by) * bw + (ux * hs + bx))
                     for by in range(vs) for bx in range(hs)]
                    if interleaved
                    else [uy * bw + ux]
                )
                for idx in blocks:
                    if ah == 0:  # DC first: baseline-style diff of dc >> al
                        size = reader.decode_huff(dct)
                        if size is None or size > 11:
                            return None
                        if size:
                            bitsv = reader.receive(size)
                            if bitsv is None:
                                return None
                            preds[wi] += _extend(bitsv, size)
                        arr[idx, 0] = preds[wi] << al
                    else:  # DC refinement: one raw bit per block
                        bit = reader.read_bit()
                        if bit is None:
                            return None
                        if bit:
                            arr[idx, 0] |= p1
            unit += 1
    else:
        arr, bw, hs, vs, nbx, nby, dct, act = work[0]
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and unit and unit % restart_interval == 0:
                    if not restart_boundary():
                        return None
                unit += 1
                row = arr[by * bw + bx]
                if ah == 0:  # AC first scan (T.81 G.2.2)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = reader.decode_huff(act)
                        if sym is None:
                            return None
                        r, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    bitsv = reader.receive(r)
                                    if bitsv is None:
                                        return None
                                    eobrun += bitsv
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            return None
                        bitsv = reader.receive(s)
                        if bitsv is None:
                            return None
                        row[zz[k]] = _extend(bitsv, s) << al
                        k += 1
                else:  # AC refinement scan (T.81 G.2.3)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            sym = reader.decode_huff(act)
                            if sym is None:
                                return None
                            r, s = sym >> 4, sym & 0x0F
                            val = 0
                            if s == 0:
                                if r != 15:
                                    # unlike the first-scan form there is
                                    # no -1: the CURRENT block consumes one
                                    # run slot via the correction-bit tail
                                    eobrun = 1 << r
                                    if r:
                                        bitsv = reader.receive(r)
                                        if bitsv is None:
                                            return None
                                        eobrun += bitsv
                                    break
                                # ZRL: skip 16 zero-history coefficients
                            else:
                                if s != 1:
                                    return None
                                bit = reader.read_bit()
                                if bit is None:
                                    return None
                                val = p1 if bit else m1
                            while k <= se:
                                z = zz[k]
                                if row[z] != 0:
                                    if not _refine_nonzero(reader, row, z, p1, m1):
                                        return None
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                row[zz[k]] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            z = zz[k]
                            if row[z] != 0:
                                if not _refine_nonzero(reader, row, z, p1, m1):
                                    return None
                            k += 1
                        eobrun -= 1
    # skip the pad bits and land on the next marker for the outer walk
    pos = reader.pos
    n = len(raw)
    while pos < n and raw[pos] != 0xFF:
        pos += 1
    return pos


def _decode_baseline_scan_store(
    raw, pos, fh, fw, comps, scan_ci, tsels, store, htables, restart_interval
):
    """One baseline (full-coefficient) scan of a sequential multi-scan
    file, accumulated into the store: non-interleaved block geometry
    when the scan holds one component (T.81 A.2.2 — the MCU is a single
    data unit over ceil(samples/8) blocks), frame-factor interleave
    otherwise.  Returns the offset of the next marker, or None."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    work = []
    for ci, (td, ta) in zip(scan_ci, tsels):
        if (0, td) not in htables or (1, ta) not in htables:
            return None
        arr, bw, bh, nbx, nby = store[ci]
        _, hs, vs, tq = comps[ci]
        work.append((arr, bw, hs, vs, nbx, nby, htables[(0, td)], htables[(1, ta)]))
    interleaved = len(scan_ci) > 1
    reader = _BitReader(raw, pos)
    preds = [0] * len(scan_ci)
    unit = 0
    rst_idx = 0
    zz = ZIGZAG
    units = (
        [(my, mx) for my in range(mcuy) for mx in range(mcux)]
        if interleaved
        else [(by, bx) for by in range(work[0][5]) for bx in range(work[0][4])]
    )
    for uy, ux in units:
        if restart_interval and unit and unit % restart_interval == 0:
            if not reader.expect_restart(rst_idx):
                return None
            rst_idx = (rst_idx + 1) & 7
            preds = [0] * len(scan_ci)
        for wi, (arr, bw, hs, vs, nbx, nby, dct, act) in enumerate(work):
            idxs = (
                [(uy * vs + by) * bw + (ux * hs + bx)
                 for by in range(vs) for bx in range(hs)]
                if interleaved
                else [uy * bw + ux]
            )
            for idx in idxs:
                row = arr[idx]
                size = reader.decode_huff(dct)
                if size is None or size > 11:
                    return None
                if size:
                    bitsv = reader.receive(size)
                    if bitsv is None:
                        return None
                    preds[wi] += _extend(bitsv, size)
                row[0] = preds[wi]
                k = 1
                while k < 64:
                    sym = reader.decode_huff(act)
                    if sym is None:
                        return None
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        return None
                    bitsv = reader.receive(size)
                    if bitsv is None:
                        return None
                    row[zz[k]] = _extend(bitsv, size)
                    k += 1
        unit += 1
    pos = reader.pos
    n = len(raw)
    while pos < n and raw[pos] != 0xFF:
        pos += 1
    return pos


def _finalize_progressive(frame, store, qtables):
    fh, fw, comps, _ = frame
    planes = []
    factors = []
    for (cid, hs, vs, tq), (arr, bw, bh, nbx, nby) in zip(comps, store):
        if tq not in qtables:
            return None
        c = arr.astype(np.float64).reshape(-1, 8, 8) * qtables[tq]
        px = np.matmul(np.matmul(_DCT_MT, c), _DCT_M)
        px = np.clip(np.floor(px + 128.5), 0, 255).astype(np.int64)
        plane = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        planes.append(plane)
        factors.append((hs, vs))
    pixels = _assemble_pixels(planes, factors, fh, fw)
    return fw, fh, (1 if len(comps) == 1 else 3), pixels


def _assemble_pixels(planes, factors, fh, fw):
    """Upsample chroma by replication to the luma grid, colour-convert,
    and crop to the frame dims.  ``factors`` is [(hs, vs)] per plane."""
    if len(planes) == 1:
        return planes[0][:fh, :fw].astype(np.uint8)[:, :, None]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    full = []
    for p, (hs, vs) in zip(planes, factors):
        if hs != hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs != vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        full.append(p[:fh, :fw])
    r, g, b = ycbcr_to_rgb(full[0], full[1], full[2])
    return np.stack([r, g, b], axis=2).astype(np.uint8)


# ---------------------------------------------------------------------------
# Synthesizer for the oracle entry: constant-per-MCU colour images.
# ---------------------------------------------------------------------------


def _jpeg_dims(media_id: int) -> tuple[int, int]:
    return 16 + media_id % 5 * 7, 16 + media_id % 4 * 9  # w in 16..44, h in 16..43


def _mcu_rgb(media_id: int, my: int, mx: int) -> tuple[int, int, int]:
    d = hashlib.md5(f"{media_id}:j{my}:{mx}".encode()).digest()
    return d[0], d[1], d[2]


def _synth_mcu_image(media_id: int) -> np.ndarray:
    """The constant-per-16x16-MCU RGB image both JPEG synthesizers
    encode — the geometry/colour formulas the DuckDB oracle mirrors
    analytically, so it must exist exactly once."""
    w, h = _jpeg_dims(media_id)
    mcux = (w + 15) // 16
    mcuy = (h + 15) // 16
    img = np.zeros((mcuy * 16, mcux * 16, 3), np.uint8)
    for my in range(mcuy):
        for mx in range(mcux):
            img[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = _mcu_rgb(media_id, my, mx)
    return img[:h, :w]


def synth_jpeg_bytes(media_id: int) -> bytes:
    """A real baseline JFIF blob from an integer id: w = 16 + id%5*7,
    h = 16 + id%4*9 (non-multiples of 16 exercise edge padding), RGB
    constant per 16x16 MCU from md5(id:jmy:mx) (analytically mirrored
    by the DuckDB oracle), quant tables all 1s (the constant-block
    exactness contract), a COM segment the parser must skip, and a
    2-MCU restart interval for ids with id % 3 == 0 so RSTn handling
    is exercised inside the driver-checked entry."""
    return encode_baseline_jpeg(
        _synth_mcu_image(media_id),
        restart_interval=2 if media_id % 3 == 0 else 0,
        extra_segments=b"\xff\xfe\x00\x0bsynthetic",
    )


def synth_jpeg_progressive_bytes(media_id: int) -> bytes:
    """The same constant-per-MCU image as synth_jpeg_bytes, encoded as
    a progressive (SOF2) file: identical quantized coefficients, so the
    decoded pixels — and therefore the analytic oracle — are identical
    to the baseline entry's."""
    from pdf_extraction_spark.operators.jpeg_progressive import (
        encode_progressive_jpeg,
    )

    return encode_progressive_jpeg(
        _synth_mcu_image(media_id), restart_interval=2 if media_id % 3 == 0 else 0
    )


def _parse_exif_orientation(body: bytes) -> int | None:
    """Orientation (tag 0x0112) from an APP1 Exif payload: TIFF header
    (II little / MM big endian), IFD0 entry walk.  None if absent or
    malformed — callers fall back to the default orientation 1."""
    if not body.startswith(b"Exif\x00\x00"):
        return None
    t = body[6:]
    if len(t) < 8:
        return None
    if t[:2] == b"II":
        bo = "little"
    elif t[:2] == b"MM":
        bo = "big"
    else:
        return None
    if int.from_bytes(t[2:4], bo) != 42:
        return None
    off = int.from_bytes(t[4:8], bo)
    if off + 2 > len(t):
        return None
    cnt = int.from_bytes(t[off : off + 2], bo)
    for i in range(cnt):
        e = off + 2 + 12 * i
        if e + 12 > len(t):
            return None
        if int.from_bytes(t[e : e + 2], bo) == 0x0112:
            if int.from_bytes(t[e + 2 : e + 4], bo) != 3:  # SHORT
                return None
            return int.from_bytes(t[e + 8 : e + 10], bo)
    return None


def exif_app1_segment(orientation: int, little: bool = True) -> bytes:
    """A minimal spec-shaped APP1 Exif segment carrying one IFD0 entry
    (Orientation) — what the synthesizer plants so the probe's TIFF
    walk is exercised in both byte orders."""
    bo = "little" if little else "big"
    t = (b"II" if little else b"MM") + (42).to_bytes(2, bo) + (8).to_bytes(4, bo)
    t += (1).to_bytes(2, bo)  # one IFD0 entry
    t += (
        (0x0112).to_bytes(2, bo)
        + (3).to_bytes(2, bo)
        + (1).to_bytes(4, bo)
        + orientation.to_bytes(2, bo)
        + b"\x00\x00"
    )
    t += (0).to_bytes(4, bo)  # no next IFD
    body = b"Exif\x00\x00" + t
    return b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body


def jpeg_dimensions(raw: bytes):
    """Header-only probe: (width, height, channels, progressive,
    orientation) from the SOF + APP1 segments WITHOUT decoding any
    entropy data — the right operator shape for 'dimensions of 100 TB
    of images': a few hundred header bytes read per blob instead of a
    full decode.  Orientation is the Exif tag (1 when absent).
    Returns None if no SOF frame appears before the scan data."""
    n = len(raw)
    if n < 4 or raw[0] != 0xFF or raw[1] != 0xD8:
        return None
    pos = 2
    orientation = 1
    sof_markers = frozenset(
        [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
    )
    while pos + 4 <= n:
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xD9, 0xDA):
            return None  # hit the end / scan data without seeing a frame
        if pos + 2 > n:
            return None
        seglen = int.from_bytes(raw[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            return None
        if marker == 0xE1:
            o = _parse_exif_orientation(raw[pos + 2 : pos + seglen])
            if o is not None:
                orientation = o
        elif marker in sof_markers:
            body = raw[pos + 2 : pos + seglen]
            if len(body) < 6:
                return None
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if not fh or not fw or not ncomp:
                return None
            return fw, fh, ncomp, 1 if marker == 0xC2 else 0, orientation
        pos += seglen
    return None


JPEG_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("progressive", IntegerType()),
        StructField("orientation", IntegerType()),
        StructField("is_valid", IntegerType()),
    ]
)


def _jpeg_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {f.name: [] for f in JPEG_META_SCHEMA.fields}
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            meta = jpeg_dimensions(bytes(blob))
            out["media_id"].append(int(mid))
            if meta is None:
                for k in ("width", "height", "channels", "progressive", "orientation"):
                    out[k].append(None)
                out["is_valid"].append(0)
                continue
            w, h, ch, prog, orient = meta
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(ch)
            out["progressive"].append(prog)
            out["orientation"].append(orient)
            out["is_valid"].append(1)
        yield pd.DataFrame(out)


def probe_jpeg(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Header-only JPEG metadata (Arrow-batched mapInPandas over
    jpeg_dimensions): no entropy decode, no IDCT — scan-local and
    orders of magnitude cheaper than decode_jpeg."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_jpeg_meta_batches, schema=JPEG_META_SCHEMA)


JPEG_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_r_milli", LongType()),
        StructField("mean_g_milli", LongType()),
        StructField("mean_b_milli", LongType()),
        StructField("tl_r", IntegerType()),
        StructField("tl_g", IntegerType()),
        StructField("tl_b", IntegerType()),
        StructField("is_valid", IntegerType()),
    ]
)


def _jpeg_synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": [int(m) for m in pdf["media_id"]],
                "blob": [synth_jpeg_bytes(int(m)) for m in pdf["media_id"]],
            }
        )


def synth_jpeg(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, blob) with a real baseline JPEG per id (Arrow-batched
    mapInPandas, same shape as synth_png/synth_gif)."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return rebalance_if_undersplit(src).mapInPandas(_jpeg_synth_batches, schema="media_id long, blob binary")


def _jpeg_prog_synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": [int(m) for m in pdf["media_id"]],
                "blob": [synth_jpeg_progressive_bytes(int(m)) for m in pdf["media_id"]],
            }
        )


def synth_jpeg_progressive(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, blob) with a real progressive (SOF2) JPEG per id."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return rebalance_if_undersplit(src).mapInPandas(_jpeg_prog_synth_batches, schema="media_id long, blob binary")


def synth_jpeg_mixed_bytes(media_id: int) -> bytes:
    """Baseline JPEG for even ids, progressive for odd, each carrying
    an APP1 Exif segment with orientation = id % 8 + 1 (little-endian
    TIFF for most ids, big-endian when id % 3 == 0) — so the metadata
    probe must classify the frame type AND walk both byte orders."""
    img = _synth_mcu_image(media_id)
    exif = exif_app1_segment(media_id % 8 + 1, little=media_id % 3 != 0)
    if media_id % 2 == 0:
        return encode_baseline_jpeg(img, extra_segments=exif)
    from pdf_extraction_spark.operators.jpeg_progressive import (
        encode_progressive_jpeg,
    )

    return encode_progressive_jpeg(img, extra_segments=exif)


def _jpeg_mixed_synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": [int(m) for m in pdf["media_id"]],
                "blob": [synth_jpeg_mixed_bytes(int(m)) for m in pdf["media_id"]],
            }
        )


def synth_jpeg_mixed(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, blob): baseline JPEG for even ids, progressive for odd
    — so a downstream probe/decode must classify the frame type itself."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return rebalance_if_undersplit(src).mapInPandas(_jpeg_mixed_synth_batches, schema="media_id long, blob binary")


def _jpeg_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {f.name: [] for f in JPEG_DECODE_SCHEMA.fields}
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            parsed = parse_jpeg(bytes(blob))
            out["media_id"].append(int(mid))
            if parsed is None:
                for k in out:
                    if k not in ("media_id", "is_valid"):
                        out[k].append(None)
                out["is_valid"].append(0)
                continue
            w, h, ch, px = parsed
            npx = w * h
            sums = px.astype(np.int64).sum(axis=(0, 1))
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(ch)
            out["mean_r_milli"].append(int(sums[0]) * 1000 // npx)
            out["mean_g_milli"].append(int(sums[min(1, ch - 1)]) * 1000 // npx)
            out["mean_b_milli"].append(int(sums[min(2, ch - 1)]) * 1000 // npx)
            out["tl_r"].append(int(px[0, 0, 0]))
            out["tl_g"].append(int(px[0, 0, min(1, ch - 1)]))
            out["tl_b"].append(int(px[0, 0, min(2, ch - 1)]))
            out["is_valid"].append(1)
        yield pd.DataFrame(out)


def decode_jpeg(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL baseline-JPEG pixel decode (Arrow-batched mapInPandas):
    marker walk + Huffman + dequant + IDCT + 4:2:0 upsample + fixed-
    point colour conversion, then per-channel means and the top-left
    pixel — the same stats contract as decode_png/decode_gif."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_jpeg_decode_batches, schema=JPEG_DECODE_SCHEMA)
