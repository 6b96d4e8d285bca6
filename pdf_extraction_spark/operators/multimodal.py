"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The reference (`ajmal624/Pdf_extraction`) renders PDF pages to images and
OCRs them (pdfextraction.py:72-73, via poppler + tesseract subprocesses).
Neither library exists in this environment and shelling out is forbidden,
so the *pixel/sample decode* step is stubbed (``decode_image`` raises
``NotImplementedError`` unless given ``fake=True``), while everything
Spark-side is REAL and tested: the binary container format, header parse
(pure JVM expressions), Arrow batch shape through ``mapInPandas``,
byte-level feature extraction, and video-style frame sampling (byte
slicing + hashing — no image lib needed).

Container format ``IMG1`` (ours, deterministic):

    offset  size  field
    0       4     magic  b"IMG1"
    4       2     width  uint16 big-endian
    6       2     height uint16 big-endian
    8       1     channels uint8
    9       n     payload (opaque pixel/sample/frame bytes)

At 100 TB scale the blobs live in their own parquet files; every operator
below selects only the columns it needs so Catalyst prunes the fat binary
column out of scans that read metadata alone.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_extraction_spark.operators.balance import rebalance_if_undersplit

MAGIC_HEX = "494d4731"  # b"IMG1"
HEADER_LEN = 9


# ---------------------------------------------------------------------------
# Synthesis (tests/bench only): deterministic blob from an integer id
# ---------------------------------------------------------------------------

def synth_blob(id_col: Column) -> Column:
    """Deterministic IMG1 blob from an integer id — pure JVM expressions.

    width = 1 + id % 64, height = 1 + id % 48, channels = 3,
    payload = 64 bytes: md5(id || ':' || i) for i in 0..3 concatenated.
    The DuckDB oracle builds the identical hex string with printf/md5.
    """
    sid = id_col.cast("string")
    payload = F.concat(
        *[F.md5(F.concat(sid, F.lit(f":{i}"))) for i in range(4)]
    )
    header = F.concat(
        F.lit(MAGIC_HEX),
        F.format_string("%04x", (id_col % 64 + 1).cast("int")),
        F.format_string("%04x", (id_col % 48 + 1).cast("int")),
        F.lit("03"),
    )
    return F.unhex(F.concat(header, payload))


def synth_media(df: DataFrame, id_col: str) -> DataFrame:
    """(id, media_kind, blob) — a fake multimodal table for tests/bench."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_kind"),
        synth_blob(F.col(id_col)).alias("blob"),
    )


# ---------------------------------------------------------------------------
# Metadata decode — JVM-side header parse (no Python)
# ---------------------------------------------------------------------------

def _be_uint(blob: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from ``nbytes`` bytes at 1-based ``pos``."""
    return F.conv(F.hex(F.expr(f"substring(blob, {pos}, {nbytes})")), 16, 10).cast(
        "long"
    )


def decode_metadata(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Parse the IMG1 header into typed metadata columns, fully JVM-side.

    Output: (media_id, is_valid, width, height, channels, payload_bytes).
    Invalid magic -> is_valid=false with null dims (per-row containment,
    mirroring the reference's per-document try/except F18).
    """
    b = df.select(
        F.col(id_col).alias("media_id"), F.col(blob_col).alias("blob")
    )
    valid = (F.length("blob") >= HEADER_LEN) & (
        F.lower(F.hex(F.expr("substring(blob, 1, 4)"))) == MAGIC_HEX
    )
    return b.select(
        "media_id",
        valid.alias("is_valid"),
        F.when(valid, _be_uint(F.col("blob"), 5, 2)).alias("width"),
        F.when(valid, _be_uint(F.col("blob"), 7, 2)).alias("height"),
        F.when(valid, _be_uint(F.col("blob"), 9, 1)).alias("channels"),
        F.when(valid, F.length("blob") - HEADER_LEN).cast("long").alias(
            "payload_bytes"
        ),
    )


# ---------------------------------------------------------------------------
# Byte-level feature extraction — Arrow-batched Pandas UDF (real)
# ---------------------------------------------------------------------------

BYTE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("byte_max", IntegerType()),
        StructField("n_zero", LongType()),
    ]
)


def _byte_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"media_id": [], "n_bytes": [], "byte_sum": [], "byte_max": [], "n_zero": []}
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            payload = bytes(blob)[HEADER_LEN:]
            out["media_id"].append(int(mid))
            out["n_bytes"].append(len(payload))
            out["byte_sum"].append(sum(payload))
            out["byte_max"].append(max(payload) if payload else 0)
            out["n_zero"].append(sum(1 for x in payload if x == 0))
        yield pd.DataFrame(out)


def byte_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Payload byte statistics via ``mapInPandas`` (the feature-extract
    plumbing an image featurizer would use — batch shape, schema, and
    partitioning are production-real; only the pixel semantics are fake)."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_byte_feature_batches, schema=BYTE_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Video-style frame sampling — byte slicing + hashing (real)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_hex", StringType()),
        StructField("frame_md5", StringType()),
    ]
)


def _frame_sample_batches(frame_size: int, stride: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_no": [],
                "frame_len": [],
                "frame_hex": [],
                "frame_md5": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                payload = bytes(blob)[HEADER_LEN:]
                n_frames = len(payload) // frame_size
                for f_no in range(0, n_frames, stride):
                    frame = payload[f_no * frame_size : (f_no + 1) * frame_size]
                    out["media_id"].append(int(mid))
                    out["frame_no"].append(f_no)
                    out["frame_len"].append(len(frame))
                    out["frame_hex"].append(frame.hex())
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return fn


def frame_sample(
    df: DataFrame, id_col: str, blob_col: str, *, frame_size: int = 16, stride: int = 2
) -> DataFrame:
    """Sample every ``stride``-th fixed-size frame from the payload.

    One input row fans out to n_frames/stride output rows — the UDF returns
    a *longer* batch than it receives, which is exactly the shape a real
    video frame-sampler has. Trailing partial frames are dropped.
    """
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(
        _frame_sample_batches(frame_size, stride), schema=FRAME_SCHEMA
    )


# ---------------------------------------------------------------------------
# Pixel decode / resize — STUBBED (no image libs in this environment)
# ---------------------------------------------------------------------------

DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("gray_mean_milli", LongType()),
        StructField("pixels_sampled", ArrayType(IntegerType())),
    ]
)


def _decode_batches(fake: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "gray_mean_milli": [],
                "pixels_sampled": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                raw = bytes(blob)
                if not fake:
                    # Real implementation: PIL.Image.open(io.BytesIO(raw))
                    # then .convert("L") / .resize(...).  Image libraries are
                    # not available in this container (SURVEY §7 hard-parts).
                    raise NotImplementedError(
                        "real image decode requires PIL/opencv, which this "
                        "environment does not ship; use fake=True for the "
                        "deterministic stand-in"
                    )
                w = int.from_bytes(raw[4:6], "big")
                h = int.from_bytes(raw[6:8], "big")
                payload = raw[HEADER_LEN:]
                mean_milli = (
                    sum(payload) * 1000 // len(payload) if payload else 0
                )
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["gray_mean_milli"].append(mean_milli)
                out["pixels_sampled"].append(list(payload[:8]))
            yield pd.DataFrame(out)

    return fn


def decode_image(
    df: DataFrame, id_col: str, blob_col: str, *, fake: bool = False
) -> DataFrame:
    """Decode pixels from the blob. STUB: the pixel decode itself needs an
    image library this container lacks; with ``fake=True`` a deterministic
    stand-in (payload-byte gray stats) exercises the identical Spark
    plumbing — schema, Arrow batches, partitioning, error shape."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_decode_batches(fake), schema=DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL pixel decode: BMP (uncompressed 24-bit) — no image library needed.
# The compressed-format decode (JPEG/PNG) remains stubbed above; BMP's
# layout (little-endian headers, 4-byte row stride, bottom-up row order,
# BGR channel order) is fully specified, so this is a genuine decoder,
# not a stand-in.
# ---------------------------------------------------------------------------

def _u32le_hex(v: Column) -> Column:
    """Hex of a uint32 in little-endian byte order (JVM expressions)."""
    b = [F.format_string("%02x", (v.bitwiseAND(F.lit(255 << (8 * i))) / F.lit(1 << (8 * i))).cast("int")) for i in range(4)]
    return F.concat(*b)


def _u16le_hex(v: Column) -> Column:
    return F.concat(
        F.format_string("%02x", (v % 256).cast("int")),
        F.format_string("%02x", (v / 256).cast("int")),
    )


def synth_bmp(id_col: Column) -> Column:
    """A REAL, spec-conformant 24-bit BMP built from an integer id with
    pure JVM expressions: width = 4 + id%5, height = 4 + id%4, stored
    row j's pixel bytes = md5(id:j:a)||md5(id:j:b) truncated to 3*w
    bytes, zero-padded to the 4-byte stride.  (BMP stores rows
    bottom-up, so stored row j is IMAGE row h-1-j — the decoder must
    flip; the DuckDB oracle accounts for it analytically.)"""
    sid = id_col.cast("string")
    w = (id_col % 5 + 4).cast("int")
    h = (id_col % 4 + 4).cast("int")
    row_bytes = w * 3
    pad = (F.lit(4) - row_bytes % 4) % 4
    stride = row_bytes + pad
    image_size = (stride * h).cast("int")
    file_size = (image_size + 54).cast("int")
    file_header = F.concat(
        F.lit("424d"),                      # 'BM'
        _u32le_hex(file_size),
        F.lit("00000000"),
        F.lit("36000000"),                  # pixel offset 54
    )
    info_header = F.concat(
        F.lit("28000000"),                  # header size 40
        _u32le_hex(w.cast("int")),
        _u32le_hex(h.cast("int")),          # positive -> bottom-up
        F.lit("0100"),                      # planes
        F.lit("1800"),                      # 24 bpp
        F.lit("00000000"),                  # BI_RGB
        _u32le_hex(image_size),
        F.lit("00000000" * 4),
    )
    row_hex = lambda j: F.concat(
        F.substring(
            F.concat(
                F.md5(F.concat(sid, F.lit(":"), j.cast("string"), F.lit(":a"))),
                F.md5(F.concat(sid, F.lit(":"), j.cast("string"), F.lit(":b"))),
            ),
            1,
            row_bytes * 2,
        ),
        F.substring(F.lit("000000"), 1, pad * 2),
    )
    pixels = F.array_join(
        F.transform(F.sequence(F.lit(0), h - 1), row_hex), ""
    )
    return F.unhex(F.concat(file_header, info_header, pixels))


BMP_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_b_milli", LongType()),
        StructField("mean_g_milli", LongType()),
        StructField("mean_r_milli", LongType()),
        StructField("tl_b", IntegerType()),
        StructField("tl_g", IntegerType()),
        StructField("tl_r", IntegerType()),
        StructField("is_valid", IntegerType()),
    ]
)


def parse_bmp(raw: bytes):
    """Parse an uncompressed 24-bit BMP; returns (w, h, rows) with
    rows[y] = image row y's BGR bytes (top-to-bottom), or None if the
    blob is not a decodable 24-bit BI_RGB BMP.  Handles both bottom-up
    (positive height) and top-down (negative height) layouts and the
    4-byte row stride."""
    if len(raw) < 54 or raw[:2] != b"BM":
        return None
    off = int.from_bytes(raw[10:14], "little")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    compression = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down, height = h < 0, abs(h)
    stride = (3 * w + 3) // 4 * 4
    px = raw[off : off + stride * height]
    if len(px) < stride * height:
        return None
    rows = [px[j * stride : j * stride + 3 * w] for j in range(height)]
    if not top_down:
        rows = rows[::-1]
    return w, height, rows


def _bmp_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in BMP_DECODE_SCHEMA.fields}
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            parsed = parse_bmp(bytes(blob))
            out["media_id"].append(int(mid))
            if parsed is None:
                for k in ("width", "height", "mean_b_milli", "mean_g_milli",
                          "mean_r_milli", "tl_b", "tl_g", "tl_r"):
                    out[k].append(None)
                out["is_valid"].append(0)
                continue
            w, h, rows = parsed
            sums = [0, 0, 0]
            for row in rows:
                for i, v in enumerate(row):
                    sums[i % 3] += v
            n = w * h
            out["width"].append(w)
            out["height"].append(h)
            out["mean_b_milli"].append(sums[0] * 1000 // n)
            out["mean_g_milli"].append(sums[1] * 1000 // n)
            out["mean_r_milli"].append(sums[2] * 1000 // n)
            out["tl_b"].append(rows[0][0])
            out["tl_g"].append(rows[0][1])
            out["tl_r"].append(rows[0][2])
            out["is_valid"].append(1)
        yield pd.DataFrame(out)


def decode_bmp(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL pixel decode for 24-bit BMP blobs (Arrow-batched mapInPandas):
    per-channel means (BGR) and the top-left pixel — the top-left value
    proves the decoder honors BMP's bottom-up row storage."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_bmp_decode_batches, schema=BMP_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio decode: WAV (RIFF, 16-bit PCM) — uncompressed, fully
# specified, no audio library needed.  Chunk-walking parser (handles
# extra chunks before "data"), little-endian signed samples.
# ---------------------------------------------------------------------------

def synth_wav(id_col: Column) -> Column:
    """A real 16-bit PCM mono WAV from an integer id, pure JVM
    expressions: n_samples = 16 + id%17, sample bytes from
    md5(id:w:0), md5(id:w:1), ... (8 samples per md5)."""
    sid = id_col.cast("string")
    n = (id_col % 17 + 16).cast("int")
    data_bytes = n * 2
    n_md5 = (n + 7) / 8  # int division on longs
    sample_hex = F.substring(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (n_md5 - 1).cast("int")),
                lambda w: F.md5(F.concat(sid, F.lit(":w"), w.cast("string"))),
            ),
            "",
        ),
        1,
        data_bytes * 2,
    )
    riff_size = (36 + data_bytes).cast("int")
    header = F.concat(
        F.lit("52494646"),            # 'RIFF'
        _u32le_hex(riff_size),
        F.lit("57415645"),            # 'WAVE'
        F.lit("666d7420"),            # 'fmt '
        F.lit("10000000"),            # fmt chunk size 16
        F.lit("0100"),                # PCM
        F.lit("0100"),                # mono
        _u32le_hex(F.lit(8000).cast("int")),
        _u32le_hex(F.lit(16000).cast("int")),   # byte rate
        F.lit("0200"),                # block align
        F.lit("1000"),                # 16 bits
        F.lit("64617461"),            # 'data'
        _u32le_hex(data_bytes.cast("int")),
    )
    return F.unhex(F.concat(header, sample_hex))


WAV_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("mean_abs_milli", LongType()),
        StructField("max_abs", IntegerType()),
        StructField("first_sample", IntegerType()),
        StructField("is_valid", IntegerType()),
    ]
)


def parse_wav(raw: bytes):
    """Parse a RIFF/WAVE 16-bit PCM blob by walking chunks; returns
    (sample_rate, samples list) or None."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos, rate, bits, data = 12, None, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                return None
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or bits != 16 or data is None:
        return None
    samples = [
        int.from_bytes(data[i : i + 2], "little", signed=True)
        for i in range(0, len(data) - 1, 2)
    ]
    return rate, samples


def _wav_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {f.name: [] for f in WAV_DECODE_SCHEMA.fields}
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            parsed = parse_wav(bytes(blob))
            out["media_id"].append(int(mid))
            if not parsed or not parsed[1]:
                for k in ("sample_rate", "n_samples", "mean_abs_milli",
                          "max_abs", "first_sample"):
                    out[k].append(None)
                out["is_valid"].append(0)
                continue
            rate, samples = parsed
            abs_s = [abs(s) for s in samples]
            out["sample_rate"].append(rate)
            out["n_samples"].append(len(samples))
            out["mean_abs_milli"].append(sum(abs_s) * 1000 // len(samples))
            out["max_abs"].append(max(abs_s))
            out["first_sample"].append(samples[0])
            out["is_valid"].append(1)
        yield pd.DataFrame(out)


def decode_wav(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL audio decode for 16-bit PCM WAV blobs (Arrow-batched
    mapInPandas): amplitude stats over little-endian signed samples."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_wav_decode_batches, schema=WAV_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL pixel decode: PNG (8-bit RGB / RGBA) — stdlib zlib inflates IDAT,
# so unlike JPEG this compressed format needs NO image library.  The
# decoder is a genuine from-scratch PNG reader: signature check, chunk
# walk with CRC32 verification (skipping ancillary chunks), multi-IDAT
# reassembly into one zlib stream, and per-scanline unfilter for all
# five filter types (None/Sub/Up/Average/Paeth).  The matching
# synthesizer emits spec-conformant PNGs whose scanlines cycle through
# all five filters, so a wrong unfilter inverse cannot cancel out.
# Reference analogue: the pixel side of pdfextraction.py:72-73
# (convert_from_bytes -> PIL images), minus the poppler render.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def md5_row_bytes(media_id: int, tag: str, j: int, n: int) -> bytes:
    """Row j's raw bytes for a synthetic image: md5(id:{tag}{j}:a) ||
    md5(id:{tag}{j}:b) truncated to n bytes — ONE implementation of the
    formula every codec synthesizer and its DuckDB oracle share (tags:
    'p' PNG, 'i' ICO, 't' TIFF)."""
    a = hashlib.md5(f"{media_id}:{tag}{j}:a".encode()).digest()
    b = hashlib.md5(f"{media_id}:{tag}{j}:b".encode()).digest()
    return (a + b)[:n]


def _png_row_bytes(media_id: int, j: int, n: int) -> bytes:
    return md5_row_bytes(media_id, "p", j, n)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_row(row: bytes, prev: bytes, ft: int, bpp: int) -> bytes:
    """Apply one PNG scanline filter; returns filter byte + filtered
    bytes (the exact inverse of _png_unfilter's per-row step)."""
    out = bytearray([ft])
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            f = x
        elif ft == 1:
            f = (x - a) & 0xFF
        elif ft == 2:
            f = (x - b) & 0xFF
        elif ft == 3:
            f = (x - (a + b) // 2) & 0xFF
        else:
            f = (x - _paeth(a, b, c)) & 0xFF
        out.append(f)
    return bytes(out)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def synth_png_bytes(media_id: int) -> bytes:
    """A spec-conformant 8-bit PNG from an integer id: w = id%5+4,
    h = id%4+4, RGB for even ids / RGBA for odd (colour types 2/6).
    Scanline j uses filter type j%5 — every filter appears in every
    image with h >= 5.  The single zlib stream is split across two IDAT
    chunks and an ancillary tEXt chunk sits before them, so the decoder
    must reassemble IDATs and skip non-critical chunks.  Pixel bytes
    come from the md5 formula in _png_row_bytes (analytically mirrored
    by the driver oracle)."""
    w = media_id % 5 + 4
    h = media_id % 4 + 4
    ch = 3 + media_id % 2
    raw_rows = [_png_row_bytes(media_id, j, w * ch) for j in range(h)]
    filtered = bytearray()
    prev = bytes(w * ch)
    for j, row in enumerate(raw_rows):
        filtered += _png_filter_row(row, prev, j % 5, ch)
        prev = row
    comp = zlib.compress(bytes(filtered), 9)
    half = len(comp) // 2
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2 if ch == 3 else 6, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Comment\x00synthetic")
        + _png_chunk(b"IDAT", comp[:half])
        + _png_chunk(b"IDAT", comp[half:])
        + _png_chunk(b"IEND", b"")
    )


def synth_png_interlaced_bytes(media_id: int) -> bytes:
    """The same md5-formula pixels as synth_png_bytes, packed as an
    Adam7-interlaced PNG (interlace method 1): each non-empty pass is
    filtered as an independent sub-image with the filter type cycling
    over (pass + row) % 5, and the 4..8-pixel dims guarantee EMPTY
    passes occur (e.g. w=4 leaves pass 2 with zero columns), which the
    spec says contribute no bytes at all.  Decoded pixels are identical
    to the sequential blob's, so the driver oracle applies verbatim."""
    w = media_id % 5 + 4
    h = media_id % 4 + 4
    ch = 3 + media_id % 2
    full = [_png_row_bytes(media_id, j, w * ch) for j in range(h)]
    filtered = bytearray()
    for pidx, (x0, y0, dx, dy) in enumerate(_ADAM7):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = bytes(pw * ch)
        for pj in range(ph):
            y = y0 + pj * dy
            row = b"".join(
                full[y][(x0 + pi * dx) * ch : (x0 + pi * dx + 1) * ch]
                for pi in range(pw)
            )
            filtered += _png_filter_row(row, prev, (pidx + pj) % 5, ch)
            prev = row
    comp = zlib.compress(bytes(filtered), 9)
    half = len(comp) // 2
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2 if ch == 3 else 6, 0, 0, 1])  # interlace = Adam7
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Comment\x00synthetic-adam7")
        + _png_chunk(b"IDAT", comp[:half])
        + _png_chunk(b"IDAT", comp[half:])
        + _png_chunk(b"IEND", b"")
    )


def _png_interlaced_synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": [int(m) for m in pdf["media_id"]],
                "blob": [synth_png_interlaced_bytes(int(m)) for m in pdf["media_id"]],
            }
        )


def synth_png_interlaced(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, blob) with a real Adam7-interlaced PNG per id."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return rebalance_if_undersplit(src).mapInPandas(
        _png_interlaced_synth_batches, schema="media_id long, blob binary"
    )


# Adam7 pass geometry: (x0, y0, dx, dy) per pass (PNG spec 8.2)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _png_unfilter(data: bytes, off: int, h: int, stride: int, bpp: int):
    """Invert the five scanline filters over ``h`` rows of
    filter-byte-prefixed data starting at ``off``; returns the list of
    raw rows, or None on a bad filter type.  The previous-row state
    resets here — interlaced images filter each Adam7 pass as an
    independent sub-image."""
    rows: list[bytes] = []
    prev = bytes(stride)
    for j in range(h):
        base = off + j * (stride + 1)
        ft = data[base]
        if ft > 4:
            return None
        line = bytearray(data[base + 1 : base + 1 + stride])
        if ft == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        prev = bytes(line)
        rows.append(prev)
    return rows


def parse_png(raw: bytes):
    """Parse an 8-bit colour-type-2/6 PNG; returns (w, h, channels, rows)
    with rows[j] = scanline j's raw (unfiltered) bytes, or None if the
    blob is not a decodable PNG of that shape.  Verifies every chunk's
    CRC32, concatenates all IDAT chunks into one zlib stream, and
    inverts all five scanline filters.  Interlace method 1 (Adam7) is
    supported: each of the seven passes unfilters as an independent
    sub-image and scatters onto the output grid."""
    if len(raw) < 8 or raw[:8] != _PNG_SIG:
        return None
    pos, n = 8, len(raw)
    w = h = ch = None
    interlace = 0
    idat = bytearray()
    while pos + 12 <= n:
        length = int.from_bytes(raw[pos : pos + 4], "big")
        ctype = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        if len(body) < length:
            return None
        crc = int.from_bytes(raw[pos + 8 + length : pos + 12 + length], "big")
        if (zlib.crc32(ctype + body) & 0xFFFFFFFF) != crc:
            return None
        if ctype == b"IHDR":
            if length != 13:
                return None
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, colour, comp_m, filt_m, interlace = body[8:13]
            if depth != 8 or colour not in (2, 6) or comp_m or filt_m or interlace > 1:
                return None
            ch = 3 if colour == 2 else 4
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        # any other chunk (ancillary or unknown): skip
        pos += 12 + length
    if not w or not h or not ch or not idat:
        return None
    try:
        data = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    bpp = ch
    if not interlace:
        if len(data) != h * (stride + 1):
            return None
        rows = _png_unfilter(data, 0, h, stride, bpp)
        if rows is None:
            return None
        return w, h, ch, rows
    # Adam7: unfilter each pass, scatter into the full-size grid
    grid = [bytearray(stride) for _ in range(h)]
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass contributes no bytes at all
        pstride = pw * ch
        need = ph * (pstride + 1)
        if off + need > len(data):
            return None
        prows = _png_unfilter(data, off, ph, pstride, bpp)
        if prows is None:
            return None
        off += need
        for pj, prow in enumerate(prows):
            y = y0 + pj * dy
            for pi in range(pw):
                x = x0 + pi * dx
                grid[y][x * ch : (x + 1) * ch] = prow[pi * ch : (pi + 1) * ch]
    if off != len(data):
        return None
    return w, h, ch, [bytes(r) for r in grid]


PNG_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_r_milli", LongType()),
        StructField("mean_g_milli", LongType()),
        StructField("mean_b_milli", LongType()),
        StructField("mean_a_milli", LongType()),
        StructField("tl_r", IntegerType()),
        StructField("tl_g", IntegerType()),
        StructField("tl_b", IntegerType()),
        StructField("tl_a", IntegerType()),
        StructField("is_valid", IntegerType()),
    ]
)


def _png_synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": [int(m) for m in pdf["media_id"]],
                "blob": [synth_png_bytes(int(m)) for m in pdf["media_id"]],
            }
        )


def synth_png(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, blob) with a real PNG per id.  Unlike synth_bmp this
    cannot be pure JVM expressions (zlib compression), so it runs in the
    same Arrow-batched mapInPandas shape as the decoders."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return rebalance_if_undersplit(src).mapInPandas(
        _png_synth_batches, schema="media_id long, blob binary"
    )


def _png_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {f.name: [] for f in PNG_DECODE_SCHEMA.fields}
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            parsed = parse_png(bytes(blob))
            out["media_id"].append(int(mid))
            if parsed is None:
                for k in out:
                    if k not in ("media_id", "is_valid"):
                        out[k].append(None)
                out["is_valid"].append(0)
                continue
            w, h, ch, rows = parsed
            sums = [0, 0, 0, 0]
            for row in rows:
                for i, v in enumerate(row):
                    sums[i % ch] += v
            n = w * h
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(ch)
            out["mean_r_milli"].append(sums[0] * 1000 // n)
            out["mean_g_milli"].append(sums[1] * 1000 // n)
            out["mean_b_milli"].append(sums[2] * 1000 // n)
            out["mean_a_milli"].append(sums[3] * 1000 // n if ch == 4 else None)
            out["tl_r"].append(rows[0][0])
            out["tl_g"].append(rows[0][1])
            out["tl_b"].append(rows[0][2])
            out["tl_a"].append(rows[0][3] if ch == 4 else None)
            out["is_valid"].append(1)
        yield pd.DataFrame(out)


def decode_png(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL pixel decode for 8-bit RGB/RGBA PNG blobs (Arrow-batched
    mapInPandas): chunk walk + CRC check + zlib inflate + unfilter, then
    per-channel means and the top-left pixel (PNG rows are top-down —
    the opposite of BMP, which the tl_* columns pin)."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_png_decode_batches, schema=PNG_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL pixel decode: GIF (87a/89a) — a from-scratch LZW codec, so this
# compressed format also needs no image library.  The decoder walks the
# logical screen descriptor, global/local colour tables, extension
# blocks (skipped by sub-block length, as the spec requires), and the
# image's LZW-packed index stream (little-endian bit order, clear/EOI
# codes, code-width growth to 12 bits), then maps indices through the
# palette.  The synthesizer emits spec-conformant GIF89a bytes with an
# 8-colour palette (3-bit min code size, so ~70-pixel images exercise
# several code-width bumps), a comment extension the parser must skip,
# and 16-byte data sub-blocks so multi-block reassembly is always hit.
# Reference analogue: the PIL image side of pdfextraction.py:72-73.
# ---------------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavour LZW: emits CLEAR first, grows the code width when the
    next free slot reaches 2^width (insert-then-check), emits CLEAR and
    resets when the table hits 4096 — the classic compress/GIFCOMPR
    behaviour real writers produce."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    table: dict[bytes, int] = {}
    free = 0
    width = 0

    def emit(code: int) -> None:
        # write at the current width, THEN bump once the free counter
        # fills the code space — the compress/GIFCOMPR structure
        # (check-after-every-output, including the flush and EOI), which
        # is what keeps the decoder's lagged insertions synchronized;
        # verified byte-exact against the canonical 10x10 sample stream
        # in tests/test_multimodal.py
        nonlocal acc, nbits, width
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if free >= (1 << width) and width < 12:
            width += 1

    def reset() -> None:
        nonlocal table, free, width
        table = {bytes([i]): i for i in range(clear)}
        free = eoi + 1
        width = min_code_size + 1

    reset()
    emit(clear)
    cur = b""
    for c in indices:
        nxt = cur + bytes([c])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if free < 4096:
            table[nxt] = free
            free += 1
        else:
            emit(clear)
            reset()
        cur = bytes([c])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes | None:
    """Inverse of :func:`_lzw_encode`, synchronized with real encoders:
    after inserting an entry the width bumps once the table FILLS the
    current code space (len == 2^width) — the decoder's insertion lags
    the encoder's by one code, which exactly offsets the encoder's
    bump-at-2^w+1, so both read/write code n with the same width
    (verified against the canonical 10x10 GIF sample stream and the
    1x1 tracking-pixel bytes in tests).  Handles the c-S-c special case
    (code == next free slot) and deferred clears (table capped at 4096,
    width capped at 12); returns None on a malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos_bits = 0
    total_bits = len(data) * 8
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while pos_bits + width <= total_bits:
        byte0 = pos_bits // 8
        code = (
            int.from_bytes(data[byte0 : byte0 + 3], "little") >> (pos_bits % 8)
        ) & ((1 << width) - 1)
        pos_bits += width
        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if len(out) > max_pixels:
            return None
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return None  # no EOI before the data ran out


def _gif_palette(media_id: int) -> list[tuple[int, int, int]]:
    """The synthetic 8-colour palette — analytic, so the DuckDB oracle
    recomputes it without parsing GIF."""
    return [
        ((i * 37 + media_id) % 256, (i * 59 + 3 * media_id) % 256,
         (i * 83 + 7 * media_id) % 256)
        for i in range(8)
    ]


def _gif_indices(media_id: int, n: int) -> bytes:
    """Pixel index stream: md5(id:g{t}) digests concatenated, each byte
    % 8 — the same formula the oracle states in SQL."""
    need = (n + 15) // 16
    raw = b"".join(
        hashlib.md5(f"{media_id}:g{t}".encode()).digest() for t in range(need)
    )
    return bytes(b % 8 for b in raw[:n])


def synth_gif_bytes(media_id: int) -> bytes:
    """A spec-conformant GIF89a from an integer id: w = id%6+4,
    h = id%5+4, one image, 8-colour global table (min LZW code size 3,
    so the ~16-70 pixel streams bump the code width at least once), a
    comment extension before the image, and 16-byte data sub-blocks."""
    w = media_id % 6 + 4
    h = media_id % 5 + 4
    pal = _gif_palette(media_id)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF2, 0, 0])  # global table, 8 entries, 3 bits/colour
    for r, g, b in pal:
        out += bytes([r, g, b])
    out += b"\x21\xfe\x09synthetic\x00"  # comment extension, then terminator
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += b"\x00"  # no local table, no interlace
    out += bytes([3])  # LZW minimum code size
    lzw = _lzw_encode(_gif_indices(media_id, w * h), 3)
    for i in range(0, len(lzw), 16):
        chunk = lzw[i : i + 16]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _gif_frame_indices(media_id: int, f: int, n: int) -> bytes:
    """Frame f's pixel indices: md5(id:f{f}:{t}) digests, byte % 8 —
    analytically mirrored by the animated entry's oracle."""
    need = (n + 15) // 16
    raw = b"".join(
        hashlib.md5(f"{media_id}:f{f}:{t}".encode()).digest() for t in range(need)
    )
    return bytes(b % 8 for b in raw[:n])


def synth_gif_animated_bytes(media_id: int) -> bytes:
    """A spec-conformant ANIMATED GIF89a: n = id%3+2 full-screen frames,
    each preceded by a Graphic Control Extension carrying delay
    (id+f)%100 cs and disposal 'leave in place', plus the NETSCAPE2.0
    looping application extension real animated GIFs carry (an
    application extension the parser must skip by sub-block walking).
    Frame pixels come from the md5 formula in _gif_frame_indices and
    the same affine palette as the single-frame entry."""
    w = media_id % 6 + 4
    h = media_id % 5 + 4
    nframes = media_id % 3 + 2
    pal = _gif_palette(media_id)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF2, 0, 0])
    for r, g, b in pal:
        out += bytes([r, g, b])
    # NETSCAPE looping extension: app extension, 11-byte id, 3-byte data
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(nframes):
        delay = (media_id + f) % 100
        out += b"\x21\xf9\x04" + bytes([0x04]) + delay.to_bytes(2, "little")
        out += b"\x00\x00"  # no transparency; then block terminator
        out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += b"\x00" + bytes([3])
        lzw = _lzw_encode(_gif_frame_indices(media_id, f, w * h), 3)
        for i in range(0, len(lzw), 16):
            chunk = lzw[i : i + 16]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _gif_read_image(raw: bytes, pos: int, palette, sw: int, sh: int):
    """Read one image block (descriptor byte 0x2C already consumed):
    returns (left, top, w, h, indices, palette, new_pos) or None."""
    if pos + 9 > len(raw):
        return None
    left = int.from_bytes(raw[pos : pos + 2], "little")
    top = int.from_bytes(raw[pos + 2 : pos + 4], "little")
    w = int.from_bytes(raw[pos + 4 : pos + 6], "little")
    h = int.from_bytes(raw[pos + 6 : pos + 8], "little")
    iflags = raw[pos + 8]
    pos += 9
    if iflags & 0x40:  # interlaced: outside the supported subset
        return None
    pal = palette
    if iflags & 0x80:
        n = 2 << (iflags & 0x07)
        chunk = raw[pos : pos + 3 * n]
        if len(chunk) < 3 * n:
            return None
        pal = [tuple(chunk[i * 3 : i * 3 + 3]) for i in range(n)]
        pos += 3 * n
    if (
        pal is None
        or pos >= len(raw)
        or not (1 <= w and 1 <= h and left + w <= sw and top + h <= sh)
    ):
        return None
    mcs = raw[pos]
    pos += 1
    if not 2 <= mcs <= 8:
        return None
    lzw = bytearray()
    while pos < len(raw) and raw[pos]:
        ln = raw[pos]
        block = raw[pos + 1 : pos + 1 + ln]
        if len(block) < ln:
            return None
        lzw += block
        pos += 1 + ln
    pos += 1  # block terminator
    indices = _lzw_decode(bytes(lzw), mcs, w * h)
    if indices is None or len(indices) != w * h:
        return None
    if any(i >= len(pal) for i in indices):
        return None
    return left, top, w, h, indices, pal, pos


def parse_gif_frames(raw: bytes):
    """Parse ALL frames of an animated (or single-image) GIF87a/89a:
    returns (sw, sh, frames) with frames = list of composited
    (delay_cs, canvas) where canvas is the sw*sh row-major list of
    (r, g, b) tuples AFTER applying that frame onto the accumulated
    canvas.  Graphic Control Extensions supply per-frame delay,
    transparency index (transparent pixels leave the canvas untouched)
    and disposal: 0/1 leave, 2 restores the background colour over the
    frame rect, 3 (restore-previous) restores the pre-frame canvas.
    Returns None on any malformed block — containment over partial
    output."""
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(raw[6:8], "little")
    sh = int.from_bytes(raw[8:10], "little")
    flags = raw[10]
    bg_index = raw[11]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        chunk = raw[pos : pos + 3 * n]
        if len(chunk) < 3 * n:
            return None
        palette = [tuple(chunk[i * 3 : i * 3 + 3]) for i in range(n)]
        pos += 3 * n
    bg_rgb = palette[bg_index] if palette and bg_index < len(palette) else (0, 0, 0)
    canvas = [bg_rgb] * (sw * sh)
    frames = []
    delay_cs = 0
    transparent = None
    disposal = 0
    while pos < len(raw):
        marker = raw[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            return (sw, sh, frames) if frames else None
        if marker == 0x21:  # extension
            if pos >= len(raw):
                return None
            label = raw[pos]
            pos += 1
            # GCE payload is 5 bytes (size, flags, delay lo/hi, transparent
            # index); bounds-check before reading — a truncated blob must
            # return None (containment), never raise
            if label == 0xF9 and pos + 5 <= len(raw) and raw[pos] == 4:
                gflags = raw[pos + 1]
                delay_cs = int.from_bytes(raw[pos + 2 : pos + 4], "little")
                transparent = raw[pos + 4] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
            while pos < len(raw) and raw[pos]:
                pos += 1 + raw[pos]
            if pos >= len(raw):
                return None  # truncated inside the sub-block chain
            pos += 1
            continue
        if marker != 0x2C:
            return None
        img = _gif_read_image(raw, pos, palette, sw, sh)
        if img is None:
            return None
        left, top, w, h, indices, pal, pos = img
        # the pre-frame snapshot is only needed for disposal 3
        before = list(canvas) if disposal == 3 else None
        for j in range(h):
            base = (top + j) * sw + left
            for i in range(w):
                idx = indices[j * w + i]
                if transparent is not None and idx == transparent:
                    continue
                canvas[base + i] = pal[idx]
        frames.append((delay_cs, list(canvas)))
        if disposal == 2:  # restore background over the frame rect
            for j in range(h):
                base = (top + j) * sw + left
                for i in range(w):
                    canvas[base + i] = bg_rgb
        elif disposal == 3:  # restore previous canvas
            canvas = before
        delay_cs = 0
        transparent = None
        disposal = 0
    return None  # missing trailer


def parse_gif(raw: bytes):
    """Parse the first image of a GIF87a/89a; returns (w, h, pixels)
    with pixels = row-major (r, g, b) tuples after palette mapping, or
    None if the blob is not a decodable non-interlaced GIF.  Walks
    extension blocks by sub-block length, honours a local colour table
    when the image descriptor flags one, and LZW-decodes the index
    stream."""
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(raw[6:8], "little")
    sh = int.from_bytes(raw[8:10], "little")
    flags = raw[10]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        chunk = raw[pos : pos + 3 * n]
        if len(chunk) < 3 * n:
            return None
        palette = [tuple(chunk[i * 3 : i * 3 + 3]) for i in range(n)]
        pos += 3 * n
    while pos < len(raw):
        marker = raw[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            return None
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(raw) and raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if marker != 0x2C:  # not an image descriptor
            return None
        img = _gif_read_image(raw, pos, palette, sw, sh)
        if img is None:
            return None
        left, top, w, h, indices, pal, pos = img
        return w, h, [pal[i] for i in indices]
    return None


GIF_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r_milli", LongType()),
        StructField("mean_g_milli", LongType()),
        StructField("mean_b_milli", LongType()),
        StructField("tl_r", IntegerType()),
        StructField("tl_g", IntegerType()),
        StructField("tl_b", IntegerType()),
        StructField("is_valid", IntegerType()),
    ]
)


def _gif_synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": [int(m) for m in pdf["media_id"]],
                "blob": [synth_gif_bytes(int(m)) for m in pdf["media_id"]],
            }
        )


def synth_gif(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, blob) with a real GIF89a per id, Arrow-batched."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return rebalance_if_undersplit(src).mapInPandas(
        _gif_synth_batches, schema="media_id long, blob binary"
    )


def _gif_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {f.name: [] for f in GIF_DECODE_SCHEMA.fields}
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            parsed = parse_gif(bytes(blob))
            out["media_id"].append(int(mid))
            if parsed is None:
                for k in out:
                    if k not in ("media_id", "is_valid"):
                        out[k].append(None)
                out["is_valid"].append(0)
                continue
            w, h, px = parsed
            n = w * h
            sums = [0, 0, 0]
            for p in px:
                sums[0] += p[0]
                sums[1] += p[1]
                sums[2] += p[2]
            out["width"].append(w)
            out["height"].append(h)
            out["mean_r_milli"].append(sums[0] * 1000 // n)
            out["mean_g_milli"].append(sums[1] * 1000 // n)
            out["mean_b_milli"].append(sums[2] * 1000 // n)
            out["tl_r"].append(px[0][0])
            out["tl_g"].append(px[0][1])
            out["tl_b"].append(px[0][2])
            out["is_valid"].append(1)
        yield pd.DataFrame(out)


def decode_gif(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL pixel decode for GIF blobs (Arrow-batched mapInPandas):
    from-scratch LZW + palette mapping, then per-channel means and the
    top-left pixel."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_gif_decode_batches, schema=GIF_DECODE_SCHEMA)


GIF_ANIM_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_r_milli", LongType()),
        StructField("mean_g_milli", LongType()),
        StructField("mean_b_milli", LongType()),
        StructField("last_r", IntegerType()),
        StructField("last_g", IntegerType()),
        StructField("last_b", IntegerType()),
        StructField("total_delay_cs", LongType()),
        StructField("is_valid", IntegerType()),
    ]
)


def _gif_anim_synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": [int(m) for m in pdf["media_id"]],
                "blob": [synth_gif_animated_bytes(int(m)) for m in pdf["media_id"]],
            }
        )


def synth_gif_animated(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, blob) with a real animated GIF89a per id."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return rebalance_if_undersplit(src).mapInPandas(
        _gif_anim_synth_batches, schema="media_id long, blob binary"
    )


def _gif_anim_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {f.name: [] for f in GIF_ANIM_SCHEMA.fields}
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            parsed = parse_gif_frames(bytes(blob))
            out["media_id"].append(int(mid))
            if parsed is None:
                for k in out:
                    if k not in ("media_id", "is_valid"):
                        out[k].append(None)
                out["is_valid"].append(0)
                continue
            sw, sh, frames = parsed
            sums = [0, 0, 0]
            delay_total = 0
            for delay_cs, canvas in frames:
                delay_total += delay_cs
                for r, g, b in canvas:
                    sums[0] += r
                    sums[1] += g
                    sums[2] += b
            npx = sw * sh * len(frames)
            last = frames[-1][1][0]
            out["width"].append(sw)
            out["height"].append(sh)
            out["n_frames"].append(len(frames))
            out["mean_r_milli"].append(sums[0] * 1000 // npx)
            out["mean_g_milli"].append(sums[1] * 1000 // npx)
            out["mean_b_milli"].append(sums[2] * 1000 // npx)
            out["last_r"].append(last[0])
            out["last_g"].append(last[1])
            out["last_b"].append(last[2])
            out["total_delay_cs"].append(delay_total)
            out["is_valid"].append(1)
        yield pd.DataFrame(out)


def decode_gif_animated(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Multi-frame GIF decode (Arrow-batched mapInPandas): every frame
    LZW-decoded and composited (GCE delay/transparency/disposal), then
    whole-animation stats — frame count, per-channel means across all
    composited frames, the final frame's top-left pixel, and the total
    animation delay."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(blob_col).alias("blob")
    )
    return rebalance_if_undersplit(src).mapInPandas(_gif_anim_decode_batches, schema=GIF_ANIM_SCHEMA)
