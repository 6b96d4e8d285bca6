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
    return src.mapInPandas(_byte_feature_batches, schema=BYTE_FEATURES_SCHEMA)


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
    return src.mapInPandas(
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
    return src.mapInPandas(_decode_batches(fake), schema=DECODE_SCHEMA)
