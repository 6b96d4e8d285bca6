"""Splittable ZIP-archive source: read documents out of .zip corpora
with per-member parallelism.

Document corpora regularly ship as ZIP archives (doc dumps, court
records, Enron-style mail exports).  A naive reader maps one archive
to one task; this source reads the CENTRAL DIRECTORY on the driver
(EOCD scan in the tail + one directory read — a few KB regardless of
archive size) and fans the members out across the fleet: every task
opens the archive, seeks straight to its members' local headers, and
inflates only its slice.  That is the same listing-is-cheap /
reads-are-distributed shape as every file source Spark ships, and the
same byte-range pattern as this repo's WARC splitting.

Scope: the classic (non-Zip64) format with STORED and DEFLATED
members — encrypted members and Zip64 markers raise ValueError at
listing time (fail fast on the driver, not per task).  The central
directory is authoritative; a local header that disagrees with it
raises (the anti-decoy posture the WARC source established).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_extraction_spark.sources.warc import _open_binary

_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"

ZIP_DOC_SCHEMA = StructType(
    [
        StructField("archive", StringType()),
        StructField("name", StringType()),
        StructField("size", LongType()),
        StructField("content", BinaryType()),
    ]
)


def list_zip_entries(path: str, file_length: int) -> list[tuple[str, int, int, int, int]]:
    """Parse one archive's central directory (driver-side, tail reads
    only): returns (name, local_header_offset, comp_size, uncomp_size,
    method) per member.  Directories (trailing '/') are skipped."""
    with _open_binary(path) as f:
        # EOCD lives in the last 22..22+65535 bytes (the comment field)
        tail_len = min(file_length, 22 + 65535)
        f.seek(file_length - tail_len)
        tail = f.read(tail_len)
        # the full EOCD record is 22 bytes; a signature closer to EOF
        # than that is not a record (search bounded so at + 22 fits)
        at = tail.rfind(_EOCD_SIG, 0, len(tail) - 18)
        if at < 0:
            raise ValueError(f"zip source: no end-of-central-directory in {path}")
        (
            _disk,
            _cd_disk,
            _n_disk,
            n_total,
            cd_size,
            cd_offset,
            _comment_len,
        ) = struct.unpack("<HHHHIIH", tail[at + 4 : at + 22])
        if n_total == 0xFFFF or cd_offset == 0xFFFFFFFF or cd_size == 0xFFFFFFFF:
            raise ValueError(f"zip source: Zip64 archives unsupported ({path})")
        f.seek(cd_offset)
        cdir = f.read(cd_size)
    entries: list[tuple[str, int, int, int, int]] = []
    pos = 0
    for _ in range(n_total):
        if cdir[pos : pos + 4] != _CDIR_SIG:
            raise ValueError(f"zip source: corrupt central directory in {path}")
        (
            _ver_made,
            _ver_need,
            flags,
            method,
            _mtime,
            _mdate,
            _crc,
            comp_size,
            uncomp_size,
            name_len,
            extra_len,
            comment_len,
            _disk_no,
            _int_attr,
            _ext_attr,
            local_off,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", cdir[pos + 4 : pos + 46])
        name = cdir[pos + 46 : pos + 46 + name_len].decode("utf-8", "replace")
        pos += 46 + name_len + extra_len + comment_len
        if flags & 0x1:
            raise ValueError(f"zip source: encrypted member {name!r} in {path}")
        if method not in (0, 8):
            raise ValueError(
                f"zip source: unsupported compression {method} for {name!r}"
            )
        if comp_size == 0xFFFFFFFF or local_off == 0xFFFFFFFF:
            raise ValueError(f"zip source: Zip64 member {name!r} unsupported")
        if name.endswith("/"):
            continue  # directory entry
        entries.append((name, local_off, comp_size, uncomp_size, method))
    return entries


def read_zip_member(path: str, local_off: int, comp_size: int, method: int) -> bytes:
    """Executor-side: seek to the member's local header, validate it,
    and read + inflate exactly this member's bytes."""
    with _open_binary(path) as f:
        f.seek(local_off)
        hdr = f.read(30)
        if hdr[:4] != _LOCAL_SIG:
            raise ValueError(f"zip source: bad local header at {local_off} in {path}")
        name_len, extra_len = struct.unpack("<HH", hdr[26:30])
        f.seek(local_off + 30 + name_len + extra_len)
        raw = f.read(comp_size)
    if len(raw) != comp_size:
        raise ValueError(f"zip source: truncated member at {local_off} in {path}")
    if method == 0:
        return raw
    return zlib.decompressobj(-15).decompress(raw) + b""


def _read_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"archive": [], "name": [], "size": [], "content": []}
        for archive, name, off, csize, usize, method in zip(
            pdf["archive"], pdf["name"], pdf["local_off"],
            pdf["comp_size"], pdf["uncomp_size"], pdf["method"],
        ):
            data = read_zip_member(str(archive), int(off), int(csize), int(method))
            if len(data) != int(usize):
                raise ValueError(
                    f"zip source: member {name!r} inflated to {len(data)} bytes,"
                    f" central directory says {usize}"
                )
            out["archive"].append(str(archive))
            out["name"].append(str(name))
            out["size"].append(len(data))
            out["content"].append(data)
        yield pd.DataFrame(out)


def read_docs_zip(
    spark: SparkSession, path: str, parallelism: int | None = None
) -> DataFrame:
    """(archive, name, size, content) for every member of every archive
    matching ``path``.  The driver reads only EOCD + central directory
    per archive; member bytes are read and inflated on executors, one
    seek per member."""
    meta = (
        spark.read.format("binaryFile").load(path).select("path", "length").collect()
    )
    rows = []
    for r in meta:
        for name, off, csize, usize, method in list_zip_entries(
            r["path"], int(r["length"])
        ):
            rows.append((r["path"], name, off, csize, usize, method))
    entry_schema = (
        "archive string, name string, local_off long, comp_size long,"
        " uncomp_size long, method int"
    )
    if not rows:
        return spark.createDataFrame([], ZIP_DOC_SCHEMA)
    df = spark.createDataFrame(rows, entry_schema)
    n = parallelism or spark.sparkContext.defaultParallelism
    df = df.repartition(min(len(rows), n))
    return df.mapInPandas(_read_batches, schema=ZIP_DOC_SCHEMA)


def read_pages_zip(spark: SparkSession, path: str) -> DataFrame:
    """Adapt ZIP members to the pages contract (url/html/text): url is
    ``zip://<archive>!<member>``, html carries the raw bytes, text the
    UTF-8 decode (replacement on invalid bytes)."""
    docs = read_docs_zip(spark, path)
    return docs.select(
        F.concat(F.lit("zip://"), F.col("archive"), F.lit("!"), F.col("name")).alias(
            "url"
        ),
        F.col("content").alias("html"),
        F.decode(F.col("content"), "UTF-8").alias("text"),
        # lineage provenance: like the WARC source, rows come off a
        # non-file plan where input_file_name() is empty, so the archive
        # path rides along explicitly
        F.col("archive").alias("source_file"),
    )
