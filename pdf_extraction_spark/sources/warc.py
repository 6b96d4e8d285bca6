"""WARC source: Common Crawl's native archive format (ISO 28500) read
directly into the pages schema — no external warc library (stdlib gzip +
a from-scratch record parser).

Layout facts the parser honors:
  * a .warc.gz is a MULTI-MEMBER gzip stream (one member per record in
    CC practice); stdlib GzipFile reads through all members;
  * each record = header block (CRLF lines, terminated by CRLFCRLF) +
    exactly Content-Length payload bytes + CRLFCRLF;
  * only ``WARC-Type: response`` records carry pages; their payload is a
    full HTTP response — the html bytes start after the HTTP header's
    own CRLFCRLF.

Scale shape: BOTH layouts are splittable without an index.  Real CC
``.warc.gz`` files are member-per-record gzip, so a large one splits on
verified gzip-member boundaries (magic + full-member inflate + WARC
prefix + chain check — see _iter_warc_gz_records_range); a large
UNCOMPRESSED ``.warc`` is split into ``split_bytes`` byte ranges,
Hadoop-style: each task seeks
to its range, scans forward to the first valid record boundary
(``\\r\\n\\r\\n`` + ``WARC/1.`` magic + a parseable header block — the
magic alone can appear inside an archived payload), and parses every
record STARTING inside its range, reading past the range end for the
tail record only.  That bounds task size by split_bytes regardless of
archive size — the pathological one-giant-file case no longer serializes
onto one core.  The parse runs in Arrow-batched mapInPandas; emitted
rows carry only the pages columns, so the fat archive bytes never
outlive the task.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pyspark.sql.types import StringType, StructField, StructType

from pdf_extraction_spark.sources.pages import PAGES_SCHEMA

# pages schema + provenance: rows from the byte-range split path are built
# off a non-file plan where input_file_name() is empty, so the WARC source
# carries the archive path as an explicit column (the extraction pipeline's
# lineage prefers `source_file` when present)
WARC_PAGES_SCHEMA = StructType(
    list(PAGES_SCHEMA.fields) + [StructField("source_file", StringType())]
)


def _iter_warc_records(raw: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = raw[pos:head_end].decode("utf-8", "replace").split("\r\n")
        if not head or not head[0].startswith("WARC/"):
            return
        headers = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        if body_start + length > n:
            return  # truncated tail record: no full payload -> drop
        payload = raw[body_start : body_start + length]
        yield headers, payload
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a WARC response payload."""
    sep = payload.find(b"\r\n\r\n")
    return payload[sep + 4 :] if sep >= 0 else payload


def _parse_warc_ts(v: str):
    try:
        return dt.datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


def _append_record(out: dict, headers: dict, payload: bytes, source_file: str) -> None:
    """Emit one pages row for a WARC response record (shared by the
    whole-file and byte-range kernels)."""
    if headers.get("warc-type") != "response":
        return
    url = headers.get("warc-target-uri")
    if not url:
        return
    out["url"].append(url)
    out["warc_ts"].append(_parse_warc_ts(headers.get("warc-date", "")))
    out["html"].append(_http_body(payload))
    out["text"].append(None)
    out["lang"].append(None)
    out["source_file"].append(source_file)


# --- byte-range splitting of uncompressed .warc files -----------------------

_WARC_MAGIC = b"WARC/1."


def _open_binary(path: str):
    """Open a binaryFile-style path for random-access reads.  Local
    ``file:`` URIs use plain open(); other schemes go through pyarrow.fs
    (S3/HDFS/GCS on a real cluster).  binaryFile emits percent-encoded
    URIs (spaces etc.), so ``file:`` paths are unquoted first."""
    if path.startswith("file:"):
        from urllib.parse import unquote

        local = re.sub("^/+", "/", unquote(path[len("file:"):]))
        return open(local, "rb")
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem.open_input_file(p)
    return open(path, "rb")


def _parse_header_block(block: bytes):
    """(headers dict, content_length) from a CRLF header block, or None
    when it is not a plausible WARC record header."""
    lines = block.decode("utf-8", "replace").split("\r\n")
    if not lines or not lines[0].startswith("WARC/"):
        return None
    headers = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    try:
        return headers, int(headers.get("content-length", ""))
    except ValueError:
        return None


def _iter_warc_records_range(f, start: int, end: int, read_chunk: int = 1 << 22):
    """Yield (headers, payload) for every record STARTING in [start, end).

    Hadoop-split semantics: a record straddling ``start`` belongs to the
    previous split; the tail record may be read past ``end``.  Boundary
    detection requires the ``WARC/1.`` magic preceded by the record
    separator CRLFCRLF (or file offset 0), a parseable header with a
    WARC-Type, AND the chain property (the candidate's Content-Length
    lands on EOF or another record boundary) — so even a COMPLETE fake
    record embedded mid-payload (a WARC archived inside a WARC) cannot
    desynchronize a split.  Residual ambiguity: a fake record positioned
    as the exact SUFFIX of its enclosing payload chains onto the real
    next boundary and is emitted as one phantom record by the split that
    starts inside it — locally indistinguishable without an offset index
    (.gz archives resolve it structurally via gzip members).

    The file is read lazily in ``read_chunk`` increments (never the whole
    range upfront) and the consumed prefix of the buffer is compacted once
    it exceeds 2x read_chunk, so memory — and total memcpy — is bounded by
    ~2x read_chunk + one record regardless of split size.
    """
    f.seek(0, 2)
    file_size = f.tell()
    pre = 4 if start > 0 else 0
    f.seek(start - pre)
    base = start - pre  # file offset of buf[0]
    buf = f.read(read_chunk)

    def _extend(n=read_chunk):
        nonlocal buf
        more = f.read(n)
        buf += more
        return bool(more)

    def _complete_header(p):
        """head_end offset for the record at p, extending as needed."""
        while True:
            he = buf.find(b"\r\n\r\n", p)
            if he >= 0:
                return he
            if not _extend():
                return -1

    def _chains(p) -> bool:
        """True iff a plausible record at p is FOLLOWED by EOF or another
        record boundary — the decisive check against a fully valid-looking
        fake record embedded in a payload (e.g. a WARC archived inside a
        WARC): a fake's content-length almost never lands exactly on the
        next true boundary, while every real record's always does.

        The follow-position is PEEKED via seek/read (position restored),
        never by extending ``buf`` — a lying Content-Length must not pull
        the rest of the archive into memory just to be rejected.
        """
        he = _complete_header(p)
        if he < 0:
            return False
        parsed = _parse_header_block(buf[p:he])
        if parsed is None or "warc-type" not in parsed[0]:
            return False
        abs_q = base + he + 4 + parsed[1]
        if abs_q > file_size:
            return False  # claimed payload runs past EOF (lie/truncation)
        if abs_q == file_size:
            return True
        peek = b""
        if abs_q < base + len(buf):
            peek = buf[abs_q - base : abs_q - base + 64]
        if len(peek) < 64 and abs_q + len(peek) < file_size:
            # follow-position (or its tail) lies past the buffer: peek it
            # from the file and restore the sequential read position
            f.seek(abs_q)
            peek = f.read(64)
            f.seek(base + len(buf))
        consumed = 0
        while peek.startswith(b"\r\n", consumed):
            consumed += 2
        if not peek[consumed:]:
            return abs_q + consumed == file_size
        return peek.startswith(_WARC_MAGIC, consumed)

    # align to the first valid record boundary at global offset >= start;
    # the scan window is compacted too, so a split landing deep inside one
    # giant payload never accumulates the whole range in memory
    pos = -1
    search = 0
    while True:
        p = buf.find(_WARC_MAGIC, search)
        if p >= 0 and base + p >= end:
            return  # next candidate starts in the following split
        if p < 0:
            # any unseen magic would have to START at or past `end`?
            if base + len(buf) - (len(_WARC_MAGIC) - 1) >= end:
                return
            if len(buf) > 2 * read_chunk:
                # keep 4 separator bytes + a possibly-straddling magic tail;
                # everything before was already searched and rejected
                keep = 4 + len(_WARC_MAGIC) - 1
                cut = len(buf) - keep
                buf = buf[cut:]
                base += cut
            search = max(0, len(buf) - (len(_WARC_MAGIC) - 1))
            if not _extend():
                return
            continue
        boundary_ok = (base + p == 0) or (
            p >= 4 and buf[p - 4 : p] == b"\r\n\r\n"
        )
        if boundary_ok and base + p >= start and _chains(p):
            pos = p
            break
        search = p + 1
    # parse records sequentially from the aligned boundary; `pos` is a
    # cursor into buf — the consumed prefix is compacted only when it
    # exceeds 2x read_chunk (never a per-record slice copy)
    while True:
        if pos > 2 * read_chunk:
            buf = buf[pos:]
            base += pos
            pos = 0
        he = _complete_header(pos)
        if he < 0:
            return
        parsed = _parse_header_block(buf[pos:he])
        if parsed is None:
            return  # corrupt stream past a valid prefix — stop, don't guess
        headers, length = parsed
        body_start = he + 4
        need = body_start + length
        while len(buf) < need and _extend(max(read_chunk, need - len(buf))):
            pass
        if len(buf) < need:
            return  # truncated tail record (matches _iter_warc_records)
        payload = buf[body_start:need]
        yield headers, payload
        pos = need
        while True:
            if pos + 2 > len(buf) and not _extend():
                return
            if buf[pos : pos + 2] == b"\r\n":
                pos += 2
            else:
                break
        if base + pos >= end:
            return
        while len(buf) - pos < len(_WARC_MAGIC) and _extend():
            pass  # magic may straddle the buffer end
        if not buf.startswith(_WARC_MAGIC, pos):
            return


# --- member-aligned byte-range splitting of .warc.gz files ------------------
#
# Real Common Crawl WARCs are MEMBER-PER-RECORD gzip: each record is its
# own gzip member, so the archive is splittable without an index by
# scanning for the gzip magic at candidate offsets and verifying
# structurally — the same anti-decoy discipline as the uncompressed path,
# but stronger, because gzip members are self-delimiting (CRC32 + ISIZE
# trailer): a candidate is a boundary iff one whole member inflates from
# it, its content starts with the WARC magic, AND the member ends exactly
# at EOF or at another gzip magic (chain check).

_GZ_MAGIC = b"\x1f\x8b\x08"


def _inflate_member_at(f, offset: int, read_chunk: int):
    """Inflate exactly ONE gzip member starting at ``offset``.

    Returns (content, next_offset) or None if no valid member starts
    there (bad header, corrupt deflate stream, CRC/length mismatch, or
    truncation).  Reads lazily in ``read_chunk`` increments; memory is
    bounded by one member's content + one chunk.  Leaves the file
    position unspecified — callers seek."""
    import zlib

    d = zlib.decompressobj(31)  # 31 = gzip wrapper
    f.seek(offset)
    out = bytearray()
    consumed = 0
    while True:
        chunk = f.read(read_chunk)
        if not chunk:
            return None  # EOF mid-member: truncated
        try:
            out += d.decompress(chunk)
        except zlib.error:
            return None
        if d.eof:
            consumed += len(chunk) - len(d.unused_data)
            return bytes(out), offset + consumed
        consumed += len(chunk)


def _iter_warc_gz_records_range(f, start: int, end: int, read_chunk: int = 1 << 22):
    """Yield (headers, payload) for every record in gzip members STARTING
    in [start, end) of a member-per-record .warc.gz.

    Hadoop-split semantics mirror _iter_warc_records_range: a member
    straddling ``start`` belongs to the previous split; the tail member
    is read past ``end``.  Alignment scans [start, end) for the gzip
    magic and accepts a candidate only if (a) one complete member
    inflates from it, (b) the inflated content begins with ``WARC/``,
    and (c) the member is chained — followed by EOF or another gzip
    magic.  A verbatim decoy member embedded inside a stored-block outer
    payload fails (c) unless it is the exact suffix of its enclosing
    member — the same residual ambiguity (and the same odds) as the
    uncompressed path, resolvable only with an offset index."""
    f.seek(0, 2)
    file_size = f.tell()
    if start >= file_size:
        return

    def _member_chained(p):
        res = _inflate_member_at(f, p, read_chunk)
        if res is None:
            return None
        content, nxt = res
        if not content.startswith(b"WARC/"):
            return None
        if nxt != file_size:
            f.seek(nxt)
            if f.read(3) != _GZ_MAGIC:
                return None
        return res

    # ---- align to the first verified member boundary >= start ----
    aligned = None
    if start == 0:
        aligned = 0
    else:
        scan_base = start
        window = b""
        search = 0
        while aligned is None:
            if search + len(_GZ_MAGIC) > len(window):
                if scan_base + len(window) >= end + len(_GZ_MAGIC) - 1:
                    return  # every later candidate starts past end
                f.seek(scan_base + len(window))
                more = f.read(read_chunk)
                if not more:
                    return
                # drop the searched prefix, keep a possibly-straddling tail
                keep = len(_GZ_MAGIC) - 1
                if len(window) > keep:
                    cut = len(window) - keep
                    window = window[cut:]
                    scan_base += cut
                    search = max(0, search - cut)
                window += more
                continue
            p = window.find(_GZ_MAGIC, search)
            if p < 0:
                # resume where a magic could still straddle the window edge
                # (mirrors the uncompressed path): search = len(window) would
                # land at offset len(_GZ_MAGIC)-1 after compaction, skipping
                # a candidate whose first 1-2 bytes sit in the kept tail
                search = max(0, len(window) - (len(_GZ_MAGIC) - 1))
                continue
            if scan_base + p >= end:
                return  # next member belongs to the following split
            if _member_chained(scan_base + p) is not None:
                aligned = scan_base + p
            else:
                search = p + 1
    # ---- sequential member walk from the aligned boundary ----
    off = aligned
    while off < end and off < file_size:
        res = _inflate_member_at(f, off, read_chunk)
        if res is None:
            return  # truncated/corrupt tail member: stop, don't guess
        content, nxt = res
        for headers, payload in _iter_warc_records(content):
            yield headers, payload
        off = nxt


def _warc_split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Row-driven WARC reader: each input row is (path, start, end).

    end >= 0  -> parse records starting in [start, end) of an uncompressed
                 archive (byte-range split).
    end == -1 -> read the whole file (gzip-sniffed), one file per row.

    Paths are binaryFile-listing URIs opened via _open_binary (which
    unquotes percent-encoding) — never fed back through a Hadoop glob, so
    filenames containing glob metacharacters (* [ { %) are safe."""
    for pdf in batches:
        out = {"url": [], "warc_ts": [], "html": [], "text": [],
               "lang": [], "source_file": []}
        for path, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
            path, start, end = str(path), int(start), int(end)
            if end < 0:
                with _open_binary(path) as f:
                    raw = f.read()
                if path.endswith(".gz") or raw[:2] == b"\x1f\x8b":
                    raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
                for headers, payload in _iter_warc_records(raw):
                    _append_record(out, headers, payload, path)
            else:
                with _open_binary(path) as f:
                    if f.read(len(_GZ_MAGIC)) == _GZ_MAGIC:
                        it = _iter_warc_gz_records_range(f, start, end)
                    else:
                        it = _iter_warc_records_range(f, start, end)
                    for headers, payload in it:
                        _append_record(out, headers, payload, path)
        if out["url"]:  # an all-empty frame would lose the ts dtype
            yield pd.DataFrame(out)


def read_pages_warc(
    spark: SparkSession, path: str, *, split_bytes: int = 256 << 20
) -> DataFrame:
    """Pages from WARC/WARC.GZ files (glob or directory).

    Uncompressed ``.warc`` files larger than ``split_bytes`` are read as
    byte-range splits (record-boundary aligned), so one giant archive
    parallelizes across the fleet; .gz files and small files map one file
    to one task.  The listing reads binaryFile METADATA only (path +
    length — the content column is pruned out of the listing scan).
    """
    meta = (
        spark.read.format("binaryFile").load(path).select("path", "length").collect()
    )
    # one row per task: whole files are (path, 0, -1); big uncompressed
    # archives fan out into (path, start, end) byte ranges.  All reads go
    # through _open_binary on the listed URI — the listed paths are never
    # fed back through a second Hadoop glob, so filenames containing glob
    # metacharacters or literal % resolve correctly.
    task_rows: list[tuple[str, int, int]] = []
    for r in meta:
        p, ln = r["path"], int(r["length"])
        if ln > split_bytes:
            # both layouts split: uncompressed .warc on verified record
            # boundaries, .warc.gz on verified gzip-member boundaries
            # (CC-style member-per-record archives; a single-member .gz
            # degrades gracefully — the split containing offset 0 reads
            # the whole member, the others find no boundary and emit
            # nothing, so results match the whole-file read)
            for s in range(0, ln, split_bytes):
                task_rows.append((p, s, min(s + split_bytes, ln)))
        else:
            task_rows.append((p, 0, -1))

    if not task_rows:
        return spark.createDataFrame([], WARC_PAGES_SCHEMA)
    sdf = spark.createDataFrame(
        task_rows, "path string, start long, end long"
    ).repartition(len(task_rows))
    return sdf.mapInPandas(_warc_split_batches, schema=WARC_PAGES_SCHEMA)


def write_pages_warc(rows, path: str, *, compress: bool = True) -> None:
    """Build a .warc(.gz) from (url, warc_ts, html_bytes) triples —
    fixture/export helper; compressed output is one gzip member per
    record, CC-style."""
    out = io.BytesIO()
    for url, ts, html in rows:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
        )
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode()
        record = head + http + b"\r\n\r\n"
        out.write(gzip.compress(record) if compress else record)
    with open(path, "wb") as f:
        f.write(out.getvalue())
