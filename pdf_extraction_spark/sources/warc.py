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

Scale shape: one WARC file = one Spark task (``binaryFile`` rows are not
splittable — the gzip members would be, but CC ships ~1 GB files and the
fleet parallelism comes from file count: a crawl segment has thousands).
The parse runs in Arrow-batched mapInPandas; emitted rows carry only the
pages columns, so the fat archive bytes never outlive the task.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pdf_extraction_spark.sources.pages import PAGES_SCHEMA


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


def _warc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        for path, content in zip(pdf["path"], pdf["content"]):
            raw = bytes(content)
            if path.endswith(".gz") or raw[:2] == b"\x1f\x8b":
                raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
            for headers, payload in _iter_warc_records(raw):
                if headers.get("warc-type") != "response":
                    continue
                url = headers.get("warc-target-uri")
                if not url:
                    continue
                out["url"].append(url)
                out["warc_ts"].append(_parse_warc_ts(headers.get("warc-date", "")))
                out["html"].append(_http_body(payload))
                out["text"].append(None)
                out["lang"].append(None)
        yield pd.DataFrame(out)


def read_pages_warc(spark: SparkSession, path: str) -> DataFrame:
    """Pages from WARC/WARC.GZ files (glob or directory)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_warc_batches, schema=PAGES_SCHEMA)


def write_pages_warc(rows, path: str) -> None:
    """Build a .warc.gz from (url, warc_ts, html_bytes) triples — fixture/
    export helper; one gzip member per record, CC-style."""
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
        out.write(gzip.compress(head + http + b"\r\n\r\n"))
    with open(path, "wb") as f:
        f.write(out.getvalue())
