"""Splittable ZIP source (sources/zipsource.py): central-directory
listing on the driver, per-member reads on executors."""

from __future__ import annotations

import io
import os
import zipfile

import pytest

from pdf_extraction_spark.sources.zipsource import (
    list_zip_entries,
    read_docs_zip,
    read_pages_zip,
    read_zip_member,
)


def _make_zip(path, members, comment=b""):
    with zipfile.ZipFile(path, "w") as z:
        for name, data, method in members:
            info = zipfile.ZipInfo(name, date_time=(1990, 1, 1, 0, 0, 0))
            info.compress_type = method
            z.writestr(info, data)
        if comment:
            z.comment = comment
    return os.path.getsize(path)


_MEMBERS = [
    ("docs/a.txt", b"alpha document body " * 50, zipfile.ZIP_DEFLATED),
    ("docs/b with space.txt", b"beta", zipfile.ZIP_STORED),
    ("unicode é✓.md", "unicode ✓ content".encode(), zipfile.ZIP_DEFLATED),
    ("empty.bin", b"", zipfile.ZIP_STORED),
    ("bin.dat", bytes(range(256)) * 40, zipfile.ZIP_DEFLATED),
]


def test_listing_and_member_reads_match_zipfile(tmp_path):
    p = str(tmp_path / "corpus.zip")
    # an archive COMMENT shifts the EOCD away from the file tail — the
    # backward scan must still find it
    ln = _make_zip(p, _MEMBERS, comment=b"x" * 1000)
    entries = list_zip_entries(p, ln)
    assert [e[0] for e in entries] == [m[0] for m in _MEMBERS]
    with zipfile.ZipFile(p) as z:
        for name, off, csize, usize, method in entries:
            got = read_zip_member(p, off, csize, method)
            assert got == z.read(name)
            assert len(got) == usize


def test_directory_entries_skipped(tmp_path):
    p = str(tmp_path / "dirs.zip")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("folder/", b"")
        z.writestr("folder/file.txt", b"content")
    entries = list_zip_entries(p, os.path.getsize(p))
    assert [e[0] for e in entries] == ["folder/file.txt"]


def test_encrypted_and_corrupt_rejected(tmp_path):
    p = str(tmp_path / "x.zip")
    ln = _make_zip(p, _MEMBERS[:2])
    blob = bytearray(open(p, "rb").read())
    # set the encryption flag bit in the central directory entry
    at = blob.find(b"PK\x01\x02")
    blob[at + 8] |= 0x01
    p2 = str(tmp_path / "enc.zip")
    open(p2, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="encrypted"):
        list_zip_entries(p2, len(blob))
    # garbage: no EOCD at all
    p3 = str(tmp_path / "junk.zip")
    open(p3, "wb").write(b"not a zip" * 10)
    with pytest.raises(ValueError, match="end-of-central-directory"):
        list_zip_entries(p3, 90)
    # review regression: an EOCD signature too close to EOF for a full
    # 22-byte record must raise the documented ValueError, not a
    # struct.error from a short unpack
    p3b = str(tmp_path / "shortsig.zip")
    open(p3b, "wb").write(b"x" * 40 + b"PK\x05\x06" + b"\x00" * 5)
    with pytest.raises(ValueError, match="end-of-central-directory"):
        list_zip_entries(p3b, 49)
    # a local header that disagrees with the central directory
    entries = list_zip_entries(p, ln)
    name, off, csize, usize, method = entries[0]
    blob = bytearray(open(p, "rb").read())
    blob[off] ^= 0xFF
    p4 = str(tmp_path / "baddecoy.zip")
    open(p4, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="bad local header"):
        read_zip_member(p4, off, csize, method)


def test_spark_read_docs_zip(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    _make_zip(str(d / "one.zip"), _MEMBERS)
    _make_zip(str(d / "two.zip"), [("solo.txt", b"second archive", zipfile.ZIP_STORED)])
    df = read_docs_zip(spark, str(d))
    rows = {(os.path.basename(r["archive"]), r["name"]): bytes(r["content"]) for r in df.collect()}
    assert len(rows) == len(_MEMBERS) + 1
    assert rows[("two.zip", "solo.txt")] == b"second archive"
    for name, data, _m in _MEMBERS:
        assert rows[("one.zip", name)] == data
    # the read stage must fan members across partitions, not one task
    assert df.rdd.getNumPartitions() > 1


def test_pipeline_zip_format_end_to_end(spark, tmp_path):
    """jobs/extract --format zip equivalent: run_extraction over a zip
    corpus — byte-identity vs the oracle kernel, and lineage manifests
    carry the ARCHIVE path (input_file_name() is empty on the
    synthesized-rows plan, like the WARC source)."""
    import json

    from pdf_extraction_spark.plans.pipeline import run_extraction
    from tests.oracle import oracle_document

    d = tmp_path / "corpus"
    d.mkdir()
    html_a = "<html><body><p>zip doc alpha</p></body></html>"
    html_b = "<html><body><p>zip doc beta</p></body></html>"
    _make_zip(
        str(d / "c.zip"),
        [
            ("a.html", html_a.encode(), zipfile.ZIP_DEFLATED),
            ("b.html", html_b.encode(), zipfile.ZIP_STORED),
        ],
    )
    out = str(tmp_path / "out")
    run_extraction(spark, str(d), out, groups=1, input_format="zip")
    m = json.load(open(os.path.join(out, "_manifests", "group-0.json")))
    assert m["lineage"] and all(
        r["input_file"].endswith("c.zip") for r in m["lineage"]
    )
    got = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(os.path.join(out, "group=*")).collect()
    }
    assert len(got) == 2
    for name, html in [("a.html", html_a), ("b.html", html_b)]:
        url = next(u for u in got if u.endswith("!" + name))
        assert got[url] == oracle_document(url, html.encode(), html)["extracted_text"]


def test_spark_pages_contract(spark, tmp_path):
    from pdf_extraction_spark.sources.pages import validate_pages_schema

    d = tmp_path / "pages"
    d.mkdir()
    _make_zip(
        str(d / "p.zip"),
        [("doc1.txt", "hello zip world".encode(), zipfile.ZIP_DEFLATED)],
    )
    pages = read_pages_zip(spark, str(d))
    validate_pages_schema(pages)
    row = pages.collect()[0]
    assert row["url"].startswith("zip://") and row["url"].endswith("!doc1.txt")
    assert bytes(row["html"]) == b"hello zip world"
    assert row["text"] == "hello zip world"
