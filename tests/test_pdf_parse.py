"""PDF builder/parser suite: round-trip identity, subset wrinkles, and the
kernel's pdf branch (byte-identity of the F4 fold vs the golden text layer).

The reference capability this stands in for is pdfplumber's text layer
(`/root/reference/pdfextraction.py:33-35`) / PyPDF2 (`app.py:46-52`):
per-page text out of real %PDF bytes, pure Python + stdlib zlib.
"""

from __future__ import annotations

import random
import zlib

import pytest

from pdf_extraction_spark.pdf_parse import build_pdf, extract_pdf_pages


def test_round_trip_basic():
    pages = ["line one\nline two\nline three", "page 2 text", ""]
    assert extract_pdf_pages(build_pdf(pages)) == pages


def test_round_trip_unicode_and_escapes():
    pages = [
        "unicode: žluťoučký kůň — ¿niño? 中文 🎉\ttab",
        "parens () and \\ backslash\n(nested (deep)) \\n literal",
        "ctrl bytes stay: \x0b \x85 \r kept\nnext line",
    ]
    for compress in (True, False):
        for indirect in (True, False):
            data = build_pdf(pages, compress=compress, indirect_length=indirect)
            assert extract_pdf_pages(data) == pages


def test_round_trip_fuzz_200():
    rng = random.Random(7)
    alphabet = "abc ()\\\n\té 中\U0001f600<>[]/%#"
    for t in range(200):
        pages = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(120)))
            for _ in range(1 + rng.randrange(4))
        ]
        data = build_pdf(
            pages, compress=bool(t % 2), indirect_length=(t % 3 == 0)
        )
        assert extract_pdf_pages(data) == pages, t


def test_emitted_bytes_are_real_pdf_structure():
    """The builder emits spec-shaped bytes, not a bespoke container: header,
    xref table whose offsets actually resolve, FlateDecode streams that
    zlib-inflate to BT/ET content, and a trailer with /Root."""
    data = build_pdf(["alpha\nbeta", "gamma"])
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # startxref points at the xref table
    start = int(data[data.rfind(b"startxref") :].split()[1])
    assert data[start : start + 4] == b"xref"
    # every xref offset lands exactly on "N 0 obj"
    lines = data[start:].split(b"\n")
    n_objs = int(lines[1].split()[1])
    for num, entry in enumerate(lines[2 : 2 + n_objs]):
        off, _gen, kind = entry.split()[:3]
        if kind == b"n":
            assert data[int(off) :].startswith(f"{num} 0 obj".encode())
    assert b"/Root 1 0 R" in data
    # content streams inflate to text operators
    i = data.find(b"stream\n")
    j = data.find(b"\nendstream", i)
    inflated = zlib.decompress(data[i + len(b"stream\n") : j])
    assert inflated.startswith(b"BT\n") and b"Tj" in inflated


def test_damaged_xref_falls_back_to_object_scan():
    pages = ["alpha\nbeta", "gamma"]
    data = build_pdf(pages)
    broken = data[: data.rfind(b"startxref")] + b"garbage trailing bytes"
    assert extract_pdf_pages(broken) == pages


def test_unsupported_filter_raises():
    data = build_pdf(["x"], compress=False)
    bad = data.replace(b"<< /Length", b"<< /Filter /LZWDecode /Length")
    with pytest.raises(ValueError, match="unsupported filter"):
        extract_pdf_pages(bad)


def test_not_a_pdf_raises():
    with pytest.raises(ValueError, match="%PDF"):
        extract_pdf_pages(b"<html>not a pdf</html>")


def test_mixed_show_operators_cover_all_variants():
    """4+ lines forces every show shape (Tj, TJ-with-kerning, ', hex Tj)
    and every line-move shape (T*, Td, ', TD) into one content stream."""
    pages = ["v0\nv1é\nv2\nv3中\nv4\nv5\nv6\nv7"]
    data = build_pdf(pages, compress=False)
    raw = data[data.find(b"stream\n") + 7 : data.find(b"\nendstream")]
    for op in (b" Tj", b" TJ", b") '", b"T*", b"Td", b"TD", b"<"):
        assert op in raw, op
    assert extract_pdf_pages(data) == pages


def test_kernel_pdf_branch_f4_folds_parsed_pages():
    """extract_document on PDF bytes == the text-layer path on the same
    pages: doc_kind flips to 'pdf', everything else byte-identical."""
    from pdf_extraction_spark.kernel import PAGE_SEP, extract_document

    pages = ["Invoice Number: 77\nTotal Amount: 12:34", "", "Notes: a\nb:c"]
    text_layer = PAGE_SEP.join(pages)
    via_pdf = extract_document("u", build_pdf(pages), None)
    via_text = extract_document("u", None, text_layer)
    assert via_pdf[1] == "pdf" and via_text[1] == "text"
    assert via_pdf[2:] == via_text[2:]  # text, fields, page_fields, spans, err


def test_kernel_contains_corrupt_pdf_on_error_column():
    from pdf_extraction_spark.kernel import extract_document

    out = extract_document("u", b"%PDF-1.4\nthis is not valid", None)
    assert out[1] == "error"
    assert out[6] and "ValueError" in out[6]


def test_fixture_pdf_rows_golden_equality():
    """The generated fixture's PDF rows: pipeline output from BYTES equals
    the oracle's output from the golden TEXT layer, field for field."""
    from fixtures.gen import gen_pages
    from pdf_extraction_spark.kernel import extract_document
    from tests.oracle import oracle_document

    rows = gen_pages(96).to_pylist()
    pdf_rows = [
        r for r in rows if r["html"] and bytes(r["html"][:5]) == b"%PDF-"
    ]
    assert len(pdf_rows) >= 8, "fixture must carry PDF rows"
    keys = ["url", "doc_kind", "extracted_text", "fields", "page_fields",
            "spans", "error"]
    for r in pdf_rows:
        got = dict(zip(keys, extract_document(r["url"], r["html"], r["text"])))
        exp = oracle_document(r["url"], r["html"], r["text"])
        assert got == exp, r["url"]
        assert got["doc_kind"] == "pdf"
