"""Font-encoding generality in the from-scratch PDF parser (round-5
verdict ask #2): /ToUnicode CMaps, named base encodings, /Encoding
dictionaries with /Differences, and Type0/Identity-H composite fonts —
the layer that separates real-world text recovery from "decode as UTF-8"
(the reference resolves all of these through pdfplumber,
/root/reference/pdfextraction.py:33-35)."""

from __future__ import annotations

import zlib

import pytest

from pdf_extraction_spark.pdf_parse import (
    _MACROMAN,
    _WINANSI,
    _parse_tounicode,
    build_pdf,
    extract_pdf_pages,
)

MODES = ["winansi", "macroman", "tounicode", "cid"]

TEXTS = [
    "Hello, world!\nWinAnsi chars: café — “quotes” … ±µ",
    "Exotic: 日本語テキスト и русский ε λ ★\nmixed ascii too",
    "astral plane: 𝄞 😀 𐍈 end",
    "",
    "ﬁ ﬂ ligatures, ñ Ñ ç å Ø œ Æ",
    "control-ish:\ttab and\rcarriage",
]


@pytest.mark.parametrize("mode", MODES)
def test_font_mode_roundtrip_identity(mode):
    for t in TEXTS:
        pages = [t[: len(t) // 2], t[len(t) // 2 :]]
        got = extract_pdf_pages(build_pdf(pages, font=mode))
        assert got == pages, (mode, t)


@pytest.mark.parametrize("mode", MODES)
def test_font_mode_composes_with_layouts(mode):
    t = TEXTS[0] + "\n" + TEXTS[4]
    pages = [t, t[::-1]]
    for kw in (
        {"xref_stream": True, "use_objstm": True, "predictor": True},
        {"compress": False},
        {"encrypt": "rc4-128"},
        {"indirect_length": True},
    ):
        got = extract_pdf_pages(build_pdf(pages, font=mode, **kw))
        assert got == pages, (mode, kw)


def test_multi_font_spill():
    """>255 distinct chars force extra fonts with mid-line Tf switches
    (winansi/macroman: Differences-only spill fonts; tounicode: extra
    CMap fonts; cid: one 2-byte font covers everything)."""
    big = "".join(chr(0x4E00 + i) for i in range(600)) + " ascii tail"
    interleaved = "".join(chr(0x100 + i) + chr(65 + i % 26) for i in range(300))
    for mode in MODES:
        for t in (big, interleaved):
            pages = [t, t[::-1]]
            blob = build_pdf(pages, font=mode)
            assert extract_pdf_pages(blob) == pages, mode
    # winansi really did emit several fonts for the CJK text
    blob = build_pdf([big], font="winansi", compress=False)
    assert b"/F3" in blob and b"/Differences" in blob


def test_cid_identity_and_structure():
    t = "composite font text: 東京 €𝄞"
    blob = build_pdf([t], font="cid", compress=False)
    assert b"/Subtype /Type0" in blob and b"/Identity-H" in blob
    assert b"/DescendantFonts" in blob and b"/CIDFontType2" in blob
    assert extract_pdf_pages(blob) == [t]


def _hand_built_pdf(font_obj: bytes, content: bytes) -> bytes:
    """Raw hand-assembled classic-xref PDF — independent of build_pdf, so
    a builder bug cannot mask a parser bug."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>",
        3: font_obj,
        4: (
            b"<< /Type /Page /Parent 2 0 R /Resources"
            b" << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: b"<< /Length %d >>" % len(content),
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num]
        if num == 5:
            out += b"\nstream\n" + content + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for num in range(1, 6):
        out += b"%010d 00000 n \n" % offs[num]
    out += (
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % xref_at
    )
    return bytes(out)


def test_hand_built_winansi_differences_file():
    """The verdict's asked-for fixture: a hand-built file whose font is
    /BaseEncoding /WinAnsiEncoding plus a /Differences array using REAL
    AGL glyph names; shown bytes use the overridden codes."""
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman /Encoding"
        b" << /BaseEncoding /WinAnsiEncoding /Differences"
        b" [ 130 /eacute 144 /emdash /quoteleft 146 /quoteright"
        b" 160 /uni0416 /u01F600 ] >> >>"
    )
    content = (
        b"BT /F1 12 Tf (caf\x82 \x90 \x91quote\x92 \xa0\xa1) Tj ET"
    )
    got = extract_pdf_pages(_hand_built_pdf(font, content))
    assert got == ["café — ‘quote’ Ж😀"]


def test_hand_built_named_encodings():
    # WinAnsi name form: 0x93/0x94 are the cp1252 smart quotes
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    got = extract_pdf_pages(
        _hand_built_pdf(font, b"BT /F1 12 Tf (\x93ok\x94 \xe9) Tj ET")
    )
    assert got == ["“ok” é"]
    # MacRoman name form: 0x8E is eacute, 0xD0 endash in Mac Roman
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /MacRomanEncoding >>"
    )
    got = extract_pdf_pages(
        _hand_built_pdf(font, b"BT /F1 12 Tf (caf\x8e \xd0 ok) Tj ET")
    )
    assert got == ["café – ok"]


def test_hand_built_tounicode_takes_precedence():
    """A ToUnicode CMap wins over a (contradictory) named encoding, and
    both bfrange destination forms map correctly."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"2 beginbfchar\n<41> <0416>\n<42> <D834DD1E>\nendbfchar\n"
        b"2 beginbfrange\n"
        b"<50> <52> <0061>\n"
        b"<60> <61> [ <00E9> <2014> ]\n"
        b"endbfrange\nendcmap\nend\n"
    )
    objs_extra = b"6 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
        len(cmap),
        cmap,
    )
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>"
    )
    # hand-roll with 7 objects
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>",
        3: font,
        4: (
            b"<< /Type /Page /Parent 2 0 R /Resources"
            b" << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
    }
    content = b"BT /F1 12 Tf (\x41\x42\x50\x51\x52\x60\x61) Tj ET"
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    offs[5] = len(out)
    out += b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content)
    out += content + b"\nendstream\nendobj\n"
    offs[6] = len(out)
    out += objs_extra
    xref_at = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += b"%010d 00000 n \n" % offs[num]
    out += (
        b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % xref_at
    )
    got = extract_pdf_pages(bytes(out))
    # <41>-><0416> Ж; <42>-> surrogate pair 𝄞; bfrange 50-52 -> abc;
    # array form 60,61 -> é —
    assert got == ["Ж𝄞abcé—"]


def test_resources_inherit_from_pages_node():
    """/Resources on the Pages NODE (not the leaf) must still bind F1 —
    §7.7.3.4 inheritance that real writers rely on."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            b"<< /Type /Pages /Kids [ 4 0 R ] /Count 1 /Resources"
            b" << /Font << /F1 3 0 R >> >> >>"
        ),
        3: (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        ),
        4: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        5: None,
    }
    content = b"BT /F1 12 Tf (\x93inherited\x94) Tj ET"
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        if num == 5:
            out += b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content)
            out += content + b"\nendstream\nendobj\n"
        else:
            out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for num in range(1, 6):
        out += b"%010d 00000 n \n" % offs[num]
    out += (
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % xref_at
    )
    assert extract_pdf_pages(bytes(out)) == ["“inherited”"]


def test_unknown_encoding_falls_back_to_utf8():
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /SomeVendorEncoding >>"
    )
    text = "utf8 fallback é ✓".encode("utf-8")
    esc = b"".join(
        b"\\%03o" % c if c > 126 else bytes([c]) for c in text
    )
    got = extract_pdf_pages(
        _hand_built_pdf(font, b"BT /F1 12 Tf (" + esc + b") Tj ET")
    )
    assert got == ["utf8 fallback é ✓"]


def test_undefined_codes_decode_to_replacement():
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    # 0x81 is one of the five cp1252 holes
    got = extract_pdf_pages(
        _hand_built_pdf(font, b"BT /F1 12 Tf (a\x81b) Tj ET")
    )
    assert got == ["a�b"]


def test_tounicode_hostile_range_capped():
    """A hostile <0000> <FFFF>-per-range sweep must raise (contained by
    F18), not expand without bound."""
    body = b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    body += b"2 beginbfrange\n"
    body += b"<0000> <FFFF> <0000>\n<0000> <FFFF> <0001>\n"
    body += b"endbfrange\n"
    with pytest.raises(ValueError, match="too large"):
        _parse_tounicode(body)


def test_parse_tounicode_units():
    lengths, mapping = _parse_tounicode(
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<01> <0041>\nendbfchar\n"
        b"1 beginbfrange\n<10> <12> <0061>\nendbfrange\n"
    )
    assert lengths == (1,)
    assert mapping == {b"\x01": "A", b"\x10": "a", b"\x11": "b", b"\x12": "c"}


def test_encoding_tables_spec_patches():
    """The two deliberate deviations from Python's codecs, pinned:
    Adobe MacRomanEncoding has /currency at 0xDB (not the Mac OS 8.5
    euro) and no Apple-logo glyph at 0xF0; WinAnsi keeps cp1252's five
    undefined holes."""
    assert _MACROMAN[0xDB] == "¤"
    assert _MACROMAN[0xF0] is None
    assert _MACROMAN[0x8E] == "é"
    for hole in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
        assert _WINANSI[hole] is None
    assert _WINANSI[0x93] == "“" and _WINANSI[0xE9] == "é"


def test_legacy_default_font_has_no_encoding_claim():
    """font=None keeps the UTF-8 fallback contract: the fixture font no
    longer declares /WinAnsiEncoding it does not use (the parser now
    honors declared encodings, so the old claim would corrupt text)."""
    blob = build_pdf(["plain ascii"], compress=False)
    assert b"WinAnsiEncoding" not in blob
    assert extract_pdf_pages(blob) == ["plain ascii"]
