"""PPTX and ODT build/extract: round trips, deck-order resolution
through rels (not name sort), ODF whitespace-element inversion, and
containment on malformed bytes."""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.operators.docx_text import sanitize_for_xml
from pdf_extraction_spark.operators.odt_text import (
    ODT_MIME,
    build_odt,
    extract_odt_paragraphs,
)
from pdf_extraction_spark.operators.pptx_text import (
    build_pptx,
    extract_pptx_slides,
)

# --- pptx --------------------------------------------------------------------


def test_pptx_roundtrip_and_deck_order():
    slides = ["first slide", "second\nwith break", "third"]
    assert extract_pptx_slides(build_pptx(slides)) == slides
    # part names are REVERSED vs deck order: name-sorting extractors fail
    with zipfile.ZipFile(io.BytesIO(build_pptx(slides))) as z:
        assert "<a:t>first</a:t>" in z.read("ppt/slides/slide3.xml").decode()
        assert "<a:t>third</a:t>" not in z.read("ppt/slides/slide3.xml").decode()


def test_pptx_paragraph_join_inserts_newline():
    # hand XML: two <a:p> paragraphs join with '\n' (deck semantics)
    raw = build_pptx(["x"])
    src = zipfile.ZipFile(io.BytesIO(raw))
    buf = io.BytesIO()
    two_paras = (
        '<?xml version="1.0"?>'
        '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
        "<p:cSld><p:spTree><p:sp><p:txBody>"
        "<a:p><a:r><a:t>title</a:t></a:r></a:p>"
        "<a:p><a:r><a:t>body</a:t></a:r></a:p>"
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    )
    with zipfile.ZipFile(buf, "w") as z:
        for name in src.namelist():
            z.writestr(
                name,
                two_paras if name == "ppt/slides/slide1.xml" else src.read(name),
            )
    assert extract_pptx_slides(buf.getvalue()) == ["title\nbody"]


def test_pptx_malformed_returns_none():
    assert extract_pptx_slides(b"not a zip") is None
    from pdf_extraction_spark.operators.docx_text import build_docx

    assert extract_pptx_slides(build_docx(["p"])) is None


@settings(max_examples=120, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=3))
def test_pptx_roundtrip_fuzz(slides):
    want = [sanitize_for_xml(s) for s in slides]
    assert extract_pptx_slides(build_pptx(slides)) == want


# --- odt ---------------------------------------------------------------------


def test_odt_roundtrip_with_odf_whitespace():
    paras = ["tabs\there", "double  space   runs", "line\nbreak", " edge "]
    assert extract_odt_paragraphs(build_odt(paras)) == paras


def test_odt_package_shape():
    raw = build_odt(["x"])
    with zipfile.ZipFile(io.BytesIO(raw)) as z:
        infos = z.infolist()
    # mimetype FIRST and STORED (ODF 1.2 §3.3): readable at offset 38
    assert infos[0].filename == "mimetype"
    assert infos[0].compress_type == zipfile.ZIP_STORED
    assert raw[38 : 38 + len(ODT_MIME)] == ODT_MIME.encode()
    # whitespace runs are elements, not literal text
    with zipfile.ZipFile(io.BytesIO(build_odt(["a  b\tc"]))) as z:
        content = z.read("content.xml").decode()
    assert '<text:s text:c="2"/>' in content and "<text:tab/>" in content


def test_odt_wrong_mimetype_rejected():
    raw = build_odt(["x"])
    src = zipfile.ZipFile(io.BytesIO(raw))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name in src.namelist():
            z.writestr(
                name,
                b"application/zip" if name == "mimetype" else src.read(name),
            )
    assert extract_odt_paragraphs(buf.getvalue()) is None
    assert extract_odt_paragraphs(b"junk") is None


@settings(max_examples=120, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=3))
def test_odt_roundtrip_fuzz(paras):
    want = [sanitize_for_xml(p) for p in paras]
    assert extract_odt_paragraphs(build_odt(paras)) == want
