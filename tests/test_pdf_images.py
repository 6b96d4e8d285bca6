"""Image XObjects embedded in PDFs (round-5 verdict ask #5): the
scanned-document layout — a page whose content IS a /DCTDecode JPEG —
must round-trip the image stream bit-exactly through build + parse."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_spark.operators.jpeg import encode_baseline_jpeg, parse_jpeg
from pdf_extraction_spark.operators.ocr import ocr_roundtrip_one, render_page
from pdf_extraction_spark.pdf_parse import (
    _jpeg_sof_dims,
    build_pdf,
    extract_pdf_images,
    extract_pdf_pages,
)


def _jpeg():
    return encode_baseline_jpeg(render_page("IMAGE XOBJECT test 42"))


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"xref_stream": True, "use_objstm": True, "predictor": True},
        {"compress": False},
        {"encrypt": "rc4-128"},
        {"encrypt": "aes-128"},
        {"encrypt": "aes-256"},
        {"font": "winansi"},
        {"indirect_length": True},
    ],
)
def test_embedded_jpeg_bit_exact(kw):
    jpeg = _jpeg()
    pages = ["text layer stays intact", "page two no image"]
    blob = build_pdf(pages, images=[jpeg, None], **kw)
    # the text layer is unaffected by the image paint operators
    assert extract_pdf_pages(blob) == pages
    imgs = extract_pdf_images(blob)
    assert [len(pg) for pg in imgs] == [1, 0]
    (im,) = imgs[0]
    assert im["data"] == jpeg  # bit-exact round trip
    assert (im["width"], im["height"]) == (128, 64)
    assert im["filter"] == "DCTDecode"
    assert im["colorspace"] == "DeviceGray"
    assert im["name"] == "Im1"


def test_embedded_jpeg_decodes_to_original_raster():
    raster = render_page("DECODE ME")
    jpeg = encode_baseline_jpeg(raster)
    blob = build_pdf([""], images=[jpeg])
    (im,) = extract_pdf_images(blob)[0]
    decoded = parse_jpeg(im["data"])[3][:, :, 0]
    # q=1 grayscale: binarized ink mask survives exactly
    assert np.array_equal(decoded < 128, raster < 128)


def test_jpeg_sof_dims():
    jpeg = _jpeg()
    assert _jpeg_sof_dims(jpeg) == (128, 64)
    with pytest.raises(ValueError, match="not a JPEG"):
        _jpeg_sof_dims(b"\x89PNG")
    with pytest.raises(ValueError, match="no SOF"):
        _jpeg_sof_dims(b"\xff\xd8\xff\xd9")


def test_pages_without_images_list_empty():
    blob = build_pdf(["no images here"])
    assert extract_pdf_images(blob) == [[]]


def test_ocr_roundtrip_goes_through_scanned_pdf():
    """The OCR chain now starts from a real scanned-style PDF: an
    image-only page (no text layer) whose recovered text still matches
    the sanitize identity."""
    assert ocr_roundtrip_one("Scan Me 123!") == "Scan Me 123!"
    assert ocr_roundtrip_one("unicode → becomes ?") == "unicode ? becomes ?"
    assert ocr_roundtrip_one("") == ""
    # and the scanned page itself has NO text layer
    jpeg = encode_baseline_jpeg(render_page("X"))
    blob = build_pdf([""], images=[jpeg])
    assert extract_pdf_pages(blob) == [""]
