"""Universal document-text dispatch: sniff the content type from magic
bytes and route each blob to the matching in-repo extractor, in ONE
Arrow-batched pass.

A real crawl/archive corpus is mixed — a tar of court records holds
PDFs next to DOCX next to HTML next to plain text — and the operator a
100 TB ingest runs first is exactly this: classify by LEADING BYTES
(never by filename, which lies) and extract accordingly.  Generalizes
the reference's single-format assumption (`pdfextraction.py` takes only
PDFs) to the mixed corpus the rest of this engine's sources produce.

Dispatch table (first match wins):

  %PDF-            -> pdf_parse.extract_pdf_pages (text layer, fonts,
                      encryption — the full round-5 parser); when the
                      text layer is EMPTY and the pages carry image
                      XObjects, the scanned-PDF OCR fallback runs
                      (doc_type "pdf_scanned": decode DCTDecode/
                      CCITTFaxDecode images, template OCR — the
                      reference's no-text-layer dataflow, honest scope
                      in _ocr_scanned_pdf)
  PK\\x03\\x04     -> DOCX vs EPUB disambiguated by package content
                      (word/document.xml vs META-INF/container.xml);
                      other zips -> type "zip", no text
  <, \\s*<         -> html_extract.extract_main_text
  PNG/GIF/JPEG/BMP/TIFF/ICO/RIFF magic -> typed, no text (decode is a
                      separate, deliberate step — see multimodal ops)
  valid UTF-8      -> plain text as-is
  anything else    -> type "binary", no text

Per-document containment (F18): an extractor raising on one blob yields
(doc_type="error", text=NULL, error=<message>) for that row only.

Scale shape: scan -> rebalance_if_undersplit -> MapInPandas -> project;
no shuffle on well-split inputs, embarrassingly parallel.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from pdf_extraction_spark.operators.balance import rebalance_if_undersplit

_IMAGE_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"BM", "bmp"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"\x00\x00\x01\x00", "ico"),
    (b"ID3", "mp3"),
]


_UNICODE_BOMS = (  # UTF-32 first: its LE BOM starts with the UTF-16 LE BOM
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)
_C0_GARBAGE = frozenset(range(0x20)) - {0x09, 0x0A, 0x0C, 0x0D}


def decode_bom_text(raw: bytes) -> str | None:
    """The text behind a Unicode byte-order mark, or None when there is
    no BOM, the decode fails, or the decoded content carries C0 control
    garbage (a real text file doesn't; a binary that happens to start
    with BOM bytes usually does)."""
    for bom, enc in _UNICODE_BOMS:
        if raw.startswith(bom):
            try:
                text = raw[len(bom) :].decode(enc)
            except UnicodeDecodeError:
                return None
            if any(ord(c) in _C0_GARBAGE for c in text):
                return None
            return text
    return None


def sniff_doc_type(raw: bytes) -> str:
    """Content type from leading bytes; zip containers are refined to
    docx/epub by their package layout."""
    if raw[:5] == b"%PDF-":
        return "pdf"
    if raw[:4] == b"PK\x03\x04":
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(raw)) as z:
                names = set(z.namelist())
                mime = z.read("mimetype") if "mimetype" in names else b""
        except Exception:
            return "zip"
        if "word/document.xml" in names:
            return "docx"
        if "xl/workbook.xml" in names:
            return "xlsx"
        if "ppt/presentation.xml" in names:
            return "pptx"
        if "META-INF/container.xml" in names:
            return "epub"
        if mime == b"application/vnd.oasis.opendocument.text":
            return "odt"
        return "zip"
    for magic, t in _IMAGE_MAGIC:
        if raw[: len(magic)] == magic:
            return t
    if raw[:4] == b"RIFF":
        return "wav" if raw[8:12] == b"WAVE" else "riff"
    if raw[4:8] == b"ftyp":  # ISO-BMFF: box size then 'ftyp'
        return "mp4"
    if len(raw) >= 2 and raw[0] == 0xFF and (raw[1] & 0xFE) == 0xFA:
        return "mp3"  # bare MPEG-1 Layer III frame sync (no ID3 tag);
        # deliberately narrow — a loose 11-bit sync test would claim
        # UTF-16 BOMs and arbitrary high-byte binaries
    if raw[:5] == b"{\\rtf":
        return "rtf"
    bom_text = decode_bom_text(raw)
    if bom_text is not None:
        return "html" if bom_text.lstrip()[:1] == "<" else "text"
    stripped = raw.lstrip()[:16].lower()
    if stripped[:1] == b"<":
        # markup-leading blobs route through the HTML kernel (which also
        # copes with XML-ish and fragment inputs)
        return "html"
    if b"\x00" in raw[:8192]:
        return "binary"  # the standard NUL heuristic (what git uses)
    try:
        raw.decode("utf-8")
        return "text"
    except UnicodeDecodeError:
        return "binary"


def _ocr_pdf_pages(raw: bytes) -> list[str | None]:
    """Per-page OCR for scanned PDF pages — the reference's scanned-page
    dataflow (pdfextraction.py:16,72-73 rasterizes and OCRs pages with
    no text layer, PAGE BY PAGE).  Decodes each page's embedded images
    (DCTDecode via the in-repo JPEG codec, CCITTFaxDecode across the
    full /K range via the T.4/T.6 codecs) and runs the template OCR;
    returns one recovered string (or None) per page, so the caller can
    merge text-layer pages with OCR'd scanned pages in a mixed
    document.  HONEST SCOPE (same contract as operators/ocr.py): the
    template matcher recognizes the repo's own 8x8 bitmap font on the
    128x64 page grid — the full render->compress->embed->decode->
    recognize dataflow over documents this engine produced; general OCR
    of arbitrary scans remains env-blocked (no tesseract).  Off-grid or
    undecodable images are skipped."""
    import numpy as np

    from pdf_extraction_spark.operators.ccitt import decode_ccitt_pdf_image
    from pdf_extraction_spark.operators.jpeg import parse_jpeg
    from pdf_extraction_spark.operators.ocr import ocr_page
    from pdf_extraction_spark.pdf_parse import extract_pdf_images

    out: list[str | None] = []
    for page in extract_pdf_images(raw):
        texts = []
        for im in page:
            gray = None
            if im["filter"] == "DCTDecode":
                decoded = parse_jpeg(im["data"])
                if decoded is not None:
                    gray = decoded[3][:, :, 0]
            elif im["filter"] == "CCITTFaxDecode":
                try:
                    rows = decode_ccitt_pdf_image(im["data"], im["decode_parms"])
                except ValueError:
                    rows = None
                if rows:
                    # the codec returns semantic ink=1 regardless of
                    # /BlackIs1 (which only maps OUTPUT bit values)
                    gray = np.where(
                        np.frombuffer(b"".join(rows), np.uint8).reshape(
                            len(rows), -1
                        ),
                        0,
                        255,
                    ).astype(np.uint8)
            if gray is not None and gray.shape == (64, 128):  # the template grid
                t = ocr_page(gray)
                if t:
                    texts.append(t)
        out.append("\n".join(texts) if texts else None)
    return out


_MAX_GZ_DEPTH = 3  # a.txt.gz.gz is real; unbounded nesting is a zip bomb
_MAX_GZ_BYTES = 256 << 20  # cap decompressed size per member (bomb guard)


def _unwrap_compressed(raw: bytes) -> tuple[str, bytes] | None:
    """(suffix, decompressed) when the blob is a stdlib-decodable
    compressed member — gzip, bzip2 (Wikipedia dumps), or xz — else
    None.  Decompression is size-capped (bomb guard); bad framing
    returns None so the caller treats the blob as opaque binary."""
    import io

    if raw[:2] == b"\x1f\x8b":
        import gzip

        opener, suffix = (lambda: gzip.GzipFile(fileobj=io.BytesIO(raw))), "gz"
    elif raw[:3] == b"BZh" and len(raw) > 4 and raw[3:4].isdigit():
        import bz2

        opener, suffix = (lambda: bz2.BZ2File(io.BytesIO(raw))), "bz2"
    elif raw[:6] == b"\xfd7zXZ\x00":
        import lzma

        opener, suffix = (lambda: lzma.LZMAFile(io.BytesIO(raw))), "xz"
    else:
        return None
    try:
        with opener() as f:
            inner = f.read(_MAX_GZ_BYTES + 1)
        if len(inner) > _MAX_GZ_BYTES:
            raise ValueError(f"{suffix} member exceeds the decompressed-size cap")
    except ValueError:
        raise
    except Exception:
        return None  # bad framing: opaque bytes
    return suffix, inner


def extract_any(raw: bytes, _depth: int = 0) -> tuple[str, str | None]:
    """(doc_type, extracted_text_or_None) for one blob.  Compressed
    members (crawl dumps ship .txt.gz/.html.gz/.json.gz everywhere;
    Wikipedia dumps ship .bz2; log archives ship .xz) decompress
    transparently and re-dispatch, bounded by depth and size guards;
    the reported type is "<inner>.<suffix>" so provenance stays
    visible."""
    if _depth < _MAX_GZ_DEPTH:
        unwrapped = _unwrap_compressed(raw)
        if unwrapped is not None:
            suffix, inner = unwrapped
            t, text = extract_any(inner, _depth + 1)
            return f"{t}.{suffix}", text
        # compression magic with bad framing falls through to the sniffer,
        # which types such bytes "binary" (invalid UTF-8 / NUL heuristic)
    bom_text = decode_bom_text(raw)
    if bom_text is not None:
        # UTF-16/UTF-32/BOM'd-UTF-8 member: transcode once and dispatch
        # the UTF-8 form, so markup routing and JSON refinement see the
        # same bytes they would from an ASCII-compatible file
        raw = bom_text.encode("utf-8")
    t = sniff_doc_type(raw)
    if t == "pdf":
        from pdf_extraction_spark.pdf_parse import extract_pdf_pages

        pages = extract_pdf_pages(raw)
        if all(p.strip() for p in pages):  # full text layer: no OCR pass
            return t, "\n".join(pages)
        # mixed or image-only document: OCR exactly the textless pages
        # (the reference's per-page fallback, pdfextraction.py:72-73)
        ocr_pages = _ocr_pdf_pages(raw)
        used_ocr = False
        merged = []
        for i, p in enumerate(pages):
            if not p.strip() and i < len(ocr_pages) and ocr_pages[i]:
                merged.append(ocr_pages[i])
                used_ocr = True
            else:
                merged.append(p)
        return ("pdf_scanned" if used_ocr else t), "\n".join(merged)
    if t == "docx":
        from pdf_extraction_spark.operators.docx_text import (
            extract_docx_paragraphs,
        )

        paras = extract_docx_paragraphs(raw)
        return t, None if paras is None else "\n".join(paras)
    if t == "xlsx":
        from pdf_extraction_spark.operators.xlsx_text import extract_xlsx_rows

        rows = extract_xlsx_rows(raw)
        return t, None if rows is None else "\n".join(
            "\t".join(row) for row in rows
        )
    if t == "pptx":
        from pdf_extraction_spark.operators.pptx_text import extract_pptx_slides

        slides = extract_pptx_slides(raw)
        return t, None if slides is None else "\n".join(slides)
    if t == "odt":
        from pdf_extraction_spark.operators.odt_text import extract_odt_paragraphs

        paras = extract_odt_paragraphs(raw)
        return t, None if paras is None else "\n".join(paras)
    if t == "epub":
        from pdf_extraction_spark.operators.epub_text import (
            extract_epub_chapters,
        )

        chaps = extract_epub_chapters(raw)
        return t, None if chaps is None else "\n".join(chaps)
    if t == "rtf":
        from pdf_extraction_spark.operators.rtf_text import extract_rtf_paragraphs

        paras = extract_rtf_paragraphs(raw)
        return t, None if paras is None else "\n".join(paras)
    if t == "html":
        from pdf_extraction_spark.html_extract import extract_main_text

        return t, extract_main_text(raw)
    if t == "text":
        text = raw.decode("utf-8")
        refined = _refine_json(text)
        if refined is not None:
            return refined
        return t, text
    return t, None


_JSON_TEXT_FIELDS = ("text", "content", "body")  # the crawl-corpus convention


def _refine_json(text: str) -> tuple[str, str | None] | None:
    """Refine a UTF-8 blob that is actually JSON/JSONL — the member
    type crawl corpora carry most after HTML.  A blob where EVERY
    non-empty line parses as a JSON object is "jsonl" (its text = the
    conventional text field of each line, joined); a single JSON
    object/array is "json".  Anything that does not fully parse stays
    plain text (returns None)."""
    stripped = text.lstrip()
    if not stripped or stripped[0] not in "{[":
        return None
    import json

    lines = [ln for ln in text.splitlines() if ln.strip()]
    if stripped[0] == "{" and len(lines) > 1:
        objs = []
        for ln in lines:
            try:
                o = json.loads(ln)
            except ValueError:
                objs = None
                break
            if not isinstance(o, dict):
                objs = None
                break
            objs.append(o)
        if objs is not None:
            parts = []
            for o in objs:
                for f in _JSON_TEXT_FIELDS:
                    if isinstance(o.get(f), str):
                        parts.append(o[f])
                        break
            return "jsonl", "\n".join(parts) if parts else None
    try:
        o = json.loads(text)
    except ValueError:
        return None
    if isinstance(o, dict):
        for f in _JSON_TEXT_FIELDS:
            if isinstance(o.get(f), str):
                return "json", o[f]
    return "json", None


ANY_TEXT_SCHEMA = "doc_id long, doc_type string, text string, error string"


def extract_any_text(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    *,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(doc_id, [passthrough...], doc_type, text, error) for a mixed
    binary-document corpus — the sniff-and-dispatch pass described in
    the module docstring, with per-document error containment.

    ``passthrough`` columns ride through the kernel unchanged (strings),
    so provenance needs no join-back — a join against the input would
    re-scan the corpus and shuffle both sides; at 100 TB that doubles
    the job."""
    extra = list(passthrough or [])

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": []}
            for c in extra:
                out[c] = []
            out.update({"doc_type": [], "text": [], "error": []})
            for i, (doc_id, raw) in enumerate(zip(pdf[id_col], pdf[content_col])):
                try:
                    t, text = extract_any(bytes(raw))
                    err = None
                except Exception as exc:  # containment: one bad doc != job
                    t, text, err = "error", None, f"{type(exc).__name__}: {exc}"
                out["doc_id"].append(int(doc_id))
                for c in extra:
                    out[c].append(pdf[c].iloc[i])
                out["doc_type"].append(t)
                out["text"].append(text)
                out["error"].append(err)
            yield pd.DataFrame(out)

    schema = "doc_id long, " + "".join(f"{c} string, " for c in extra) + (
        "doc_type string, text string, error string"
    )
    src = rebalance_if_undersplit(df.select(id_col, *extra, content_col))
    return src.mapInPandas(_batches, schema=schema)
