"""Golden oracle: straight-line reimplementation of the reference semantics.

This module deliberately does NOT import pdf_extraction_spark.kernel for the
reference-derived paths — it mirrors /root/reference/pdfextraction.py's and
app.py's control flow verbatim-in-logic (loops and all), so kernel bugs can't
hide behind shared code.  The HTML boilerplate strip and span labels are OUR
spec (the reference has no HTML/span concept), so for those the oracle uses
the spec module directly.
"""

from __future__ import annotations

import pandas as pd

PAGE_SEP = "\x0c"


def oracle_direct(page_texts):
    """Mirror of pdfextraction.py:31-49 (F4,F6–F10)."""
    pdf_text = ""
    for text in page_texts:           # :34
        if text:                      # :36
            pdf_text += text + "\n"   # :37

    if pdf_text.strip():              # :42
        pdf_data = {}
        for line in pdf_text.splitlines():   # :44
            line = line.strip()              # :45
            if ":" not in line:              # :46
                continue
            field, value = line.split(":", 1)        # :48
            pdf_data[field.strip()] = value.strip()  # :49
        return pdf_text, list(pdf_data.items())
    return pdf_text, None             # the :64 "no data" warning branch


def oracle_ocr(page_texts):
    """Mirror of pdfextraction.py:70-91 (F7,F8,F11–F13)."""
    extracted_data = []
    for text in page_texts:                    # :72 (per page)
        lines = (text or "").splitlines()      # :74
        page_dict = {}
        current_field = None
        for line in lines:                     # :78
            line = line.strip()                # :79
            if not line:                       # :80
                continue
            if len(line.split()) <= 5 and not any(c.isdigit() for c in line):  # :84
                current_field = line           # :85
                page_dict[current_field] = ""  # :86
            elif current_field:                # :87
                page_dict[current_field] += (  # :88
                    " " + line if page_dict[current_field] else line
                )
        if page_dict:                          # :90
            extracted_data.append(list(page_dict.items()))  # :91
    return extracted_data


def oracle_llm_prompt(page_texts, task):
    """Mirror of app.py:48-72 (F5, F16)."""
    raw_text = ""
    for t in page_texts:              # app.py:50
        raw_text += t or ""           # app.py:52
    return f"Task: {task}\n\nPDF Content:\n{raw_text[:3000]}"  # app.py:72


def oracle_csv_bytes(records) -> bytes:
    """Mirror of pdfextraction.py:52-56 / :94-98 (F14, F15).

    ``records``: list of ordered (field, value) pair-lists (one per row).
    pandas builds the union-of-keys wide frame in first-seen order; the
    ``encoding="utf-8-sig"`` arg is IGNORED when to_csv returns a str, so
    the final bytes are plain UTF-8 with NO BOM (verified, SURVEY §1.1).
    """
    dicts = [dict(r) for r in records]
    df = pd.DataFrame(dicts) if len(dicts) != 1 else pd.DataFrame([dicts[0]])
    return df.to_csv(index=False, encoding="utf-8-sig").encode("utf-8")


def oracle_document(url, html_bytes, text):
    """Golden record for one pages-table row (same shape as the pipeline)."""
    # the SPEC parser (stdlib HTMLParser), deliberately not the fast scanner
    # the pipeline uses — golden equality then cross-checks the two
    from pdf_extraction_spark.html_extract import extract_main_text_spec
    from pdf_extraction_spark.kernel import label_spans  # our spec, shared

    if html_bytes is not None and bytes(html_bytes[:5]) == b"%PDF-":
        # PDF rows: the pipeline must recover the page texts from the PDF
        # BYTES alone; the oracle uses the fixture's golden text layer
        # (never the parser), so equality cross-checks the parser itself
        doc_kind = "pdf"
        pages = (text or "").split(PAGE_SEP)
        extracted_text, fields = oracle_direct(pages)
        page_fields = oracle_ocr(pages)
    elif html_bytes is not None:
        doc_kind = "html"
        extracted_text = extract_main_text_spec(bytes(html_bytes))
        # direct extraction applied to the stripped text itself (no F4
        # re-fold — extract_main_text already terminates blocks with \n)
        fields = _oracle_fields_only(extracted_text)
        page_fields = None
    else:
        pages = (text or "").split(PAGE_SEP)
        extracted_text, fields = oracle_direct(pages)
        page_fields = oracle_ocr(pages)
        doc_kind = "text"
    spans = label_spans(extracted_text, fields)
    return {
        "url": url,
        "doc_kind": doc_kind,
        "extracted_text": extracted_text,
        "fields": fields,
        "page_fields": page_fields,
        "spans": spans,
        "error": None,
    }


def _oracle_fields_only(pdf_text):
    """pdfextraction.py:42-49 applied to an already-assembled text."""
    if not pdf_text.strip():
        return None
    pdf_data = {}
    for line in pdf_text.splitlines():
        line = line.strip()
        if ":" not in line:
            continue
        field, value = line.split(":", 1)
        pdf_data[field.strip()] = value.strip()
    return list(pdf_data.items())
