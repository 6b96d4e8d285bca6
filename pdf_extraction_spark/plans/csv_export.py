"""Small-scale CSV export reproducing the reference's download bytes.

F14 (union-of-keys pivot, first-seen column order, NaN -> empty cell) and
F15 (UTF-8, NO BOM — pandas ignores encoding="utf-8-sig" when to_csv
returns a str; verified on pandas 2.2.2).  [pdfextraction.py:52-56,94-98]

At 10^12-doc scale a union-of-all-field-names wide schema is unbounded, so
the engine keeps the long `fields` array as the authoritative output
(SURVEY §1.4); this module is the *edge export* for result sets small
enough to collect — exactly the regime the reference operates in.
"""

from __future__ import annotations

import pandas as pd


def records_to_csv_bytes(records) -> bytes:
    """records: iterable of ordered (field, value) pair lists, one per row.

    Column order = first occurrence across rows in order (Python dict /
    pandas union semantics); duplicate keys inside one record were already
    resolved last-wins upstream (F10/F12).
    """
    dicts = [dict(r) for r in records]
    df = pd.DataFrame(dicts)
    return df.to_csv(index=False, encoding="utf-8-sig").encode("utf-8")


def export_direct_csv(extractions_df, urls=None) -> dict[str, bytes]:
    """Per-document 'Direct PDF Extraction' CSV (one row per document).

    [pdfextraction.py:52-62] — the reference emits one CSV per uploaded
    file; we return {url: csv_bytes} for each collected document that has
    a non-empty fields list (the `if pdf_data` gate, pdfextraction.py:51).
    """
    rows = extractions_df.select("url", "fields").collect()
    if urls is not None:
        urls = set(urls)
    out = {}
    for r in rows:
        if urls is not None and r["url"] not in urls:
            continue
        if r["fields"]:
            pairs = [(p["field"], p["value"]) for p in r["fields"]]
            out[r["url"]] = records_to_csv_bytes([pairs])
    return out


def export_ocr_csv(extractions_df, urls=None) -> dict[str, bytes]:
    """Per-document 'Table Extraction (OCR)' CSV (one row per kept page).

    [pdfextraction.py:93-104] — union-of-keys across the document's page
    dicts, first-seen order, missing cells empty.
    """
    rows = extractions_df.select("url", "page_fields").collect()
    if urls is not None:
        urls = set(urls)
    out = {}
    for r in rows:
        if urls is not None and r["url"] not in urls:
            continue
        if r["page_fields"]:
            records = [
                [(p["field"], p["value"]) for p in page] for page in r["page_fields"]
            ]
            out[r["url"]] = records_to_csv_bytes(records)
    return out
