"""Deterministic synthetic `pages` fixture generator (seed=42).

Schema fixed by BASELINE.json `input_hint`:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Grammar mix (FIXTURES.md §2): each row i is tagged i%4 ->
    0: D (direct Field:Value docs — F6–F10,F14,F15 edge cases)
    1: O (OCR-style header/value docs — F11–F13 edge cases)
    2: H (HTML pages — boilerplate-strip kernel)
    3: L (long multi-page docs — F5/F16 truncate path)

`text` carries the per-page text layer joined by \\x0c (form-feed), so the
F4 page-concat fold is exercised; `html` is non-null only for H rows.
A third of the D and L rows (i%12 in {0,3}) ALSO carry real ``%PDF-``
bytes in `html`, built from the page texts by pdf_parse.build_pdf (xref
table, FlateDecode streams, Tj/TJ/'/hex text ops) — the pipeline must
recover the pages from the BYTES while the oracle reads the text layer,
so golden equality cross-checks the from-scratch PDF parser.
Hosts are Zipf-skewed (a few hosts own ~30% of rows) to exercise salting.

No wall-clock, no unseeded randomness: same args -> bit-identical parquet.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# runnable as `python fixtures/gen.py` (repo root not on sys.path then)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGE_SEP = "\x0c"
EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

_WORDS = (
    "invoice total amount due vendor customer address city state zip "
    "order shipment tracking carrier weight description quantity unit "
    "price subtotal tax notes reference contact phone email status"
).split()

_FIELD_POOL = [
    "Invoice Number", "Date", "Due Date", "Customer Name", "Address",
    "Total Amount", "Tax", "Subtotal", "Payment Terms", "PO Number",
    "Time", "Contact", "Email", "Status", "Notes",
]

# fixed Unicode line boundaries splitlines() must honor (SURVEY §1.1)
_ALT_BOUNDARIES = ["\r\n", "\x0b", "\x85", " ", "\r"]


def _host(rng: random.Random) -> str:
    # Zipf-ish over 20 hosts: weight 1/rank
    r = rng.random()
    acc, total = 0.0, sum(1.0 / k for k in range(1, 21))
    for k in range(1, 21):
        acc += (1.0 / k) / total
        if r <= acc:
            return f"host{k}.example"
    return "host20.example"


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _grammar_d(rng: random.Random, i: int) -> str:
    """Direct Field:Value pages with every F6–F10 edge case."""
    if i % 40 == 0:
        return " \t   "  # whitespace-only document: the F6 no-data branch
    pages = []
    n_pages = 1 + rng.randrange(3)
    for p in range(n_pages):
        if rng.random() < 0.15:
            pages.append("")  # empty page: dropped by `if text:` (F4)
            continue
        lines = []
        for _ in range(2 + rng.randrange(5)):
            roll = rng.random()
            f = rng.choice(_FIELD_POOL)
            if roll < 0.10:
                lines.append(_words(rng, 4))                # no colon: skipped (F8)
            elif roll < 0.18:
                lines.append(f"Time: {rng.randrange(24):02d}:{rng.randrange(60):02d}:{rng.randrange(60):02d}")  # first-colon split (F9)
            elif roll < 0.26:
                lines.append(f"  {f} :  {_words(rng, 3)}  ")  # unicode-ish padding (F8/F9 strip)
            elif roll < 0.32:
                lines.append(f"{f}:")                        # empty value
            elif roll < 0.36:
                lines.append(f": {_words(rng, 2)}")          # empty field name
            else:
                lines.append(f"{f}: {_words(rng, 1 + rng.randrange(4))}")
        if rng.random() < 0.5:
            dup = rng.choice(_FIELD_POOL)
            lines.append(f"{dup}: first-{i}")
            lines.append(f"{dup}: last-{i}")                 # last wins (F10)
        # mix Unicode line boundaries into the page text (F7)
        sep = rng.choice(_ALT_BOUNDARIES) if rng.random() < 0.3 else "\n"
        pages.append(sep.join(lines))
    return PAGE_SEP.join(pages)


def _grammar_o(rng: random.Random, i: int) -> str:
    """OCR-style pages for the F11–F13 state machine."""
    pages = []
    for p in range(1 + rng.randrange(3)):
        lines = []
        if rng.random() < 0.4:
            lines.append(_words(rng, 3))  # value line BEFORE any header: dropped
        n_fields = rng.randrange(4)
        for _ in range(n_fields):
            roll = rng.random()
            if roll < 0.15:
                lines.append("Total Amount ²")     # Unicode digit -> NOT a header (F11)
            elif roll < 0.25:
                lines.append(_words(rng, 6))       # 6 words -> NOT a header
            else:
                lines.append(" ".join(rng.choice(_WORDS).title() for _ in range(1 + rng.randrange(4))))
            for _ in range(rng.randrange(3)):      # multi-line values, space-joined (F12)
                lines.append(_words(rng, 3) + f" {rng.randrange(1000)}")
            if rng.random() < 0.2:
                lines.append("")                   # blank line: skipped (F8)
        pages.append("\n".join(lines))             # may yield empty dict -> page dropped (F13)
    return PAGE_SEP.join(pages)


def _grammar_h(rng: random.Random, i: int) -> bytes:
    """HTML page: link-farm chrome + blocklisted divs + one real article."""
    nav_links = "".join(
        f'<a href="/{w}">{w}</a> ' for w in rng.sample(_WORDS, 6)
    )
    paras = "".join(
        f"<p>{_words(rng, 12 + rng.randrange(20))}.</p>" for _ in range(3)
    )
    kv = "".join(
        f"<p>{rng.choice(_FIELD_POOL)}: {_words(rng, 3)}</p>" for _ in range(3)
    )
    html = (
        "<html><head><title>Doc {i} &amp; Report</title>"
        "<meta charset='utf-8'><link rel='stylesheet' href='x.css'>"
        "<script>var x = 1;</script><style>p {{color: red}}</style></head>"
        "<body><nav>{nav}</nav><header><a href='/'>Home</a> | <a href='/about'>About</a></header>"
        "<div class='sidebar ad'>Buy {w0} now! <a href='/buy'>click</a></div>"
        "<article><h1>Report {i}</h1>{paras}{kv}"
        "<p>Published: 2025-03-{day:02d}</p></article>"
        "<div id='related-posts'><a href='/r1'>r1</a><a href='/r2'>r2</a></div>"
        "<footer><a href='/tos'>Terms</a> <a href='/privacy'>Privacy</a></footer>"
        "</body></html>"
    ).format(i=i, nav=nav_links, w0=rng.choice(_WORDS), paras=paras, kv=kv,
             day=1 + (i % 28))
    return html.encode("utf-8")


def _grammar_l(rng: random.Random, i: int) -> str:
    """Long multi-page doc > 3000 chars for the F5-concat + F16-truncate path."""
    pages = []
    for p in range(4):
        lines = [f"Section {p}: {_words(rng, 4)}"]
        for _ in range(12):
            lines.append(_words(rng, 14))
        pages.append("\n".join(lines))
    return PAGE_SEP.join(pages)


def gen_pages(n_rows: int, seed: int = 42) -> pa.Table:
    rng = random.Random(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    langs_cycle = ["en", "de", "fr", "es", "zh"]
    from pdf_extraction_spark.pdf_parse import build_pdf

    for i in range(n_rows):
        kind = i % 4
        host = _host(rng)
        as_pdf = i % 12 in (0, 3)  # a third of the D and L rows
        kind_name = ["direct", "ocr", "html", "long"][kind]
        if as_pdf and kind in (0, 3):
            kind_name = "pdf-" + kind_name
        urls.append(f"https://{host}/{kind_name}/{i}")
        tss.append(EPOCH + dt.timedelta(seconds=17 * i))
        if kind == 2:
            htmls.append(_grammar_h(rng, i))
            texts.append(None)
        else:
            text = (
                _grammar_d(rng, i) if kind == 0
                else _grammar_o(rng, i) if kind == 1
                else _grammar_l(rng, i)
            )
            if as_pdf and kind in (0, 3):
                # real PDF bytes built from the page texts; the text
                # layer stays as the oracle's golden — the kernel must
                # recover it from the bytes alone
                htmls.append(
                    build_pdf(
                        text.split(PAGE_SEP),
                        compress=i % 24 != 12,       # one raw-stream variant
                        indirect_length=i % 24 == 0,  # forward /Length refs
                    )
                )
            else:
                htmls.append(None)
            texts.append(text)
        langs.append(langs_cycle[i % 5])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(path: str, n_rows: int, seed: int = 42, row_group_size: int = 1000) -> None:
    pq.write_table(gen_pages(n_rows, seed), path, row_group_size=row_group_size)


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/pages_unit.parquet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    write_pages(out, n)
    print(f"wrote {n} rows -> {out}")
