"""Differential test: the fast HTML scanner must be byte-identical to the
stdlib-HTMLParser spec implementation on every input we can throw at it.

Three layers:
  1. the deterministic fixture corpus (what the golden suite uses),
  2. hand-written adversarial cases for every branch the scanner mirrors,
  3. a seeded fuzzer composing random well-formed AND malformed fragments.
"""

from __future__ import annotations

import random

from pdf_extraction_spark.html_extract import (
    _fast_scan,
    extract_main_text,
    extract_main_text_spec,
)


def _both(html: str) -> tuple[str, str]:
    b = html.encode("utf-8", errors="surrogatepass")
    return extract_main_text(b), extract_main_text_spec(b)


def test_interpreter_is_validated_for_fast_scanner():
    """The fast scanner mirrors CPython html/parser.py internals, which
    may drift between interpreter versions.  On a new interpreter this
    test fails FIRST and loudly: re-run this differential suite plus
    tests/test_html_property.py on the new version, then add it to
    html_extract.VALIDATED_PYTHON.  Until the pin is extended,
    extract_main_text routes every document through the spec parser (so
    production stays correct, just slower) — and the `_both` comparisons
    in this file would be vacuous, which is why this assertion gates the
    whole suite."""
    import sys

    from pdf_extraction_spark.html_extract import (
        _FAST_SCANNER_VALIDATED,
        VALIDATED_PYTHON,
    )

    assert sys.version_info[:2] in VALIDATED_PYTHON and _FAST_SCANNER_VALIDATED, (
        f"Python {sys.version_info[:2]} is not in VALIDATED_PYTHON "
        f"{VALIDATED_PYTHON}: re-run the HTML differential suites on this "
        "interpreter and extend the pin in pdf_extraction_spark/html_extract.py"
    )


ADVERSARIAL = [
    "",
    "plain text only, no tags at all",
    "<p>basic</p>",
    "<P>UPPER</P><DiV>mixed</dIv>",
    "<p>a &amp; b &lt;c&gt; &#65; &#x42; &unknown; &</p>",
    "<p>entity at end &amp;</p>",
    "text tail with cut entity &am",          # held-back tail (amppos rule)
    "text tail with terminated ent &amp; x",
    "<p>unterminated <b",                      # incomplete start tag at EOF
    "<p>stray < 3 less-than</p>",              # '<' + non-letter = data
    "<p>trailing lone <",
    "<p>self close <br/> there</p>",
    "<div/>ignored self-close<p>x</p>",        # non-br startendtag = no-op
    "<!-- comment --><p>after</p>",
    "<!-- unterminated comment <p>swallowed</p>",
    "<!DOCTYPE html><p>doc</p>",
    "<!doctype html\n more ><p>d2</p>",
    "<?php instr ?><p>pi</p>",
    "<? unterminated",
    "<!bogus declaration><p>bd</p>",
    "<!bogus unterminated",
    "</>empty endtag<p>x</p>",
    "</3bogus>bogus end<p>y</p>",
    "</ div>spaced endtag",
    "<p>one</p></div attr=junk>two<p>three</p>",
    "<script>var a = '<p>not a tag</p>';</script><p>after script</p>",
    "<script>unterminated cdata <p>gone</p>",
    "<style>p { color: red; }</style><p>styled</p>",
    "<SCRIPT>x</ScRiPt><p>case cdata</p>",
    "<script></ script ><p>spaced cdata close</p>",
    "<script>a</scriptx></script><p>tricky close</p>",
    '<div class="sidebar">dropped</div><p>kept</p>',
    "<div class='ads'>dropped2</div><p>kept2</p>",
    '<div class="a&amp;sidebar">entity in class</div><p>k3</p>',
    '<div id="promo-x">dropped3</div><p>k4</p>',
    '<nav><title>nested dropped title</title></nav><title>real</title><p>b</p>',
    "<a href='/x'>link text here</a><p>some long paragraph content here ok</p>",
    "<p><a href=x>nested anchor</a> plus twenty-five characters more</p>",
    "<h1>Head: ing</h1><p>b</p>",
    "<p attr>bare attr</p>",
    "<p a=1 b='2' c=\"3\">attrs</p>",
    "<p a = 1 >spaced eq</p>",
    '<p foo="x"bar=1>glued attrs</p>',
    "<p =weird>weird attr</p>",
    '<p foo="unterminated>quote</p>',
    "<p/ >odd slash</p>",
    "<p / >odd slash 2</p>",
    "<title>The Title</title><p>body text</p>",
    "<title>unterminated title <p>rest",
    "<title></title><p>empty title</p>",
    "<td>cell: value</td><tr>row</tr>",
    "<ul><li>item one</li><li>item: two</li></ul>",
    "<div\x00weird>nul in tag</div>",
    "<p>\x0c form feed   ls \xa0 nbsp</p>",
    "<p>unicode digits ٣ and ² ok</p>",
    "<br>bare void<br>flush",
    "<p>deeply<div>nested<span>spans</span>kept</div>ok</p>",
    "</unopened>just end tags</p>",
    "<a>link only</a>",
    "<a>x</a><a>y</a>short",
]


def test_adversarial_cases():
    for html in ADVERSARIAL:
        fast, spec = _both(html)
        assert fast == spec, f"mismatch on {html!r}:\n fast={fast!r}\n spec={spec!r}"


def test_marked_section_falls_back():
    # scanner delegates <![ ... ]> to the spec parser (returns None)
    src = "<![CDATA[x]]><p>after marked</p>"
    assert _fast_scan(src) is None
    fast, spec = _both(src)
    assert fast == spec


def test_fixture_corpus_identical():
    from fixtures.gen import gen_pages

    tbl = gen_pages(400, seed=42)
    n_html = 0
    for row in tbl.to_pylist():
        if row["html"] is not None:
            n_html += 1
            b = bytes(row["html"])
            assert extract_main_text(b) == extract_main_text_spec(b), row["url"]
    assert n_html >= 90  # the fixture grammar emits ~1/4 html docs


_WORDS = "alpha beta: gamma delta & epsilon <tag> zeta eta theta".split()
_TAGS = ["p", "div", "span", "a", "h2", "li", "nav", "script", "style",
         "title", "br", "table", "td", "em", "B", "Article"]
_CLASSES = ["content", "sidebar", "ads", "main article", "x&amp;y", ""]


def _rand_fragment(rng: random.Random, depth: int) -> str:
    r = rng.random()
    if r < 0.35 or depth > 4:
        return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 12)))
    if r < 0.45:
        return rng.choice([
            "<!-- c -->", "<!DOCTYPE html>", "<?pi ?>", "</>", "</ x>",
            "&amp;", "&#65;", "&bogus;", "< ", "<", "</bogus junk>",
            "<br/>", "<br>", "<x/>",
        ])
    tag = rng.choice(_TAGS)
    attrs = ""
    if rng.random() < 0.4:
        cls = rng.choice(_CLASSES)
        q = rng.choice(['"', "'", ""])
        attrs = f" class={q}{cls}{q}" if (q or " " not in cls) else f' class="{cls}"'
    if rng.random() < 0.2:
        attrs += rng.choice([" data-x", " a=1", " b = 2", ' c="3"d=4'])
    inner = "".join(_rand_fragment(rng, depth + 1) for _ in range(rng.randint(0, 3)))
    if rng.random() < 0.1:
        return f"<{tag}{attrs}>{inner}"  # unclosed
    return f"<{tag}{attrs}>{inner}</{tag}>"


def test_fuzz_equivalence():
    rng = random.Random(20260817)
    for case in range(1500):
        html = "".join(_rand_fragment(rng, 0) for _ in range(rng.randint(1, 8)))
        fast, spec = _both(html)
        assert fast == spec, (
            f"fuzz case {case} mismatch:\n html={html!r}\n fast={fast!r}\n spec={spec!r}"
        )


def test_charset_detection():
    from pdf_extraction_spark.html_extract import detect_charset

    latin = '<meta charset="iso-8859-1"><p>caf\xe9 content here: ok</p>'.encode(
        "iso-8859-1"
    )
    assert detect_charset(latin) == "iso-8859-1"
    fast, spec = (
        extract_main_text(latin),
        extract_main_text_spec(latin),
    )
    assert fast == spec and "café" in fast

    meta_ct = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">'
        b"<p>euro \x80 sign block: kept</p>"
    )
    assert detect_charset(meta_ct) == "windows-1252"
    assert "€" in extract_main_text(meta_ct)
    assert extract_main_text(meta_ct) == extract_main_text_spec(meta_ct)

    bom = "﻿<p>bom page content: kept</p>".encode("utf-8-sig")
    # utf-8-sig BOM detected -> the BOM char must not leak into the text
    assert detect_charset(bom) == "utf-8-sig"
    out = extract_main_text(bom)
    assert out == extract_main_text_spec(bom) and "﻿" not in out

    # BOM'd UTF-16: the 'utf-16' codec consumes the BOM, so U+FEFF must not
    # leak into the first block (utf-16-le/-be codecs would keep it)
    u16 = "<p>utf sixteen page text: kept</p>".encode("utf-16-le")
    assert detect_charset(b"\xff\xfe" + u16) == "utf-16"
    out16 = extract_main_text(b"\xff\xfe" + u16)
    assert out16 == extract_main_text_spec(b"\xff\xfe" + u16)
    assert "﻿" not in out16 and "utf sixteen page text: kept" in out16
    be = "<p>big endian page text: kept</p>".encode("utf-16-be")
    assert detect_charset(b"\xfe\xff" + be) == "utf-16"
    assert "big endian page text: kept" in extract_main_text(b"\xfe\xff" + be)

    bogus = b'<meta charset="no-such-codec"><p>fallback block: kept</p>'
    assert detect_charset(bogus) is None
    assert extract_main_text(bogus) == extract_main_text_spec(bogus)

    assert detect_charset(b"<p>plain</p>") is None


def test_charset_prescan_hardening():
    """HTML5-prescan edge cases from crawl data (ADVICE round 1)."""
    from pdf_extraction_spark.html_extract import detect_charset

    # a mis-declared utf-16 <meta> on an ASCII/UTF-8 body: the readable
    # meta itself proves the body is not utf-16 -> remap to utf-8
    lying = b"<meta charset=utf-16><p>real utf-8 body stays readable: kept</p>"
    assert detect_charset(lying) == "utf-8"
    out = extract_main_text(lying)
    assert out == extract_main_text_spec(lying)
    assert "real utf-8 body stays readable: kept" in out
    for variant in (b"utf-16le", b"UTF-16BE", b"utf16"):
        assert detect_charset(b'<meta charset="' + variant + b'">') == "utf-8"

    # 'charset=' outside a <meta> tag (URLs, scripts, comments) is ignored
    url = (
        b'<a href="/page?charset=koi8-r">link text</a>'
        b"<p>body long enough to keep as a block yes</p>"
    )
    assert detect_charset(url) is None
    comment = b"<!-- charset=koi8-r --><p>commented decl ignored block: kept</p>"
    assert detect_charset(comment) is None
    script = (
        b'<script>var u="x?charset=koi8-r";</script>'
        b"<p>script decl ignored block here: kept</p>"
    )
    assert detect_charset(script) is None

    # ...but both <meta charset=X> and http-equiv content forms still work
    assert detect_charset(b'<meta charset="koi8-r">') == "koi8-r"
    assert (
        detect_charset(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=koi8-r">'
        )
        == "koi8-r"
    )


def test_interpreter_pin_for_scanner_spec():
    """The fast scanner hand-mirrors CPython 3.11 html.parser internals;
    tolerant-parsing behavior changed in 3.12/3.13 security releases.  On
    an interpreter bump: re-run test_html_fast + test_html_property on the
    new interpreter, reconcile any divergence, then move this pin."""
    import sys

    assert sys.version_info[:2] == (3, 11), (
        "html_extract fast scanner is validated against CPython 3.11's "
        "html.parser; re-run the differential suites on this interpreter "
        "and update the pin"
    )
