"""Pure-Python HTML main-content extraction (boilerplate strip).

The reference has no HTML path; this implements the north-star extension
(BASELINE.json `north_star`): a readability-style block accumulator with
text-density / link-density scoring and a tag/class blocklist, written
from scratch on the stdlib ``html.parser`` (lxml is not available in this
environment, and determinism matters more than parser leniency).

The algorithm is a deterministic spec — the golden oracle uses this same
module, and every decision below uses integer arithmetic so results are
stable across platforms:

1. Tokenize with ``HTMLParser`` (convert_charrefs=True — entities decoded).
2. Hard-drop subtrees of non-content tags (script/style/nav/...) and of any
   element whose class/id matches the blocklist regex.
3. Split text into blocks at block-level tag boundaries; within a block,
   collapse whitespace runs to single spaces and strip.
4. Score each block: ``link_chars`` = chars emitted while inside <a>.
   Keep a block iff  3 * link_chars <= total_chars  (link density <= 1/3)
   AND (len >= 25 or it contains a ':' or it came from a heading/title).
5. ``extracted_text`` = title block (if any) then kept blocks in document
   order, each followed by "\\n" (mirrors the F4 trailing-newline fold).
"""

from __future__ import annotations

import re
import sys
from html.parser import HTMLParser

# The fast scanner below mirrors observable branches of CPython's
# html/parser.py — behavior that may drift between interpreter versions.
# Interpreters on which the differential suites (tests/test_html_fast.py,
# tests/test_html_property.py) have proven scanner == HTMLParser:
VALIDATED_PYTHON = ((3, 11),)
# On any other interpreter extract_main_text routes through the spec
# parser (stdlib HTMLParser — correct by construction, ~3x slower) until
# the differential suites are re-run and the version added above.
_FAST_SCANNER_VALIDATED = sys.version_info[:2] in VALIDATED_PYTHON

# NB: void tags (meta, link, br, img, hr, input) must never enter the drop
# stack — they have no end tag and would swallow the rest of the document.
DROP_TAGS = frozenset(
    "script style nav header footer aside noscript form iframe svg button "
    "select option template".split()
)
BLOCK_TAGS = frozenset(
    "p div article section li h1 h2 h3 h4 h5 h6 td th tr table ul ol "
    "blockquote pre br main body figure figcaption dl dt dd".split()
)
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6 title".split())
_BLOCKLIST_RE = re.compile(
    r"(?:^|[\s_-])(?:ads?|advert\w*|sidebar|banner|promo|cookie|share|social"
    r"|comments?|related|breadcrumbs?|menu|popup|widget|sponsor\w*)(?:$|[\s_-])",
    re.IGNORECASE,
)
_WS_RE = re.compile(r"\s+")


def _blocklisted(attrs) -> bool:
    for name, val in attrs:
        if name in ("class", "id") and val and _BLOCKLIST_RE.search(val):
            return True
    return False


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool]] = []  # (text, link_chars, heading)
        self._buf: list[str] = []
        self._link_chars = 0
        self._heading = False
        self._drop_stack: list[str] = []  # tags whose subtree is dropped
        self._a_depth = 0
        self._in_title = False
        self.title: str | None = None
        self._title_buf: list[str] = []

    # -- block management ---------------------------------------------------
    def _flush(self):
        raw = "".join(self._buf)
        text = _WS_RE.sub(" ", raw).strip()
        if text:
            self.blocks.append((text, self._link_chars, self._heading))
        self._buf = []
        self._link_chars = 0
        self._heading = False

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if self._drop_stack:
            # inside a dropped subtree: only track nesting of the drop tag
            self._drop_stack.append(tag)
            return
        if tag in DROP_TAGS or _blocklisted(attrs):
            self._flush()
            self._drop_stack.append(tag)
            return
        if tag == "title":
            self._flush()
            self._in_title = True
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in HEADING_TAGS:
                self._heading = True

    def handle_startendtag(self, tag, attrs):
        if tag == "br" and not self._drop_stack:
            self._flush()

    def handle_endtag(self, tag):
        if self._drop_stack:
            # pop matching nested tags; tolerate imbalance deterministically
            for i in range(len(self._drop_stack) - 1, -1, -1):
                if self._drop_stack[i] == tag:
                    del self._drop_stack[i:]
                    break
            return
        if tag == "title":
            if self._in_title:
                t = _WS_RE.sub(" ", "".join(self._title_buf)).strip()
                self.title = t or None
                self._in_title = False
                self._title_buf = []
            return
        if tag == "a" and self._a_depth:
            self._a_depth -= 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_stack:
            return
        if self._in_title:
            self._title_buf.append(data)
            return
        self._buf.append(data)
        stripped_len = len(_WS_RE.sub(" ", data).strip())
        if self._a_depth:
            self._link_chars += stripped_len


# ---------------------------------------------------------------------------
# Fast scanner: replicates the OBSERVABLE behavior of stdlib HTMLParser
# (convert_charrefs=True, no close()) for the event subset _Extractor
# consumes, without the per-character dispatch machinery.  Every branch
# below mirrors a branch of html/parser.py's goahead/parse_* (Python
# 3.11.7); tests/test_html_fast.py holds the two implementations equal.
# ---------------------------------------------------------------------------

from html import unescape as _unescape

_SIMPLE_OPEN = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)>")
_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND = re.compile(
    r"((?<=[\'\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"(\'[^\']*\'|\"[^\"]*\"|(?![\'\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_LOCATE_START = re.compile(
    r"<[a-zA-Z][^\t\n\r\f />\x00]*"
    r"(?:[\s/]*(?:(?<=['\"\s/])[^\s/>][^\s/=>]*"
    r"(?:\s*=+\s*(?:'[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*)\s*)?(?:\s|/(?!>))*)*)?"
    r"\s*"
)
_ENDTAGFIND = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENT_CLOSE = re.compile(r"--\s*>")
_SPACE_SEMI = re.compile(r"[\s;]")
_CDATA_END = {
    elem: re.compile(r"</\s*%s\s*>" % elem, re.IGNORECASE)
    for elem in ("script", "style")
}
_ASCII_LETTERS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_BOGUS_NEXT = _ASCII_LETTERS | set("=/")


def _fast_scan(src: str):
    """Scan ``src``; returns (title, blocks) or None to request the spec
    fallback (input uses a construct the scanner does not replicate)."""
    n = len(src)
    i = 0
    blocks: list[tuple[str, int, bool]] = []
    buf: list[str] = []
    link_chars = 0
    heading = False
    drop: list[str] = []
    a_depth = 0
    in_title = False
    title = None
    title_buf: list[str] = []
    cdata = None  # active CDATA element name (script/style) or None

    # `" ".join(s.split())` == `_WS_RE.sub(" ", s).strip()` — verified
    # exhaustively: re \s and str.isspace agree on every code point, so the
    # split/join form (no regex) is byte-identical and ~3x faster.
    def flush():
        nonlocal link_chars, heading
        if buf:
            text = " ".join("".join(buf).split())
            if text:
                blocks.append((text, link_chars, heading))
            buf.clear()
        link_chars = 0
        heading = False

    def data(seg: str):
        nonlocal link_chars
        if drop:
            return
        if in_title:
            title_buf.append(seg)
            return
        buf.append(seg)
        if a_depth:
            link_chars += len(" ".join(seg.split()))

    def starttag(tag: str, classid):
        nonlocal in_title, a_depth, heading
        if drop:
            drop.append(tag)
            return
        if tag in DROP_TAGS or (
            classid and any(_BLOCKLIST_RE.search(v) for v in classid)
        ):
            flush()
            drop.append(tag)
            return
        if tag == "title":
            flush()
            in_title = True
            return
        if tag == "a":
            a_depth += 1
        if tag in BLOCK_TAGS:
            flush()
            if tag in HEADING_TAGS:
                heading = True

    def endtag(tag: str):
        nonlocal in_title, title, a_depth
        if drop:
            for k in range(len(drop) - 1, -1, -1):
                if drop[k] == tag:
                    del drop[k:]
                    break
            return
        if tag == "title":
            if in_title:
                title = " ".join("".join(title_buf).split()) or None
                in_title = False
                title_buf.clear()
            return
        if tag == "a" and a_depth:
            a_depth -= 1
        if tag in BLOCK_TAGS:
            flush()

    while i < n:
        if cdata is not None:
            # only the matching `</\s*elem\s*>` is special; all else is data
            m = _CDATA_END[cdata].search(src, i)
            if not m:
                break  # no close(): trailing cdata is silently discarded
            if i < m.start():
                data(src[i:m.start()])  # raw (charrefs NOT converted)
            endtag(cdata)
            cdata = None
            i = m.end()
            continue

        j = src.find("<", i)
        if j < 0:
            # tail text: held back when a charref may be cut at the end
            amppos = src.rfind("&", max(i, n - 34))
            if amppos >= 0 and not _SPACE_SEMI.search(src, amppos):
                break
            j = n
        if i < j:
            seg = src[i:j]
            data(_unescape(seg) if "&" in seg else seg)
        i = j
        if i >= n:
            break
        c = src[i + 1 : i + 2]
        if c in _ASCII_LETTERS:
            # ---- start tag ----
            sm = _SIMPLE_OPEN.match(src, i)
            if sm:  # overwhelmingly common `<tag>` case
                tag = sm.group(1).lower()
                starttag(tag, None)
                if tag in _CDATA_END:
                    cdata = tag
                i = sm.end()
                continue
            lm = _LOCATE_START.match(src, i)
            j2 = lm.end()
            nxt = src[j2 : j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            elif nxt == "/":
                if src.startswith("/>", j2):
                    endpos = j2 + 2
                else:
                    break  # incomplete at buffer end -> discard rest
            elif nxt == "" or nxt in _BOGUS_NEXT:
                break  # incomplete -> discard rest
            else:
                endpos = j2 if j2 > i else i + 1
            tm = _TAGFIND.match(src, i + 1)
            tag = tm.group(1).lower()
            k = tm.end()
            classid = []
            while k < endpos:
                am = _ATTRFIND.match(src, k)
                if not am:
                    break
                name, rest, val = am.group(1, 2, 3)
                if not rest:
                    val = None
                elif val[:1] == "'" == val[-1:] or val[:1] == '"' == val[-1:]:
                    val = val[1:-1]
                if val and "&" in val:
                    val = _unescape(val)
                if val and name.lower() in ("class", "id"):
                    classid.append(val)
                k = am.end()
            end = src[k:endpos].strip()
            if end not in (">", "/>"):
                data(src[i:endpos])  # bogus tag re-emitted as raw data
                i = endpos
                continue
            if end.endswith("/>"):
                if tag == "br" and not drop:  # _Extractor.handle_startendtag
                    flush()
            else:
                starttag(tag, classid)
                if tag in _CDATA_END:
                    cdata = tag
            i = endpos
        elif c == "/":
            # ---- end tag ----
            gt = src.find(">", i + 1)
            if gt < 0:
                break  # incomplete -> discard rest
            em = _ENDTAGFIND.match(src, i)
            if em:
                endtag(em.group(1).lower())
                i = em.end()
                continue
            nm = _TAGFIND.match(src, i + 2)
            if not nm:
                if src.startswith("</>", i):
                    i += 3
                    continue
                pos = src.find(">", i + 2)  # bogus comment, ignored
                if pos < 0:
                    break
                i = pos + 1
                continue
            endtag(nm.group(1).lower())
            i = src.find(">", nm.end()) + 1
        elif src.startswith("<!--", i):
            m = _COMMENT_CLOSE.search(src, i + 4)
            if not m:
                break
            i = m.end()
        elif c == "?":
            pos = src.find(">", i + 2)
            if pos < 0:
                break
            i = pos + 1
        elif c == "!":
            if src.startswith("<![", i):
                return None  # marked section: delegate to the spec parser
            if src[i : i + 9].lower() == "<!doctype":
                pos = src.find(">", i + 9)
            else:
                pos = src.find(">", i + 2)  # bogus comment
            if pos < 0:
                break
            i = pos + 1
        elif i + 1 < n:
            data("<")
            i += 1
        else:
            break

    flush()
    return title, blocks


def _render(title, blocks) -> str:
    """Shared block selection + join (the scoring step of the spec)."""
    kept: list[str] = []
    if title:
        kept.append(title)
    for text, link_chars, heading in blocks:
        total = len(text)
        if 3 * link_chars > total:  # link density > 1/3 -> boilerplate
            continue
        if total >= 25 or ":" in text or heading:
            kept.append(text)
    return "".join(b + "\n" for b in kept)


# ---------------------------------------------------------------------------
# Charset detection (deterministic; shared by spec and fast paths)
# ---------------------------------------------------------------------------

_BOMS = (
    # utf-8-sig / utf-16 codecs CONSUME their BOM, so U+FEFF never leaks
    # into the first text block (utf-16-le/-be would keep it)
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
)
# HTML5-style prescan: a charset declaration in the first 1024 bytes,
# anchored to a <meta ...> tag context — either <meta charset=X> or
# <meta http-equiv=... content="...; charset=X">.  An unanchored
# 'charset=' also matches URLs / scripts / comments (common in crawls).
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-:.]+)", re.I
)
# HTML5 prescan §13.2.3.2: a prescanned utf-16 family declaration is
# remapped to utf-8 — the ASCII-readable <meta> itself proves the body is
# not utf-16, and honoring the mis-declaration yields CJK mojibake.
_UTF16_FAMILY = {"utf-16", "utf16", "utf-16-le", "utf-16le", "utf-16-be", "utf-16be"}


def detect_charset(html_bytes: bytes) -> str | None:
    """BOM first, then meta-prescan of the first 1024 bytes; None if neither
    yields a codec Python knows.  Pure function of the bytes."""
    import codecs

    for bom, enc in _BOMS:
        if html_bytes.startswith(bom):
            return enc
    m = _META_CHARSET_RE.search(html_bytes[:1024])
    if m:
        name = m.group(1).decode("ascii", "replace")
        if name.lower() in _UTF16_FAMILY:
            return "utf-8"
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            pass
    return None


def _decode_html(html_bytes: bytes, fallback: str) -> str:
    enc = detect_charset(html_bytes) or fallback
    return html_bytes.decode(enc, errors="replace")


def extract_main_text_spec(html_bytes: bytes, encoding: str = "utf-8") -> str:
    """Reference implementation on stdlib ``html.parser`` — THE spec.

    The golden oracle (tests/oracle.py) calls this version; the pipeline
    calls the byte-identical fast scanner below, so the golden tests
    cross-check the two implementations end-to-end.
    """
    parser = _Extractor()
    parser.feed(_decode_html(html_bytes, encoding))
    parser._flush()
    return _render(parser.title, parser.blocks)


def extract_main_text(html_bytes: bytes, encoding: str = "utf-8") -> str:
    """Boilerplate-strip ``html_bytes`` -> main-content text.

    Returns the title (if present) followed by every kept block, each
    suffixed with "\\n" (F4-style trailing newline per block).  The byte
    payload's charset is sniffed (BOM, then meta prescan) with ``encoding``
    as the fallback — Common-Crawl pages declare a mix of charsets.

    Uses the fast scanner (~3x the spec's HTMLParser) and falls back to the
    spec implementation for the rare constructs the scanner does not
    replicate (marked sections ``<![``).  Byte-equivalence of the two paths
    is enforced by tests/test_html_fast.py (fixture corpus + adversarial
    fuzz) in addition to the golden byte-identity suite.  The fast path is
    gated on VALIDATED_PYTHON: on an interpreter the differential suites
    have not been re-run against, the spec parser handles every document.
    """
    src = _decode_html(html_bytes, encoding)
    result = _fast_scan(src) if _FAST_SCANNER_VALIDATED else None
    if result is None:
        parser = _Extractor()
        parser.feed(src)
        parser._flush()
        return _render(parser.title, parser.blocks)
    return _render(*result)
