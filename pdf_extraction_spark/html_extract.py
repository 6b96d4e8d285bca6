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
from html.parser import HTMLParser

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


def extract_main_text(html_bytes: bytes, encoding: str = "utf-8") -> str:
    """Boilerplate-strip ``html_bytes`` -> main-content text.

    Returns the title (if present) followed by every kept block, each
    suffixed with "\\n" (F4-style trailing newline per block).
    """
    parser = _Extractor()
    parser.feed(html_bytes.decode(encoding, errors="replace"))
    parser._flush()

    kept: list[str] = []
    if parser.title:
        kept.append(parser.title)
    for text, link_chars, heading in parser.blocks:
        total = len(text)
        if 3 * link_chars > total:  # link density > 1/3 -> boilerplate
            continue
        if total >= 25 or ":" in text or heading:
            kept.append(text)
    return "".join(b + "\n" for b in kept)
