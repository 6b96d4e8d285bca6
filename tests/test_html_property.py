"""Property-based differential testing of the fast HTML scanner.

Hypothesis generates adversarial markup — raw unicode noise, tag soup,
fragments glued at arbitrary points — and the property is always the same:
``extract_main_text`` (fast scanner) == ``extract_main_text_spec``
(stdlib HTMLParser) byte-for-byte.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.html_extract import (
    extract_main_text,
    extract_main_text_spec,
)

# building blocks that exercise every scanner branch
_FRAGMENTS = st.sampled_from([
    "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<br>", "<br/>",
    "<script>", "</script>", "<style>", "</style>", "<title>", "</title>",
    "<nav>", "</nav>", '<div class="sidebar">', '<div class="content">',
    "<h1>", "</h1>", "<!-- c -->", "<!DOCTYPE html>", "<?pi?>", "</>", "</ x>",
    "&amp;", "&#65;", "&#x41;", "&bogus;", "&", "<", ">", "< ", "</bogus j>",
    "some words here", "Key: value", "x", " ", "\t", "\n", "\x0c", "\xa0",
    "word: ", "twenty five characters of prose!", '<p a=1 b="2">', "<p =x>",
    '<p foo="unterminated>', "<p", "</p", "<x/>", "<EM>", "</eM>",
])

_markup = st.lists(_FRAGMENTS, min_size=0, max_size=30).map("".join)
_noise = st.text(max_size=200)
_mixed = st.tuples(_markup, _noise, _markup).map(lambda t: t[0] + t[1] + t[2])


def _check(src: str) -> None:
    # surrogates can't encode to utf-8; mirror real byte inputs
    b = src.encode("utf-8", errors="replace")
    assert extract_main_text(b) == extract_main_text_spec(b)


@settings(max_examples=400, deadline=None)
@given(_markup)
def test_property_tag_soup(src):
    _check(src)


@settings(max_examples=200, deadline=None)
@given(_noise)
def test_property_unicode_noise(src):
    _check(src)


@settings(max_examples=300, deadline=None)
@given(_mixed)
def test_property_mixed(src):
    _check(src)
