r"""RTF build/extract: exact-identity round trips, spec-behavior pins
(destinations, \ucN fallback skipping, surrogate pairs, codepages,
symbol words), and containment on malformed bytes."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.operators.rtf_text import (
    build_rtf,
    extract_rtf_paragraphs,
)


def rt(paragraphs: list[str]) -> list[str]:
    out = extract_rtf_paragraphs(build_rtf(paragraphs))
    assert out is not None
    return out


def test_identity_ascii_and_controls():
    # newline/tab inside a paragraph, plus every RTF-special ASCII char
    p = "plain text\nwith\ttabs and \\ { } braces"
    assert rt([p]) == [p]


def test_identity_full_character_space():
    # cp1252 range, BMP beyond cp1252, astral (surrogate pair), the
    # XML-impossible characters (\r, NUL, U+FFFE) — RTF carries ALL of
    # them, which is exactly why the oracle identity needs no sanitize
    p = "café € 中文 \U0001f600 a\rb\x00c ￾￿"
    assert rt([p]) == [p]


def test_paragraph_structure_and_group_merge():
    paras = ["first para", "second\npara", ""]
    assert rt(paras) == paras
    # the builder splits each paragraph into two adjacent groups, so a
    # parser that resets text state at group boundaries would fail
    assert b"}{" in build_rtf(["0123456789"])


def test_destinations_skipped():
    raw = build_rtf(["hello"])
    # builder embeds fonttbl/colortbl/\*\generator — none may leak
    out = "".join(extract_rtf_paragraphs(raw))
    assert "Helvetica" not in out and "generator" not in out
    assert out == "hello"


def test_field_result_kept_instruction_skipped():
    raw = (
        b"{\\rtf1\\ansi before "
        b"{\\field{\\*\\fldinst HYPERLINK \"http://x\"}{\\fldrslt shown}}"
        b" after}"
    )
    assert extract_rtf_paragraphs(raw) == ["before shown after"]


def test_uc_fallback_skipping():
    # \uc2: TWO fallback chars follow each \uN and must be consumed;
    # a \'hh escape counts as ONE fallback character (spec)
    raw = b"{\\rtf1\\ansi\\uc2 a\\u1090 \\'3f\\'3fb}"
    assert extract_rtf_paragraphs(raw) == ["aтb"]
    # \uc0: no fallback at all
    raw0 = b"{\\rtf1\\ansi\\uc0 a\\u1090 b}"
    assert extract_rtf_paragraphs(raw0) == ["aтb"]


def test_uc_is_group_scoped():
    raw = b"{\\rtf1\\ansi\\uc1 {\\uc0 \\u1090 }\\u1091 ?x}"
    assert extract_rtf_paragraphs(raw) == ["туx"]


def test_surrogate_pair_recombined():
    # what Word emits for astral chars: two signed \u units
    raw = b"{\\rtf1\\ansi\\uc1 \\u-10179?\\u-8701?}"
    assert extract_rtf_paragraphs(raw) == ["\U0001f603"]


def test_negative_u_values_wrap():
    raw = b"{\\rtf1\\ansi\\uc1 \\u-2?}"
    assert extract_rtf_paragraphs(raw) == ["￾"]


def test_codepage_honoured():
    # cp1251: 0xE4 = CYRILLIC SMALL DE; under the cp1252 default it
    # would decode as a-umlaut, so this pins the \ansicpg switch
    raw = b"{\\rtf1\\ansi\\ansicpg1251 \\'e4\\'ee\\'ec}"
    assert extract_rtf_paragraphs(raw) == ["дом"]
    raw52 = b"{\\rtf1\\ansi\\ansicpg1252 \\'e4}"
    assert extract_rtf_paragraphs(raw52) == ["ä"]


def test_symbol_words_and_chars():
    raw = b"{\\rtf1\\ansi a\\emdash b\\~c\\_d\\-e\\line f}"
    assert extract_rtf_paragraphs(raw) == ["a—b c‑d" + "e\nf"]


def test_bin_skips_raw_bytes():
    # \bin payload may contain { } \ bytes that must NOT be parsed
    raw = b"{\\rtf1\\ansi a{\\pict\\bin5 \x00{}\\qb} z}"
    assert extract_rtf_paragraphs(raw) == ["a z"]


def test_raw_newlines_ignored_backslash_newline_is_par():
    raw = b"{\\rtf1\\ansi one\r\ntwo\\\nthree}"
    assert extract_rtf_paragraphs(raw) == ["onetwo", "three"]


def test_not_rtf_returns_none():
    assert extract_rtf_paragraphs(b"hello") is None
    assert extract_rtf_paragraphs(b"%PDF-1.4") is None
    assert extract_rtf_paragraphs(b"") is None


def test_malformed_never_raises():
    base = build_rtf(["some text 中 \U0001f600 café"])
    for cut in range(0, len(base), 7):
        out = extract_rtf_paragraphs(base[:cut] if cut else b"{\\rtf1")
        assert out is None or isinstance(out, list)
    # garbage control words, dangling escapes, unbalanced groups
    for raw in (
        b"{\\rtf1\\ansi \\u99999999999 x}",
        b"{\\rtf1\\ansi \\'zq}",
        b"{\\rtf1\\ansi {{{ \\u-10179?}",
        b"{\\rtf1\\ansi \\",
        b"{\\rtf1\\bin99999}",
    ):
        out = extract_rtf_paragraphs(raw)
        assert out is None or isinstance(out, list)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80), st.text(max_size=80))
def test_roundtrip_fuzz(a, b):
    assert rt([a, b]) == [a, b]
