"""Unit tests for the pure-Python kernels — every fidelity note in SURVEY §2
becomes an assertion here (F4–F16 edge cases)."""

from __future__ import annotations

from pdf_extraction_spark.kernel import (
    build_prompt,
    concat_pages_direct,
    concat_pages_llm,
    extract_fields_direct,
    extract_fields_ocr,
    truncate_prompt,
)


# --- F4 / F5 page folds ----------------------------------------------------

def test_f4_concat_appends_newline_after_every_kept_page():
    assert concat_pages_direct(["a", "b"]) == "a\nb\n"  # trailing \n included


def test_f4_skips_falsy_pages():
    assert concat_pages_direct(["a", "", None, "b"]) == "a\nb\n"


def test_f5_concat_no_separator_none_to_empty():
    assert concat_pages_llm(["a", None, "b", ""]) == "ab"


# --- F6 empty-document guard -----------------------------------------------

def test_f6_whitespace_only_is_no_data():
    assert extract_fields_direct(" \t   \n ") is None  # Unicode strip


def test_f6_no_colon_lines_give_empty_fields_not_none():
    assert extract_fields_direct("hello world\nno colon here") == []


# --- F7 splitlines boundaries ----------------------------------------------

def test_f7_unicode_line_boundaries():
    text = "A: 1\x0bB: 2\x85C: 3 D: 4\r\nE: 5\rF: 6"
    fields = extract_fields_direct(text)
    assert [f for f, _ in fields] == ["A", "B", "C", "D", "E", "F"]


# --- F8 / F9 line normalize + first-colon split ------------------------------

def test_f9_first_colon_only():
    assert extract_fields_direct("Time: 12:30:45") == [("Time", "12:30:45")]


def test_f9_strip_both_sides():
    assert extract_fields_direct("  Name  :   Alice  ") == [("Name", "Alice")]


def test_f9_empty_value_and_empty_field():
    assert extract_fields_direct("Field:\n: value") == [("Field", ""), ("", "value")]


# --- F10 duplicate key: last value wins, first-occurrence position -----------

def test_f10_last_wins_first_position():
    fields = extract_fields_direct("a: 1\nb: 2\na: 3")
    assert fields == [("a", "3"), ("b", "2")]


# --- F11 classifier -----------------------------------------------------------

def test_f11_classifier_edge_cases():
    # 5 words no digits: header; 6 words: value; unicode digit ²: value
    pages = extract_fields_ocr(
        ["One Two Three Four Five\nval 1\nsix words are not a header line\nTotal ²\nHeader\nval 2"]
    )
    assert pages == [
        [
            ("One Two Three Four Five", "val 1 six words are not a header line Total ²"),
            ("Header", "val 2"),
        ]
    ]


def test_f11_unicode_digits_disqualify():
    # '٣' (Arabic-Indic three) isdigit() is True -> not a header
    pages = extract_fields_ocr(["H\nline ٣ here"])
    assert pages == [[("H", "line ٣ here")]]


# --- F12 state machine ---------------------------------------------------------

def test_f12_lines_before_first_header_dropped():
    # classifier-false lines (they contain digits) before any header: dropped
    pages = extract_fields_ocr(["dropped 123 line\nHeader\nkept 42"])
    assert pages == [[("Header", "kept 42")]]


def test_f12_multiline_values_space_joined():
    pages = extract_fields_ocr(["Header\nv1 1\nv2 2\nv3 3"])
    assert pages == [[("Header", "v1 1 v2 2 v3 3")]]


def test_f12_repeated_header_resets_value_keeps_position():
    pages = extract_fields_ocr(["A\nv1 1\nB\nv2 2\nA\nv3 3"])
    # A reset to "" then accumulates "v3 3"; position of A stays first
    assert pages == [[("A", "v3 3"), ("B", "v2 2")]]


# --- F13 empty pages dropped ----------------------------------------------------

def test_f13_empty_page_dict_dropped():
    pages = extract_fields_ocr(["no header here 123 456", "Header\nval 9"])
    assert pages == [[("Header", "val 9")]]


# --- F16 truncate ----------------------------------------------------------------

def test_f16_truncate_code_points():
    assert truncate_prompt("é" * 5000) == "é" * 3000


def test_prompt_assembly():
    assert build_prompt("T", "x" * 4000) == "Task: T\n\nPDF Content:\n" + "x" * 3000


# --- kernel == straight-line oracle on randomized docs ----------------------------

def test_kernel_matches_oracle_on_fixture_texts():
    import random

    from fixtures.gen import _grammar_d, _grammar_o
    from tests.oracle import oracle_direct, oracle_ocr

    rng = random.Random(7)
    for i in range(200):
        text = _grammar_d(rng, i) if i % 2 else _grammar_o(rng, i)
        pages = text.split("\x0c")
        etext, fields = oracle_direct(pages)
        assert concat_pages_direct(pages) == etext
        assert extract_fields_direct(etext) == fields
        assert extract_fields_ocr(pages) == oracle_ocr(pages)
