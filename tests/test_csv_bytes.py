"""CSV export bytes must equal the reference's pandas-produced bytes
(F14 column order / NaN cells, F15 no-BOM UTF-8)."""

from __future__ import annotations


def test_csv_no_bom_and_pandas_equivalence():
    from pdf_extraction_spark.plans.csv_export import records_to_csv_bytes
    from tests.oracle import oracle_csv_bytes

    records = [[("A", "1"), ("B", "2")], [("B", "3"), ("C", "4")]]
    got = records_to_csv_bytes(records)
    assert got == oracle_csv_bytes(records)
    assert not got.startswith(b"\xef\xbb\xbf")  # NO BOM (encoding arg ignored)
    # union-of-keys first-seen order; missing -> empty cell
    assert got == b"A,B,C\n1,2,\n,3,4\n"


def test_csv_quoting_matches_pandas_default():
    from pdf_extraction_spark.plans.csv_export import records_to_csv_bytes
    from tests.oracle import oracle_csv_bytes

    records = [[("Name", 'va,l"ue'), ("Note", "line1\nline2")]]
    assert records_to_csv_bytes(records) == oracle_csv_bytes(records)


def test_pipeline_csv_export_matches_oracle(spark, pages_unit, golden, tmp_path):
    from pdf_extraction_spark.plans.csv_export import export_direct_csv, export_ocr_csv
    from pdf_extraction_spark.plans.pipeline import read_extractions, run_extraction
    from tests.oracle import oracle_csv_bytes

    out = str(tmp_path / "out")
    run_extraction(spark, pages_unit, out, groups=2)
    result = read_extractions(spark, out)

    direct = export_direct_csv(result)
    ocr = export_ocr_csv(result)

    n_direct = n_ocr = 0
    for url, g in golden.items():
        if g["fields"]:
            assert direct[url] == oracle_csv_bytes([g["fields"]]), url
            n_direct += 1
        else:
            assert url not in direct
        if g["page_fields"]:
            assert ocr[url] == oracle_csv_bytes(g["page_fields"]), url
            n_ocr += 1
        else:
            assert url not in ocr
    assert n_direct > 50 and n_ocr > 20  # the fixture actually exercises both
