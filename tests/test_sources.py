"""Source contract tests: fail-fast schema validation (SURVEY §4.3).

A schema mismatch discovered inside a Python worker at 10^12-doc scale
wastes a cluster-hour; read_pages must reject it driver-side, and a
contract violation must surface as ValueError — never be silently retried
against another source format.
"""

from __future__ import annotations

import pytest


def test_read_pages_validates_parquet(spark, tmp_path):
    from pdf_extraction_spark.sources.pages import read_pages

    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame(
        [(1, "x")], "doc_id long, text string"  # no url/html columns
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="schema mismatch"):
        read_pages(spark, bad)


def test_read_pages_validates_catalog_table(spark):
    """A catalog table with the wrong schema raises ValueError — it is NOT
    retried as a parquet path (which would bury the contract violation
    under an unrelated read error)."""
    from pdf_extraction_spark.sources.pages import read_pages

    spark.createDataFrame([(1, "x")], "doc_id long, text string").createOrReplaceTempView(
        "bad_pages_view"
    )
    try:
        with pytest.raises(ValueError, match="schema mismatch"):
            read_pages(spark, "bad_pages_view")
    finally:
        spark.catalog.dropTempView("bad_pages_view")


def test_read_pages_missing_table_falls_back_with_parquet_error(spark):
    """No such catalog table AND no such path -> the parquet error surfaces
    (the fallback itself still works for genuinely-missing tables)."""
    from pdf_extraction_spark.sources.pages import read_pages

    with pytest.raises(Exception) as ei:
        read_pages(spark, "no_such_table_anywhere")
    assert not isinstance(ei.value, ValueError)


def test_pipeline_parquet_branch_validates(spark, tmp_path):
    from pdf_extraction_spark.plans.pipeline import run_extraction

    bad = str(tmp_path / "bad2.parquet")
    spark.createDataFrame([(1, "x")], "a long, b string").write.parquet(bad)
    with pytest.raises(ValueError, match="schema mismatch"):
        run_extraction(spark, bad, str(tmp_path / "out"), groups=1)
