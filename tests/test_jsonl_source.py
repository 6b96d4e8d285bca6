"""JSONL pages source: round-trip fidelity and pipeline parity.

Crawl dumps commonly arrive as JSONL; the binary `html` column travels as
base64.  Extraction results from the JSONL path must equal the parquet
path byte-for-byte per url.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_jsonl_round_trip_and_extraction_parity(spark, pages_unit, tmp_path):
    from pdf_extraction_spark.operators.extract import extract_documents
    from pdf_extraction_spark.sources.pages import (
        read_pages_jsonl,
        write_pages_jsonl,
    )

    parquet_pages = spark.read.parquet(pages_unit)
    jsonl_dir = str(tmp_path / "pages_jsonl")
    write_pages_jsonl(parquet_pages, jsonl_dir)
    jsonl_pages = read_pages_jsonl(spark, jsonl_dir)

    # schema parity (pyarrow fixtures carry naive timestamps — ntz vs tz
    # on warc_ts is the one tolerated difference)
    def norm(schema):
        return [
            (f.name, f.dataType.simpleString().replace("timestamp_ntz", "timestamp"))
            for f in schema.fields
        ]

    assert norm(jsonl_pages.schema) == norm(parquet_pages.schema)

    # payload round-trip: html bytes and text identical per url
    joined = parquet_pages.alias("p").join(jsonl_pages.alias("j"), "url")
    assert joined.count() == parquet_pages.count()
    mismatch = joined.filter(
        ~(
            (F.col("p.html") == F.col("j.html"))
            | (F.col("p.html").isNull() & F.col("j.html").isNull())
        )
        | ~(
            (F.col("p.text") == F.col("j.text"))
            | (F.col("p.text").isNull() & F.col("j.text").isNull())
        )
    )
    assert mismatch.count() == 0

    # end-to-end: extraction over the JSONL source equals the parquet path
    a = {r["url"]: r for r in extract_documents(parquet_pages).collect()}
    b = {r["url"]: r for r in extract_documents(jsonl_pages).collect()}
    assert set(a) == set(b)
    for url, ra in a.items():
        rb = b[url]
        assert ra["extracted_text"] == rb["extracted_text"], url
        assert ra["fields"] == rb["fields"], url
        assert ra["error"] == rb["error"], url
