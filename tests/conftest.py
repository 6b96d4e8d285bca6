from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pdf_extraction_spark.session import get_spark

    s = get_spark(app="pytest", cpus=int(os.environ.get("PYTEST_SPARK_CPUS", "8")),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_unit(tmp_path_factory):
    """200-row deterministic pages fixture (FIXTURES.md sf-unit)."""
    from fixtures.gen import write_pages

    path = str(tmp_path_factory.mktemp("fixtures") / "pages_unit.parquet")
    write_pages(path, 200, seed=42)
    return path


@pytest.fixture(scope="session")
def golden(pages_unit):
    """Golden records keyed by url, computed by the straight-line oracle."""
    import pyarrow.parquet as pq

    from tests.oracle import oracle_document

    tbl = pq.read_table(pages_unit)
    out = {}
    for row in tbl.to_pylist():
        rec = oracle_document(row["url"], row["html"], row["text"])
        out[rec["url"]] = rec
    return out
