"""Streaming ingest: batch-parity and exactly-once resume.

The stream runs the identical mapInPandas kernel as the batch pipeline, so
its output must be byte-identical per url to the batch result; and because
the file-source offset log lives in the checkpoint, re-running the stream
after new files arrive must process ONLY the new files (no duplicates).
"""

from __future__ import annotations

import os

import pytest


def _write_pages_file(dir_path: str, name: str, n: int, seed: int) -> None:
    """One fixture file with file-unique urls (gen_pages urls are indexed
    per-call, so two files from different seeds can collide on url)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fixtures.gen import gen_pages

    os.makedirs(dir_path, exist_ok=True)
    tbl = gen_pages(n, seed=seed)
    urls = pa.array(
        [f"file://{name}/{u}" for u in tbl.column("url").to_pylist()], pa.string()
    )
    tbl = tbl.set_column(tbl.schema.get_field_index("url"), "url", urls)
    pq.write_table(tbl, os.path.join(dir_path, name))


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    d = {
        "input": str(root / "input"),
        "output": str(root / "output"),
        "checkpoint": str(root / "checkpoint"),
    }
    _write_pages_file(d["input"], "part-0.parquet", 60, seed=42)
    _write_pages_file(d["input"], "part-1.parquet", 40, seed=43)
    return d


def test_stream_matches_batch(spark, stream_dirs):
    from pdf_extraction_spark.operators.extract import extract_documents
    from pdf_extraction_spark.streaming.ingest import stream_extract

    q = stream_extract(
        spark,
        stream_dirs["input"],
        stream_dirs["output"],
        stream_dirs["checkpoint"],
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    streamed = {
        r["url"]: r
        for r in spark.read.parquet(stream_dirs["output"]).collect()
    }
    batch = {
        r["url"]: r
        for r in extract_documents(
            spark.read.parquet(stream_dirs["input"])
        ).collect()
    }
    assert set(streamed) == set(batch) and len(streamed) == 100
    for url, b in batch.items():
        s = streamed[url]
        assert s["extracted_text"] == b["extracted_text"]
        assert s["fields"] == b["fields"]
        assert s["page_fields"] == b["page_fields"]
        assert s["error"] == b["error"]


def test_stream_resume_exactly_once(spark, stream_dirs):
    """New file after a drain: the restarted stream emits ONLY its rows."""
    from pdf_extraction_spark.streaming.ingest import stream_extract

    # depends on test_stream_matches_batch having drained the first 100
    _write_pages_file(stream_dirs["input"], "part-2.parquet", 30, seed=44)
    q = stream_extract(
        spark,
        stream_dirs["input"],
        stream_dirs["output"],
        stream_dirs["checkpoint"],
    )
    q.awaitTermination()

    out = spark.read.parquet(stream_dirs["output"])
    assert out.count() == 130  # 100 old + 30 new, no reprocessing
    assert out.select("url").distinct().count() == 130


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicates arriving within the event-time
    horizon are dropped across micro-batches (fingerprint state persists
    in the store); distinct texts all survive; the memory sink receives
    exactly one row per fingerprint."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extraction_spark.streaming.ingest import stream_dedup

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    t0 = dt.datetime(2026, 5, 1, 12, 0, 0)

    def rows(specs):
        return pa.table(
            {
                "url": pa.array([u for u, _, _ in specs], pa.string()),
                "warc_ts": pa.array(
                    [t0 + dt.timedelta(seconds=s) for _, s, _ in specs],
                    pa.timestamp("us"),
                ),
                "html": pa.array([None] * len(specs), pa.binary()),
                "text": pa.array([t for _, _, t in specs], pa.string()),
                "lang": pa.array(["en"] * len(specs), pa.string()),
            }
        )

    # batch 1: two distinct texts + an in-batch duplicate (whitespace/case
    # variant — the normalization must collapse it)
    pq.write_table(
        rows(
            [
                ("u1", 0, "alpha body text"),
                ("u2", 1, "beta body text"),
                ("u3", 2, "  Alpha   BODY  text "),
            ]
        ),
        os.path.join(input_dir, "b1.parquet"),
    )
    # batch 2: cross-batch duplicate of alpha (within horizon) + new text
    pq.write_table(
        rows(
            [
                ("u4", 30, "alpha body text"),
                ("u5", 31, "gamma body text"),
            ]
        ),
        os.path.join(input_dir, "b2.parquet"),
    )

    out = stream_dedup(
        spark, input_dir, watermark_seconds=3600, max_files_per_trigger=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from dedup_sink").collect()
    texts = sorted(
        " ".join(r["text"].lower().split()) for r in got
    )
    assert texts == ["alpha body text", "beta body text", "gamma body text"]
    assert len({r["fingerprint"] for r in got}) == 3
