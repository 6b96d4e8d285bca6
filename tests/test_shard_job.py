"""jobs/shard.py: curate -> WebDataset shard export, end to end."""

from __future__ import annotations

import json
import os


def test_shard_job_end_to_end(spark, tmp_path):
    import duckdb

    from jobs.shard import main
    from pdf_extraction_spark.sources.webdataset import read_webdataset

    src = "/root/testdata/sf0.01/documents.parquet"
    out = str(tmp_path / "shards")
    # main() builds its own session via get_spark — same JVM, shared
    # with the fixture session (getOrCreate)
    assert main(["--input", src, "--output", out,
                 "--samples-per-shard", "50", "--cpus", "8"]) == 0

    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    n = manifest["summary"]["samples"]
    assert manifest["summary"]["shards"] >= n // 50
    assert sum(m["samples"] for m in manifest["shards"]) == n
    assert all(m["samples"] <= 50 for m in manifest["shards"])

    # independent cross-check of the survivor COUNT: DuckDB replays the
    # curation predicate (gate -> dedup by raw-text fingerprint); the
    # full gate/scrub semantics are pinned in test_curate_pipeline — here
    # we only need the export to carry every survivor exactly once
    back = read_webdataset(spark, os.path.join(out, "*.tar"))
    rows = back.collect()
    assert len(rows) == n
    keys = {r["key"] for r in rows}
    assert len(keys) == n  # no duplicate samples across shards

    # every sample carries both parts; the json sidecar parses and
    # agrees with the key
    for r in rows[:25]:
        parts = {k: bytes(v) for k, v in r["parts"].items()}
        assert set(parts) == {"txt", "json"}
        meta = json.loads(parts["json"])
        assert r["key"] == "docs/%012d" % meta["doc_id"]
        assert parts["txt"].decode("utf-8")  # non-empty scrubbed text
        assert "[EMAIL]" not in meta.get("source", "")

    # exact survivor-set fidelity: the exported keys are precisely the
    # curated_docs survivors (semantics of curated_docs itself are
    # DuckDB-cross-checked in test_curate_pipeline)
    from pdf_extraction_spark.plans.curate import curated_docs

    survivors = {
        "docs/%012d" % r["doc_id"]
        for r in curated_docs(spark.read.parquet(src)).select("doc_id").collect()
    }
    assert keys == survivors

    # and the count is bounded by an independent DuckDB replay of
    # the dedup-only predicate (the gate can only drop more)
    dd = duckdb.connect().execute(
        f"""
        WITH gated AS (
          SELECT doc_id, text FROM '{src}'
          WHERE length(text) >= 1
        )
        SELECT count(*) FROM (
          SELECT min(doc_id) FROM gated GROUP BY md5(text)
        )
        """
    ).fetchone()[0]
    # the quality gate drops more than the trivial length predicate, so
    # the exported count is bounded by the dedup-only count
    assert 0 < n <= dd
