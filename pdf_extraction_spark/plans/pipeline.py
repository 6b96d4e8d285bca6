"""End-to-end extraction pipeline with checkpoint/resume + lineage.

Cluster design (north_rule): the input is an Iceberg table of
Common-Crawl-style pages bucketed on url-hash; each *commit group* is one
atomic snapshot commit, so a killed job resumes from the last committed
snapshot.  This sandbox has no Iceberg runtime jar (verified), so groups
commit as  <out>/group=<g>/  parquet directories plus an atomically-renamed
JSON manifest per group — same resume semantics, same lineage content
(input files, row counts, checksums).

Scale notes (100 TB / 10^12 docs):
  * groups = pmod(xxhash64(url), G): on Iceberg this is partition-predicate
    pushdown on the bucket spec — each group scans only its own files, not
    1/G of everything.  In the parquet sandbox it is a predicate on the
    scan (evaluated post-read; acceptable at test scale, free on Iceberg).
  * checksums use bit_xor(xxhash64(...)) — order-independent, overflow-free
    (Spark 4 runs ANSI mode; sum() of hashes would overflow).
  * per-input-file lineage comes from input_file_name() BEFORE the shuffle,
    grouped JVM-side — no Python in the metrics path.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.extract import extract_documents, salted_repartition

MANIFEST_DIR = "_manifests"


def _manifest_path(out_path: str, group: int) -> str:
    return os.path.join(out_path, MANIFEST_DIR, f"group-{group}.json")


def _write_manifest_atomic(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX: the commit point


def committed_groups(out_path: str) -> set[int]:
    d = os.path.join(out_path, MANIFEST_DIR)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("group-") and name.endswith(".json"):
            out.add(int(name[len("group-"):-len(".json")]))
    return out


def _checksum_exprs():
    """(count, order-independent xxhash64-xor) over the semantic columns."""
    return [
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(
            F.xxhash64(
                "url",
                F.coalesce("extracted_text", F.lit("\x00null")),
                F.coalesce(F.to_json("fields"), F.lit("\x00null")),
                F.coalesce(F.to_json("page_fields"), F.lit("\x00null")),
                F.coalesce("error", F.lit("\x00null")),
            )
        ).alias("checksum"),
    ]


def result_checksum(result: DataFrame):
    """(row_count, order-independent checksum) over the semantic columns."""
    row = result.agg(*_checksum_exprs()).collect()[0]
    return int(row["n"]), int(row["checksum"] or 0)


def run_extraction(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    *,
    num_partitions: int | None = None,
    salt_buckets: int = 8,
    groups: int = 4,
    resume: bool = False,
    fail_after_group: int | None = None,
    input_format: str = "parquet",
) -> dict:
    """Run the pipeline; returns a summary dict (also persisted per group).

    ``fail_after_group`` is a test hook: raise after committing that many
    groups, simulating a killed job for the resume test.
    ``input_format``: "parquet" (Iceberg/parquet table), "jsonl"
    (crawl-dump interchange; html carried as base64), or "warc"
    (Common Crawl's native archive format, .warc/.warc.gz).
    """
    from pdf_extraction_spark.sources.pages import read_pages, read_pages_jsonl
    from pdf_extraction_spark.sources.warc import read_pages_warc

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if input_format == "warc":
        pages = read_pages_warc(spark, pages_path)
    elif input_format == "jsonl":
        pages = read_pages_jsonl(spark, pages_path)
    else:
        # read_pages enforces the documented fail-fast schema contract on
        # the primary path too (catalog table or parquet)
        pages = read_pages(spark, pages_path)
    done = committed_groups(out_path) if resume else set()
    summary = {"groups": groups, "skipped": sorted(done), "committed": []}
    committed_count = 0

    for g in range(groups):
        if g in done:
            continue
        t0 = time.monotonic()
        group_pages = pages.filter(F.pmod(F.xxhash64("url"), F.lit(groups)) == g)

        # per-input-file lineage, computed JVM-side pre-shuffle
        lineage_rows = [
            {
                "input_file": r["input_file"],
                "n_rows": int(r["n_rows"]),
                "input_checksum": int(r["chk"] or 0),
            }
            for r in group_pages.groupBy(
                F.input_file_name().alias("input_file")
            )
            .agg(
                F.count("*").alias("n_rows"),
                F.bit_xor(F.xxhash64("url")).alias("chk"),
            )
            .collect()
        ]

        result = extract_documents(
            salted_repartition(group_pages, num_partitions, salt_buckets)
        )
        # checksum on the WRITE path via observed metrics — at 100 TB,
        # re-reading the committed output just to checksum it doubles
        # output I/O per commit group
        from pyspark.sql import Observation

        obs = Observation(f"group-{g}-checksum")
        result = result.observe(obs, *_checksum_exprs())
        group_dir = os.path.join(out_path, f"group={g}")
        result.write.mode("overwrite").parquet(group_dir)

        metrics = obs.get  # blocks only until the finished write's metrics land
        n_rows, checksum = int(metrics["n"]), int(metrics["checksum"] or 0)
        manifest = {
            "group": g,
            "n_rows": n_rows,
            "output_checksum": checksum,
            "lineage": sorted(lineage_rows, key=lambda r: r["input_file"]),
            "wall_sec": round(time.monotonic() - t0, 3),
            "num_partitions": num_partitions,
            "salt_buckets": salt_buckets,
        }
        _write_manifest_atomic(_manifest_path(out_path, g), manifest)
        summary["committed"].append(g)
        committed_count += 1
        if fail_after_group is not None and committed_count >= fail_after_group:
            raise RuntimeError(f"simulated kill after {committed_count} group(s)")
    return summary


def read_extractions(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "group=*"))


def compact_group(
    spark: SparkSession,
    out_path: str,
    group: int,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite one committed group's parquet into ~target-sized files —
    the small-file compaction a long-running ingest needs (each commit
    writes num_partitions files; thousands of commits make scans
    metadata-bound).

    Safe + verifiable: the rewrite lands in a temp dir first, its
    order-insensitive checksum is computed ON THE WRITE PATH (observe)
    and compared to the committed manifest's ``output_checksum`` BEFORE
    the swap — a corrupted rewrite can never replace good data.  The
    manifest is updated in place (atomic tmp+rename) with the new file
    count; lineage rows are untouched (compaction changes layout, not
    content).
    """
    import shutil

    from pyspark.sql import Observation

    group_dir = os.path.join(out_path, f"group={group}")
    manifest_path = _manifest_path(out_path, group)
    with open(manifest_path) as f:
        manifest = json.load(f)

    df = spark.read.parquet(group_dir)
    total_bytes = sum(
        os.path.getsize(os.path.join(group_dir, f))
        for f in os.listdir(group_dir)
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil-div
    obs = Observation(f"compact-{group}")
    compacted = df.repartition(n_files).observe(obs, *_checksum_exprs())

    tmp_dir = group_dir + ".compact-tmp"
    compacted.write.mode("overwrite").parquet(tmp_dir)
    metrics = obs.get
    n_rows, checksum = int(metrics["n"]), int(metrics["checksum"] or 0)
    if n_rows != manifest["n_rows"] or checksum != manifest["output_checksum"]:
        shutil.rmtree(tmp_dir)
        raise RuntimeError(
            f"compaction checksum mismatch for group {group}: "
            f"rows {n_rows} vs {manifest['n_rows']}, "
            f"checksum {checksum} vs {manifest['output_checksum']}"
        )
    backup = group_dir + ".pre-compact"
    os.rename(group_dir, backup)
    os.rename(tmp_dir, group_dir)
    shutil.rmtree(backup)
    manifest["compacted_files"] = n_files
    _write_manifest_atomic(manifest_path, manifest)
    return {"group": group, "n_files": n_files, "n_rows": n_rows}
