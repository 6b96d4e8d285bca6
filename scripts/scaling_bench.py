"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 at N vs 4N).

No real cluster exists in this sandbox, so the criterion is evidenced the way
the driver prescribes: the SAME extraction job over the SAME on-disk pages
table at two parallelism levels — ``local[8]`` and ``local[32]`` — reporting
documents/sec at both plus scaling efficiency

    eff = (throughput@32 / throughput@8) / 4

Each measurement runs in its own subprocess (its own JVM), because a Spark
local master cannot be re-sized inside one process and a shared JVM would let
the second run benefit from the first run's JIT warm-up.  The work
decomposition is held constant (fixed partition count, multiple of both core
counts) so the two runs execute identical task graphs and only the executor
slot count varies — exactly the N-vs-4N-executors contract.

Usage:
    python scripts/scaling_bench.py            # full run -> BENCH/ artifacts
    python scripts/scaling_bench.py --one 8    # single measurement (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAGES_PATH = os.environ.get("SCALING_PAGES_PATH", "/tmp/scaling_pages.parquet")
REPLICATION = int(os.environ.get("SCALING_REPLICATION", "16"))
N_BLOCKS = 120
PARTITIONS = int(os.environ.get("SCALING_PARTITIONS", "128"))
CORE_COUNTS = (8, 32)


def build_scaling_pages(spark, sf_dir: str, replication: int):
    """Synthesize realistic Common-Crawl-shaped pages: ~25 KB HTML per doc.

    The tiny text-layer docs that bench.py uses for oracle queries cost
    ~0.04 ms of kernel time each — a corpus of those measures scan/shuffle
    overhead, not extraction.  Real CC pages are tens of KB of markup whose
    boilerplate-strip costs milliseconds, so the scaling corpus is HTML:
    ~120 blocks per page (every 4th a nav/link block the extractor must
    drop) built deterministically from each document's own words, entirely
    with JVM expressions (no external data, no Python in the builder).
    """
    from pyspark.sql import functions as F

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rep = d.select(
        "doc_id", "source", "text",
        F.explode(F.sequence(F.lit(0), F.lit(replication - 1))).alias("copy"),
    )
    words = F.split(F.substring("text", 1, 1200), " ")

    def block(i):
        btxt = F.concat_ws(" ", F.slice(words, (i * 7) % 37 + 1, 12 + (i % 29)))
        nav = F.concat(
            F.lit('<div class="nav"><a href="/x'), i.cast("string"),
            F.lit('">'), btxt, F.lit("</a></div>"),
        )
        para = F.concat(F.lit("<p>"), btxt, F.lit("</p>"))
        return F.when(i % 4 == 0, nav).otherwise(para)

    html = F.concat(
        F.lit("<html><head><title>"), F.col("source"), F.lit(" page "),
        F.col("doc_id").cast("string"), F.lit("</title></head><body>"),
        F.concat_ws("", F.transform(F.sequence(F.lit(0), F.lit(N_BLOCKS - 1)), block)),
        F.lit("</body></html>"),
    )
    return rep.select(
        F.concat(
            F.lit("http://host-"), (F.col("doc_id") % 97).cast("string"),
            F.lit(".example/"), F.col("doc_id").cast("string"),
            F.lit("/"), F.col("copy").cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
    )


def _build_pages() -> int:
    """Write the fixed input table once; returns the document count."""
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(app="scaling-build", cpus=32)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pages = build_scaling_pages(spark, sf_dir, REPLICATION)
    pages.write.mode("overwrite").parquet(PAGES_PATH)
    n = spark.read.parquet(PAGES_PATH).count()
    spark.stop()
    return n


def _run_one(cpus: int) -> None:
    """One timed measurement; prints a single JSON line on stdout."""
    from pdf_extraction_spark.operators.extract import (
        extract_documents,
        salted_repartition,
    )
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(app=f"scaling-{cpus}", cpus=cpus, shuffle_partitions=PARTITIONS)
    pages = spark.read.parquet(PAGES_PATH)
    n_docs = pages.count()

    # small warm-up so JVM class-loading / Python worker spawn cost is not
    # charged to the timed region of either run
    extract_documents(pages.limit(256)).write.format("noop").mode("overwrite").save()

    t0 = time.monotonic()
    out = extract_documents(salted_repartition(pages, PARTITIONS, salt_buckets=8))
    out.write.format("noop").mode("overwrite").save()
    sec = time.monotonic() - t0
    print(json.dumps({
        "cpus": cpus,
        "docs": n_docs,
        "sec": round(sec, 3),
        "docs_per_sec": round(n_docs / sec, 1),
        "partitions": PARTITIONS,
    }))
    spark.stop()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--one", type=int, default=None, help="internal: run one core count")
    args = p.parse_args()
    if args.one is not None:
        _run_one(args.one)
        return 0

    n_docs = _build_pages()
    print(f"input: {n_docs} docs at {PAGES_PATH}", file=sys.stderr)

    results = {}
    for cpus in CORE_COUNTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(cpus)],
            capture_output=True, text=True, cwd=REPO,
        )
        if proc.returncode != 0:
            print(proc.stderr[-4000:], file=sys.stderr)
            return 1
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {results[cpus]['docs_per_sec']} docs/sec "
              f"({results[cpus]['sec']}s)", file=sys.stderr)

    lo, hi = CORE_COUNTS
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
    payload = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "core_counts": list(CORE_COUNTS),
        "docs": n_docs,
        "partitions": PARTITIONS,
        "runs": {str(k): v for k, v in results.items()},
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
