"""spark-submit entry point for the training-data curation pipeline.

Composes the curation operators (quality gate -> PII scrub -> exact
dedup) over a documents table, with the same commit-group/manifest
resume semantics as jobs/extract.py.  Commit groups are keyed by content
fingerprint so per-group dedup is global dedup (see plans/curate.py).

Cluster usage:
    spark-submit --py-files pdf_extraction_spark.zip jobs/curate.py \
        --input s3://.../documents --output s3://.../curated --groups 64

Sandbox usage:
    python jobs/curate.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated --groups 4 --cpus 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Training-data curation pipeline")
    p.add_argument("--input", required=True, help="documents table path (parquet)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--groups", type=int, default=4, help="commit groups (snapshots)")
    p.add_argument("--resume", action="store_true", help="skip committed groups")
    p.add_argument("--groups-per-pass", type=int, default=None,
                   help="groups curated per input pass (default: all "
                        "uncommitted groups in one pass)")
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--min-score", type=int, default=50)
    args = p.parse_args(argv)

    from pdf_extraction_spark.session import get_spark

    spark = get_spark(app="curate-job", cpus=args.cpus)
    from pdf_extraction_spark.plans.curate import run_curation

    t0 = time.monotonic()
    summary = run_curation(
        spark,
        args.input,
        args.output,
        groups=args.groups,
        resume=args.resume,
        min_tokens=args.min_tokens,
        min_score=args.min_score,
        groups_per_pass=args.groups_per_pass,
    )
    summary["total_wall_sec"] = round(time.monotonic() - t0, 3)
    mdir = os.path.join(args.output, "_manifests")
    manifests = [json.load(open(os.path.join(mdir, f))) for f in os.listdir(mdir)]
    summary["total_rows"] = sum(m["n_rows"] for m in manifests)
    summary["total_dropped"] = sum(m["n_dropped"] for m in manifests)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
