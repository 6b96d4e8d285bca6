"""North_rule packaging check: the job runs via ``spark-submit --py-files``.

The package is zipped, the job file is copied OUTSIDE the repo, and
spark-submit runs from a neutral cwd — so every ``pdf_extraction_spark``
import (driver side and inside the Python workers) must resolve from the
shipped zip, exactly as on a real cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(zip_path: str) -> None:
    pkg = os.path.join(REPO, "pdf_extraction_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    zip_path = str(tmp_path / "pdf_extraction_spark.zip")
    _zip_package(zip_path)

    job = str(tmp_path / "extract_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "extract.py"), job)

    pages = str(tmp_path / "pages.parquet")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "fixtures", "gen.py"), pages, "80"],
        check=True, cwd=REPO,
    )

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing but the zip may provide the package
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            job,
            "--input", pages,
            "--output", out_dir,
            "--groups", "2",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["committed"] == [0, 1]
    assert summary["total_rows"] == 80
    # output + per-group manifests (lineage) landed
    manifests = os.listdir(os.path.join(out_dir, "_manifests"))
    assert sorted(manifests) == ["group-0.json", "group-1.json"]
