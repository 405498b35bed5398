"""North-rule packaging evidence: the job REALLY runs via
``spark-submit --py-files <zip>`` from a directory that does not contain
the package — the only code shipped is the zip, exactly like a cluster
submit.  (BASELINE.json: "run via spark-submit --py-files on a
multi-executor cluster".)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_pkg_zip(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "dazspark.zip")
    pkg = os.path.join(REPO, "document_automation_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_end_to_end():
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    workdir = tempfile.mkdtemp(prefix="submit_cwd_")  # NOT the repo: zip is the only source
    out = os.path.join(workdir, "docs_out")
    zpath = _build_pkg_zip(workdir)
    # the entry script itself is also shipped as a file path, as on a cluster
    job_py = os.path.join(workdir, "extract_job.py")
    shutil.copyfile(
        os.path.join(REPO, "document_automation_spark", "jobs", "extract_job.py"), job_py
    )

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            job_py,
            "--synthesize", "300",
            "--output", out,
            "--input-fingerprint", "submit-smoke",
            "--buckets", "8",
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["buckets_processed"] == 8
    assert summary["buckets_skipped"] == 0

    # the output is a readable partitioned documents table + manifest
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[2]").appName("submit-verify").getOrCreate()
    docs = spark.read.parquet(os.path.join(out, "data"))
    assert docs.count() > 0
    assert "bucket" in docs.columns and "content" in docs.columns
    manifest = spark.read.parquet(os.path.join(out, "_manifest"))
    assert manifest.count() == 8  # one accounting row per bucket
