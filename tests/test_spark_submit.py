"""Deployment-shape evidence: the engine runs under ``spark-submit
--py-files crawler_spark.zip`` (BASELINE.json north_rule) with NO
checkout on the import path, and the submitted crawl is byte-identical
to the sequential oracle.

The test zips the package, copies only the job script into an empty
working directory, strips the repo from PYTHONPATH, and runs a real
``spark-submit`` subprocess — so a pass proves the zip alone carries
everything the job needs (the cluster deployment story, minus the
cluster).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(dest: str) -> str:
    """Package crawler_spark exactly as a cluster deploy would:
    ``zip -r crawler_spark.zip crawler_spark/*.py``."""
    path = os.path.join(dest, "crawler_spark.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for src in sorted(glob.glob(os.path.join(REPO, "crawler_spark", "*.py"))):
            z.write(src, os.path.join("crawler_spark", os.path.basename(src)))
    return path


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_crawl_matches_oracle(tmp_path):
    from crawler_spark.fixtures import AS_OF, fixture_dir, sequential_oracle

    fix = fixture_dir("sf0.001")  # warm the shared fixture cache
    g = sequential_oracle(fix, AS_OF)
    h = hashlib.md5()
    for d in g["documents"]:
        h.update(f"{d['seq']}|{d['url']}|".encode())
        h.update(d["text"].encode())
    expected_md5 = h.hexdigest()

    zip_path = _build_zip(str(tmp_path))
    job = os.path.join(str(tmp_path), "submit_crawl.py")
    shutil.copy(os.path.join(REPO, "BENCH", "submit_crawl.py"), job)
    state = os.path.join(str(tmp_path), "state")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "6g",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            job, "sf0.001", state,
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    lines = [
        l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")
    ]
    assert out.returncode == 0 and lines, (
        f"spark-submit failed rc={out.returncode}\n"
        f"stdout tail: {out.stdout[-2000:]}\nstderr tail: {out.stderr[-2000:]}"
    )
    res = json.loads(lines[-1].removeprefix("SUBMIT_RESULT "))
    assert res["docs"] == len(g["documents"])
    assert res["order_text_md5"] == expected_md5
