"""End-to-end spark-submit --py-files evidence (north rule: "ships via
spark-submit --py-files on a multi-executor cluster"): a real
spark-submit subprocess, package resolved ONLY from the shipped zip
(cwd is a scratch dir, no repo on sys.path), local[4] standing in for
the cluster master URL."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    sys.path.insert(0, REPO)
    from kg_covid_19_spark.session import package_zip

    zip_path = package_zip()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: the package must ship in the zip
        env=env,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = next(
        l for l in out.stdout.splitlines() if l.startswith("KG_SUBMIT_RESULT ")
    )
    got = json.loads(line.split(" ", 1)[1])
    assert got["shipped_via"] == "--py-files"
    assert got["n_nodes"] > 0 and got["n_edges"] > 0
