"""spark-submit --py-files round-trip (north_rule: the build must run via
spark-submit with the library shipped as a zip, i.e. executors import from
--py-files, not from a checkout). Runs from a neutral cwd so nothing
resolves against the repo directory by accident."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_build_and_query():
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert os.path.exists(zip_path)

    with tempfile.TemporaryDirectory() as tmp:
        out_dir = os.path.join(tmp, "idx")
        proc = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "build_job.py"),
                "--synth", "2000",
                "--out", out_dir,
                "--query", "w00001 needle03",
            ],
            capture_output=True, text=True, cwd=tmp, timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        # the JSON line is the last stdout line that parses
        result = None
        for line in reversed(proc.stdout.splitlines()):
            try:
                result = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        assert result is not None, proc.stdout[-2000:]
        assert result["num_docs"] == 2000
        assert result["master"] == "local[4]"
        assert len(result["hits"]) > 0
        # all 8 index tables committed
        assert os.path.exists(os.path.join(out_dir, "postings", "_MANIFEST.json"))
