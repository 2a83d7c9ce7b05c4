"""End-to-end spark-submit --py-files smoke test (north-rule ship shape).

Builds the package zip with tools/make_pyfiles.py, then launches the
pipeline via a real ``spark-submit`` process with ``--py-files`` — the
package must NOT be importable from the working directory, proving the
zip is what executors and the driver import.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.executable), "spark-submit"
)


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)), reason="no spark-submit"
)
def test_spark_submit_pyfiles_pipeline(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "linkedspending_spark.zip"))
    # copy the entry script OUT of the repo so the package can only come
    # from --py-files
    script = tmp_path / "run_pipeline.py"
    script.write_text(open(os.path.join(REPO, "run_pipeline.py")).read())

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            str(script),
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", str(tmp_path / "triples"),
            "--manifests", str(tmp_path / "manifests"),
            "--buckets", "8",
            "--no-mentions",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    report = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["state"] == "FINISHED"
    assert report["converted_triples"] > 0
    # data actually landed
    assert any(
        f.endswith(".parquet")
        for _r, _d, fs in os.walk(tmp_path / "triples")
        for f in fs
    )
