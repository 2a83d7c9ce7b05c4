"""Package linkedspending_spark as a --py-files zip for spark-submit.

The north rule ships the pipeline as ``spark-submit --py-files`` jobs
(reference analog: the runnable jar of `pom.xml`). Usage:

    python tools/make_pyfiles.py [out.zip]
    spark-submit --master ... --py-files out.zip run_pipeline.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "linkedspending_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "linkedspending_spark.zip"
    print(build(out))
