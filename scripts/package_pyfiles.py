"""Build the --py-files artifact for cluster submission.

Produces a zip of the pure-Python ``logmetrics_spark`` package suitable
for ``spark-submit --py-files logmetrics_spark.zip jobs/run_pipeline.py
...`` — the deployment mode for multi-executor runs. The package keeps
zero ``__file__``-relative resource loading, so zipimport on executors
is sufficient (verified by ``tests/test_pyfiles.py``).

Usage: python scripts/package_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "logmetrics_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "logmetrics_spark.zip"
    print(build(out))
