"""Build dist/bwc_pyfiles.zip for spark-submit --py-files.

Zips the bravewebcrawler_spark package (source only, no tests/caches) so
executors' Python workers can import the engine without a repo checkout —
the standard PySpark deployment unit for a multi-executor cluster.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "bravewebcrawler_spark")
OUT = os.path.join(REPO, "dist", "bwc_pyfiles.zip")


def build(out: str = OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    print(build())
