#!/usr/bin/env python
"""Package nlp4l_spark into dist/nlp4l_spark.zip for spark-submit --py-files.

Pure-stdlib (zipfile) so it runs anywhere; excludes caches. The zip layout
is import-ready: nlp4l_spark/... at the archive root.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "nlp4l_spark")
DIST = os.path.join(REPO, "dist")
OUT = os.path.join(DIST, "nlp4l_spark.zip")


def main() -> str:
    os.makedirs(DIST, exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
