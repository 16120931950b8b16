#!/usr/bin/env python
"""Build the --py-files zip for spark-submit deployment.

Usage:
    python scripts/package_pyfiles.py [dist/gpq_tiles_spark.zip]
    spark-submit --py-files dist/gpq_tiles_spark.zip scripts/submit_convert.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "gpq_tiles_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist", "gpq_tiles_spark.zip")
    print(build(out))
