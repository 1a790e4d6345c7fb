"""Build the ``--py-files`` deployment archive (the north-rule launch shape:
``spark-submit --py-files osm2geojson_spark.zip ...`` on a multi-executor
cluster).

The engine is pure Python + NumPy/pandas — no native extensions — so the
whole package ships as one zip: every ``.py`` module plus the rulebook JSON
data files, importable directly from the archive on driver and executors
(zipimport handles both; the rulebooks are read via ``importlib.resources``
-compatible pkg loading, see functions/classify.py).

Usage: python tools/build_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str, repo_root: str = REPO_ROOT) -> str:
    pkg_root = os.path.join(repo_root, "osm2geojson_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith((".py", ".json")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, repo_root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "osm2geojson_spark.zip"
    print(build_zip(out))
