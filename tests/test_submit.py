"""End-to-end ``spark-submit --py-files`` deployment test (the north-rule
launch shape: the engine ships as a single zip to a fresh JVM/driver that has
no repo on its path, and the CLI conversion must still be byte-exact).

One subprocess = one cold JVM (~30 s); kept to a single test.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

from .conftest import DATA_DIR, read_json

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    try:
        from build_pyfiles import build_zip
    finally:
        sys.path.pop(0)

    zip_path = build_zip(str(tmp_path / "osm2geojson_spark.zip"))
    # the entry script runs from tmp_path: its directory does NOT contain
    # the package, so the import can only be satisfied by the --py-files zip
    script = shutil.copy(os.path.join(REPO_ROOT, "tools", "submit_cli.py"), tmp_path)
    out = tmp_path / "way.geojson"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(script),
            os.path.join(DATA_DIR, "way.osm"),
            str(out),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert json.load(open(out)) == read_json("way.geojson")
