"""End-to-end spark-submit --py-files deployment test.

The north_rule's deploy story is `spark-submit --py-files fgcspark.zip`
on a multi-executor cluster. This test proves the artifact path works:
it builds the zip with scripts/make_pyfiles.py, then runs spark-submit
from a scratch cwd (so the repo checkout is NOT importable — the zip is
the only source of the package) with a driver that executes the
scan -> extract -> project -> tile workhorse, exercising the Arrow UDF
on executor threads that must also import fgcspark from the zip.
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

DRIVER = """
import json
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("fgcspark-submit-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import fgcspark  # must come from --py-files, not a checkout
from fgcspark.pipeline import pages_to_points

df = pages_to_points(spark, "{data}")
n = df.count()
cells = df.select("cell_10km").distinct().count()
print("RESULT " + json.dumps({{"rows": n, "cells": cells, "src": fgcspark.__file__}}))
spark.stop()
"""


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark

        cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
        if cand.exists():
            return str(cand)
    except ImportError:
        pass
    return None


def test_spark_submit_pyfiles(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.remove(str(REPO / "scripts"))

    zip_path = build(tmp_path / "fgcspark.zip")
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER.format(data=str(REPO / "data" / "sf0.001")))
    env = dict(os.environ)
    # scrub the repo off every import path: the zip must be the only source
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", str(zip_path), str(driver)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, proc.stdout[-2000:]
    res = json.loads(line[0][len("RESULT "):])
    assert res["rows"] == 2000
    assert res["cells"] == 1438  # distinct cell_10km in the sf0.001 truth
    # the package really was imported out of the shipped archive
    assert "fgcspark.zip" in res["src"] or str(tmp_path) in res["src"]
