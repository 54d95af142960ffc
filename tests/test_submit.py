"""End-to-end `spark-submit --py-files` smoke (the north rule's deployment
shape): package the library with tools/package.py, then run a job in a fresh
spark-submit process that imports geowave_spark ONLY from the shipped zip —
proving the zip is self-contained (no repo path, no data files needed for
the library layer)."""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

JOB = '''
import sys
assert not any("repo" in p for p in sys.path if p), sys.path
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from geowave_spark.operators.indexing import with_point_cells
pts = spark.createDataFrame(
    [(f"p{i}", -120.0 + i * 0.01, 30.0 + (i % 70) * 0.01) for i in range(2000)],
    "fid string, lon double, lat double",
)
idx = with_point_cells(pts, cell_col="cell")
print(f"SUBMIT_OK distinct_cells={idx.select('cell').distinct().count()}")
spark.stop()
'''


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_zip(tmp_path):
    zip_path = tmp_path / "geowave_spark.zip"
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "package.py"), str(zip_path)],
        check=True,
        capture_output=True,
    )
    job = tmp_path / "job.py"
    job.write_text(JOB)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[2]",
            "--py-files",
            str(zip_path),
            str(job),
        ],
        cwd=tmp_path,  # not the repo: the zip must stand alone
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SUBMIT_OK distinct_cells=2000" in proc.stdout
