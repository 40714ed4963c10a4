"""S11 round-trip: build the --py-files zip and prove a spark-submit job
imports genesis_spark FROM THE ZIP (not the repo checkout) and parses."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

JOB = """\
import genesis_spark
assert "genesis_spark.zip" in genesis_spark.__file__, genesis_spark.__file__
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").appName("pyfiles-job")
         .getOrCreate())
from genesis_spark.functions.parse import parse_pages
df = spark.createDataFrame(
    [("http://pyfileshost.onion/p",
      "<title>t</title><p>the quick brown fox jumps over things here</p>")],
    "url string, html string")
rows = parse_pages(df).select("doc_id", "title").collect()
print("PYFILES_OK", len(rows), rows[0].title, genesis_spark.__file__,
      flush=True)
spark.stop()
"""


@pytest.mark.slow
def test_pyfiles_zip_spark_submit_roundtrip(tmp_path):
    from package import build_zip

    zip_path = build_zip(str(tmp_path / "genesis_spark.zip"))
    assert os.path.getsize(zip_path) > 10_000
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # cwd OUTSIDE the repo: genesis_spark must resolve from the zip alone
    res = subprocess.run(
        [spark_submit, "--py-files", zip_path, str(job)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    out = res.stdout + res.stderr
    assert res.returncode == 0, out[-3000:]
    assert "PYFILES_OK 1 t" in out
