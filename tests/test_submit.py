"""The package ships as `spark-submit --py-files` (north-star deploy mode).

Builds the dcs.zip artifact exactly as README documents, then runs a real
`spark-submit` child process from a NON-repo working directory — proving the
engine has no hidden dependence on repo-root files or PYTHONPATH, and that
Python workers can import the shipped zip (the failure mode a unit test
can't catch: executors deserialize UDF closures in their own interpreters).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .appName("submit_smoke").getOrCreate())

# an Arrow mapInPandas stage forces WORKER-side import of the shipped zip
from dataset_crawler_spark.operators.seen import bloom_build, BloomParams
from dataset_crawler_spark.functions.urls import canonicalize_url

urls = spark.range(1000).select(
    F.concat(F.lit("HTTP://Example.org:80/p/"), F.col("id").cast("string"),
             F.lit("?utm_source=x&q=1")).alias("url"))
canon = urls.select(canonicalize_url(F.col("url")).alias("url_c"))
params = BloomParams.for_capacity(1000, fp_rate=0.01, n_shards=2)
bloom = bloom_build(canon, "url_c", params)
n = bloom.count()
assert n == params.n_shards, f"expected {params.n_shards} shards, got {n}"
one = canon.limit(1).collect()[0].url_c
# lowercased scheme+host, default port stripped, query params sorted
assert one == "http://example.org/p/0?q=1&utm_source=x", one
print("SUBMIT_SMOKE_OK")
spark.stop()
"""


def test_spark_submit_pyfiles_smoke(tmp_path):
    import pyspark

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("no spark-submit available")

    zip_path = str(tmp_path / "dcs.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "dataset_crawler_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))

    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path, str(driver)],
        cwd=str(tmp_path),  # NOT the repo root — the zip must be self-sufficient
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SUBMIT_SMOKE_OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-1000:]
