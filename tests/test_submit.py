"""North-rule shipping path: the job must run via
`spark-submit --py-files pdfspark.zip jobs/extract_job.py` in a fresh
JVM/driver — not only inside the pytest session's SparkSession."""

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files(fixture_dir, tmp_path, spark):
    zpath = str(tmp_path / "pdfspark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "pdfspark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics")
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    # modest resources: the pytest session's local[4] JVM is also alive
    env["SPARK_GRAFT_CPUS"] = "4"
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=2g",
            "--py-files", zpath,
            # a COPY of the entrypoint outside the repo: its sys.path
            # fallback then points at tmp_path, so the pdfspark package
            # can only come from the --py-files zip
            shutil.copy(os.path.join(REPO, "jobs", "extract_job.py"),
                        str(tmp_path / "extract_job.py")),
            "--input", os.path.join(fixture_dir, "documents_in.parquet"),
            "--geom", os.path.join(fixture_dir, "spans_geom.parquet"),
            "--output", out,
            "--metrics", metrics,
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),  # NOT the repo: forces imports through the zip
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "extract_job: wrote" in r.stdout

    docs = spark.read.parquet(os.path.join(fixture_dir,
                                           "documents_in.parquet"))
    from pdfspark.sinks.snapshot import read_committed

    written = read_committed(spark, out)
    assert written is not None and written.count() == docs.count()
    m = read_committed(spark, metrics)
    assert m is not None
    assert m.groupBy().sum("doc_count").collect()[0][0] == docs.count()
