"""S9/S10 sink path: jobs/extract_job.main() end-to-end — append
write, bucket layout, metrics table, and exactly-once --resume."""

import os

import pytest

from jobs.extract_job import main

N_BUCKETS = 4


@pytest.fixture(scope="module")
def job_paths(spark, fixture_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("extract_job")
    paths = dict(
        input=os.path.join(fixture_dir, "documents_in.parquet"),
        geom=os.path.join(fixture_dir, "spans_geom.parquet"),
        output=str(d / "out"),
        metrics=str(d / "metrics"),
    )
    rc = main([
        "--input", paths["input"], "--geom", paths["geom"],
        "--output", paths["output"], "--metrics", paths["metrics"],
        "--buckets", str(N_BUCKETS),
    ])
    assert rc == 0
    return paths


def test_job_writes_every_doc_once(spark, job_paths):
    docs = spark.read.parquet(job_paths["input"])
    out = spark.read.parquet(job_paths["output"])
    assert out.count() == docs.count()
    in_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    out_ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert out_ids == in_ids


def test_job_bucket_layout(job_paths):
    buckets = sorted(
        e for e in os.listdir(job_paths["output"]) if e.startswith("bucket=")
    )
    assert 1 <= len(buckets) <= N_BUCKETS
    assert all(e.split("=")[1].isdigit() for e in buckets)


def test_job_metrics_rows(spark, job_paths):
    docs = spark.read.parquet(job_paths["input"])
    m = spark.read.parquet(job_paths["metrics"])
    assert {"partition_id", "doc_count", "bytes_in", "spans_out", "wall_ms"} \
        <= set(m.columns)
    agg = m.groupBy().sum("doc_count").collect()[0][0]
    assert agg == docs.count()
    assert all(r.wall_ms >= 0 for r in m.collect())


def test_job_resume_is_exactly_once(spark, job_paths):
    """Second run with --resume must add zero documents (anti-join
    against the committed snapshot) while appending metrics."""
    docs = spark.read.parquet(job_paths["input"])
    before = spark.read.parquet(job_paths["output"]).count()
    rc = main([
        "--input", job_paths["input"], "--geom", job_paths["geom"],
        "--output", job_paths["output"], "--metrics", job_paths["metrics"],
        "--buckets", str(N_BUCKETS), "--resume",
    ])
    assert rc == 0
    out = spark.read.parquet(job_paths["output"])
    assert out.count() == before == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_job_resume_on_missing_output_runs_full(spark, job_paths,
                                                tmp_path):
    """--resume against a not-yet-existing output path must fall back
    to a full run (PATH_NOT_FOUND swallowed), not fail."""
    fresh = str(tmp_path / "fresh_out")
    rc = main([
        "--input", job_paths["input"], "--geom", job_paths["geom"],
        "--output", fresh, "--resume",
    ])
    assert rc == 0
    docs = spark.read.parquet(job_paths["input"])
    assert spark.read.parquet(fresh).count() == docs.count()


def test_job_json_sink_roundtrip(spark, job_paths, tmp_path):
    """S9/S10: --format json writes append-mode JSON-lines (the
    reference's JSON sinks) that read back complete, and --resume
    stays exactly-once on the JSON output too."""
    out = str(tmp_path / "json_out")
    rc = main([
        "--input", job_paths["input"], "--geom", job_paths["geom"],
        "--output", out, "--format", "json",
    ])
    assert rc == 0
    docs = spark.read.parquet(job_paths["input"])
    j = spark.read.json(out)
    assert j.count() == docs.count()
    assert {"doc_id", "status"} <= set(j.columns)
    rc = main([
        "--input", job_paths["input"], "--geom", job_paths["geom"],
        "--output", out, "--format", "json", "--resume",
    ])
    assert rc == 0
    assert spark.read.json(out).count() == docs.count()
