"""Bucketed-layout sink: correctness + the no-shuffle plan property
it exists for (sinks/bucketed.py)."""

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfspark.sinks.bucketed import read_bucketed, write_bucketed  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    # count shuffle exchanges only (BroadcastExchange is not a shuffle)
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)",
                          _plan(df)))


@pytest.fixture(scope="module")
def bucketed_pair(spark, documents_in, spans_geom, tmp_path_factory):
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("buckets")
    docs = documents_in.select("doc_id", F.size("spans").alias("n_spans"))
    spans = spans_geom.select("doc_id", "page_id", "kind", "offset")
    write_bucketed(docs, "bt_docs", str(base / "docs"), n_buckets=4)
    write_bucketed(spans, "bt_spans", str(base / "spans"), n_buckets=4)
    yield spark
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_spans")


def test_bucketed_round_trip_rows(bucketed_pair, documents_in):
    from pyspark.sql import functions as F

    spark = bucketed_pair
    got = read_bucketed(spark, "bt_docs")
    want = documents_in.select("doc_id", F.size("spans").alias("n_spans"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_cobucketed_join_has_no_shuffle(bucketed_pair):
    """THE point of the layout: joining two co-bucketed tables on the
    bucket key plans zero shuffle exchanges (disable broadcast so the
    join genuinely exercises the bucketed SMJ path), while the same
    join over plain parquet reads shuffles both sides."""
    spark = bucketed_pair
    with_conf = [("spark.sql.autoBroadcastJoinThreshold", "-1"),
                 ("spark.sql.adaptive.enabled", "false")]
    old = {k: spark.conf.get(k) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        j = read_bucketed(spark, "bt_spans").join(
            read_bucketed(spark, "bt_docs"), "doc_id")
        assert _n_exchanges(j) == 0, _plan(j)
        assert j.count() > 0

        # contrast: same files read as plain parquet must shuffle
        loc_docs = spark.sql("DESCRIBE FORMATTED bt_docs").collect()
        path = next(r.data_type for r in loc_docs
                    if r.col_name.strip() == "Location")
        plain = spark.read.parquet(path.replace("file:", ""))
        j2 = read_bucketed(spark, "bt_spans").join(plain, "doc_id")
        assert _n_exchanges(j2) >= 1
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bucketed_groupby_has_no_shuffle(bucketed_pair):
    """Aggregation on the bucket key also skips its exchange — the
    partial/final HashAggregate pair collapses onto the bucketed
    distribution."""
    spark = bucketed_pair
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        g = read_bucketed(spark, "bt_spans").groupBy("doc_id").count()
        assert _n_exchanges(g) == 0, _plan(g)
        assert g.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_write_bucketed_validates(bucketed_pair, documents_in):
    with pytest.raises(ValueError, match="bucket key"):
        write_bucketed(documents_in, "bt_bad", "/tmp/x", key="nope")
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(documents_in, "bt_bad", "/tmp/x", n_buckets=0)


def test_mismatched_bucket_counts_coalesce_without_shuffle(
        spark, documents_in, spans_geom, tmp_path):
    """Bucket counts that differ by an integer multiple still join
    shuffle-free when coalesceBucketsInJoin is on (Spark coalesces
    the 8-bucket side down to 4) — the escape hatch when two
    pipelines picked different bucket counts for the same key."""
    from pyspark.sql import functions as F

    docs = documents_in.select("doc_id", F.size("spans").alias("n_spans"))
    spans = spans_geom.select("doc_id", "offset")
    write_bucketed(docs, "bt_docs4", str(tmp_path / "d4"), n_buckets=4)
    write_bucketed(spans, "bt_spans8", str(tmp_path / "s8"), n_buckets=8)
    confs = [("spark.sql.autoBroadcastJoinThreshold", "-1"),
             ("spark.sql.adaptive.enabled", "false"),
             ("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")]
    old = {k: spark.conf.get(k, None) for k, _ in confs}
    try:
        for k, v in confs:
            spark.conf.set(k, v)
        j = read_bucketed(spark, "bt_spans8").join(
            read_bucketed(spark, "bt_docs4"), "doc_id")
        assert _n_exchanges(j) == 0, _plan(j)
        assert j.count() > 0
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS bt_docs4")
        spark.sql("DROP TABLE IF EXISTS bt_spans8")
