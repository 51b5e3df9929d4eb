"""Benchmark harness for the pdfspark engine.

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": 0.1, "docs_per_sec": ..., "scaling": {...}}

The ``scaling`` block evidences the north rule's N->4N criterion in
this single-node sandbox: the flagship extraction job is run on the
same input at local[8] and local[32] and we report docs/sec at both
plus efficiency = (T_8 / T_32) / 4 (1.0 = perfectly linear).
Set PDFSPARK_BENCH_SCALING=0 to skip the scaling pair.

Each query is forced end-to-end with the noop sink (full column
evaluation, no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402
from pdfspark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline subset: flagship UDF fold + the heaviest pure-SQL pipelines.
HEADLINE = [
    "ep1_extract_spans",
    "ep1_extract_sections",
    "ep3_tables_sql",
    "j3_tables_merged",
    "a1_header_footer",
    "a8_sections",
    "w1_reading_order",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _sf_value(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _flagship(spark, sf_dir: str):
    """The end-to-end extraction job the north rule describes: spans in,
    extracted span sequences + sections out (skew splitter engaged)."""
    return E.queries()["ep1_extract_spans"](spark, sf_dir)


def _run_once(master: str, shuffle: int, sf_dir: str):
    spark = build_session(master=master, shuffle_partitions=shuffle)
    try:
        n_docs = E.queries()["ep1_extract_spans"](spark, sf_dir).select(
            "doc_id"
        ).distinct().count()
        # warm the JVM + python workers once, then measure
        _force(_flagship(spark, sf_dir))
        t0 = time.time()
        _force(_flagship(spark, sf_dir))
        dt = time.time() - t0
    finally:
        spark.stop()
    return n_docs, dt


def main() -> int:
    queries = E.queries()
    timings: dict[str, float] = {}

    spark = build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    n_docs = queries["ep1_extract_spans"](spark, SF_DIR).select(
        "doc_id"
    ).distinct().count()
    for name in HEADLINE:
        if name not in queries:
            continue
        t0 = time.time()
        _force(queries[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
    spark.stop()

    total = round(sum(timings.values()), 3)
    flagship_s = timings.get("ep1_extract_spans", total)
    out = {
        "metric": "headline extraction+table pipeline wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_value(SF_DIR),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / flagship_s, 1) if flagship_s else None,
    }

    if os.environ.get("PDFSPARK_BENCH_SCALING", "1") != "0":
        nd, t8 = _run_once("local[8]", 8, SF_DIR)
        _, t32 = _run_once("local[32]", 32, SF_DIR)
        out["scaling"] = {
            "job": "ep1_extract_spans",
            "docs": nd,
            "local8_sec": round(t8, 3),
            "local8_docs_per_sec": round(nd / t8, 1),
            "local32_sec": round(t32, 3),
            "local32_docs_per_sec": round(nd / t32, 1),
            "efficiency_n_to_4n": round((t8 / t32) / 4.0, 3),
        }

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
