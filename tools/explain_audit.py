"""Plan-hygiene audit: for every queries() entry, summarize the
physical plan — join strategies, exchange count, pushed filters,
Python-UDF stages — so shuffle regressions are visible per round.

Usage: python tools/explain_audit.py [sf_dir] [name1,name2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from pdfspark.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

# streaming queries execute on construction — skip in a static audit
SKIP = {"s8_stream_windowed", "s8_stream_sessionize"}


def main() -> int:
    spark = build_session(master="local[4]", shuffle_partitions=4)
    rows = []
    for name, fn in E.queries().items():
        if name in SKIP or (ONLY and name not in ONLY):
            continue
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:
            rows.append((name, f"ERROR {type(ex).__name__}"))
            continue
        pushed = sum(
            1 for ln in plan.splitlines()
            if "PushedFilters" in ln and "PushedFilters: []" not in ln
        )
        summary = (
            f"bhj={plan.count('BroadcastHashJoin')} "
            f"bnlj={plan.count('BroadcastNestedLoopJoin')} "
            f"smj={plan.count('SortMergeJoin')} "
            f"exch={plan.count('Exchange')} "
            f"pyarrow={plan.count('MapInPandas') + plan.count('FlatMapGroupsInPandas')} "
            f"pushed={pushed}"
        )
        rows.append((name, summary))
    spark.stop()
    w = max((len(n) for n, _ in rows), default=0)
    for name, summary in rows:
        print(f"{name:<{w}}  {summary}")
    bad = [n for n, s in rows if s.startswith("ERROR")]
    print(f"\n{len(rows) - len(bad)}/{len(rows)} plans built; errors: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
