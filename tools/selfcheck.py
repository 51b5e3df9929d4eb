"""Driver-mimic: run entry(), then every queries() entry at sf0.01 and
compare with oracle_sql() via DuckDB (row count + schema + order-
insensitive value hash). Usage: python tools/selfcheck.py [sf_dir]
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as E
from pdfspark.session import build_session

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = ARGS[0] if ARGS else "/root/testdata/sf0.01"
ONLY = None
SKIP_ENTRY = "--skip-entry" in sys.argv
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        # escape the join separators (and the escape char itself): span
        # text legitimately contains \x1c-\x1f control characters (the
        # adversarial trim corpus), and unescaped separators could make
        # genuinely different tables hash identical (false MATCH)
        # the NULL sentinel must be unreachable from real values: a
        # genuine string 'NULL' escapes its backslash-free form via
        # the \x00 prefix below, so it can never hash-collide with an
        # actual SQL NULL (same false-MATCH class as the separator
        # escaping)
        d[c] = d[c].map(
            lambda v: "\x00NULL"
            if v is None or (isinstance(v, float) and pd.isna(v))
            else str(v).replace("\\", "\\\\")
                       .replace("\x00", "\\u00")
                       .replace("\x1f", "\\u1f").replace("\x1e", "\\u1e")
        )
    rows = sorted("\x1f".join(r) for r in d.itertuples(index=False, name=None))
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main():
    spark = build_session(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    # the full driver-contract view list (the driver pre-registers all
    # TPC-H-ish names); THIS corpus ships only events/documents/
    # embeddings, the rest no-op via the exists guard but keep the
    # mimic faithful to the contract
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    if not SKIP_ENTRY:
        t0 = time.time()
        edf = E.entry(spark)
        n = edf.count()
        print(f"entry: OK rows={n} cols={edf.columns} ({time.time()-t0:.1f}s)")

    qs, os_ = E.queries(), E.oracle_sql()
    # oracle_sql() is the driver contract: its SQL embeds the sf0.01
    # fixture path (the driver only compares at sf0.01). When selfcheck
    # is pointed at another SF, retarget those literals to that SF's
    # fixture dir so both engines read the same aug/geom inputs.
    fix = E._fixture_dir(SF_DIR)
    if fix != E.FIX01:
        os_ = {k: v.replace(E.FIX01, fix) for k, v in os_.items()}
        # the textual retarget only works while every oracle embeds
        # the exact FIX01 literal — a differently-composed path would
        # silently keep reading sf0.01 against another SF's Spark side
        stale = [k for k, v in os_.items() if E.FIX01 in v]
        assert not stale, f"oracle SQL kept sf0.01 fixture paths: {stale}"
    if ONLY is not None:
        unknown = ONLY - qs.keys()
        if unknown:
            # a typo'd --only must not yield a vacuous '0/0 OK' exit 0
            print(f"unknown --only queries: {sorted(unknown)}")
            return 2
        qs = {k: v for k, v in qs.items() if k in ONLY}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"{name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:200]}")
            continue
        if name not in os_:
            print(f"{name}: rows-only rows={len(sdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(os_[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"{name}: ORACLE ERROR {type(ex).__name__}: {str(ex)[:200]}")
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        if not ok:
            failures.append(name)
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={sn}/{on} "
              f"cols={'=' if sc == oc else f'{sc} vs {oc}'} "
              f"hash={'=' if sh == oh else 'DIFF'} ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK; failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
