"""Manifest-committed append sink — the parquet stand-in for Iceberg's
snapshot commit (S9; ref append sinks src/utilities/file_util.py:58-146).

Plain ``mode("append")`` parquet has a torn-write window: a crash mid-
write leaves partial part-files that a resume anti-join then treats as
committed, losing the unfinished documents forever. Iceberg closes
this with snapshot manifests; this module reproduces that protocol on
any rename-atomic filesystem:

    <output>/
        _staging/<snap>/...    in-flight write (never read)
        <snap>/...             data, atomically renamed from staging
        _manifests/<snap>.manifest   commit marker, written LAST

Commit = write staging -> atomic dir rename -> atomic manifest
publish (tmp + os.replace). Readers (and resume) list ONLY manifested
snapshots, so every possible crash point is safe:

    * during the data write: garbage stays under _staging;
    * after rename, before manifest: the snapshot dir exists but is
      unmanifested — invisible to readers, re-emitted by resume;
    * after manifest: fully committed, resume skips its doc_ids.

On a real cluster, swap this module for ``format("iceberg")`` with a
catalog — the job's call sites are the only coupling. Object stores
without atomic rename (raw S3) need the manifest-only variant: skip
the rename and list data paths inside the manifest instead.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
STAGING_DIR = "_staging"


def _publish(output: str, snap: str) -> None:
    """Atomic commit marker: the LAST step of a commit. Separated out
    so crash-injection tests can fail a commit after its data write."""
    mdir = os.path.join(output, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{snap}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(snap + "\n")
    os.replace(tmp, os.path.join(mdir, f"{snap}.manifest"))


def _stage_snapshot(
    df: DataFrame, output: str, snap: str, fmt: str,
    partition_by: str | None = None,
) -> bool:
    """Write ``df`` under _staging/<snap> and atomically rename into
    place (still unmanifested). Returns False (and cleans up) when the
    write produced no data files — a file-less parquet snapshot cannot
    be read back."""
    staging = os.path.join(output, STAGING_DIR, snap)
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.save(staging)
    has_data = any(
        fn and not fn.startswith(("_", "."))
        for _dir, _sub, files in os.walk(staging)
        for fn in files
    )
    if not has_data:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        return False
    os.rename(staging, os.path.join(output, snap))
    return True


def commit_append(
    df: DataFrame, output: str, fmt: str = "parquet",
    partition_by: str | None = None,
    aux: list[tuple[DataFrame, str]] | None = None,
) -> str | None:
    """Append ``df`` to ``output`` as one atomically-committed
    snapshot; returns the snapshot id, or None for an empty ``df``
    (a resume run with nothing left to do commits nothing, like an
    Iceberg empty-append fast path).

    ``aux`` — side tables (e.g. the lineage metrics) committed under
    the SAME snapshot id, analogous to an Iceberg multi-table commit.
    Ordering closes every crash window:

        1. stage + rename the data snapshot      (unmanifested)
        2. stage + rename each aux snapshot      (unmanifested)
        3. publish the DATA manifest             <- commit point
        4. publish each aux manifest

    A crash before 3 leaves everything invisible (resume re-emits the
    documents and the orphan aux dirs are never read). A crash between
    3 and 4 leaves the aux DATA fully on disk, only its marker
    missing — ``reconcile_aux`` republishes it on the next run, so the
    lineage rows for a committed data snapshot can never be lost."""
    snap = f"snap-{time.time_ns()}-{uuid.uuid4().hex[:8]}"
    if not _stage_snapshot(df, output, snap, fmt, partition_by):
        return None
    aux_staged = []
    for aux_df, aux_output in aux or []:
        if _stage_snapshot(aux_df, aux_output, snap, "parquet"):
            aux_staged.append(aux_output)
    _publish(output, snap)
    for aux_output in aux_staged:
        _publish(aux_output, snap)
    return snap


def reconcile_aux(output: str, aux_outputs: list[str]) -> int:
    """Close the commit protocol's last crash window: for every
    manifested DATA snapshot whose aux snapshot directory exists but
    whose aux manifest is missing (died between steps 3 and 4 of
    ``commit_append``), publish the aux manifest. Run at job start
    before reading any aux table. Returns the number published."""
    n = 0
    for snap in committed_snapshots(output):
        for aux_output in aux_outputs:
            if os.path.isdir(os.path.join(aux_output, snap)) and not (
                os.path.isfile(
                    os.path.join(
                        aux_output, MANIFEST_DIR, f"{snap}.manifest"
                    )
                )
            ):
                _publish(aux_output, snap)
                n += 1
    return n


def committed_snapshots(output: str) -> list[str]:
    mdir = os.path.join(output, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        m[: -len(".manifest")]
        for m in os.listdir(mdir)
        if m.endswith(".manifest")
    )


def read_committed(
    spark: SparkSession, output: str, fmt: str = "parquet"
) -> DataFrame | None:
    """Union of all manifested snapshots, or None when nothing has
    committed yet (partial/staging data is never visible)."""
    snaps = committed_snapshots(output)
    if not snaps:
        return None
    out = None
    for s in snaps:
        df = spark.read.format(fmt).load(os.path.join(output, s))
        out = df if out is None else out.unionByName(
            df, allowMissingColumns=True
        )
    return out
