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


def commit_append(
    df: DataFrame, output: str, fmt: str = "parquet",
    partition_by: str | None = None,
) -> str | None:
    """Append ``df`` to ``output`` as one atomically-committed
    snapshot; returns the snapshot id, or None for an empty ``df``
    (a file-less parquet snapshot cannot be read back — e.g. a resume
    run with nothing left to do commits nothing, like an Iceberg
    empty-append fast path)."""
    snap = f"snap-{time.time_ns()}-{uuid.uuid4().hex[:8]}"
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
        return None
    final = os.path.join(output, snap)
    os.rename(staging, final)
    _publish(output, snap)
    return snap


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
