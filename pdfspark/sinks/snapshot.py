"""Manifest-committed append sink — the parquet stand-in for Iceberg's
snapshot commit (S9; ref append sinks src/utilities/file_util.py:58-146).

Plain ``mode("append")`` parquet has a torn-write window: a crash mid-
write leaves partial part-files that a resume anti-join then treats as
committed, losing the unfinished documents forever. Iceberg closes
this with snapshot manifests; this module reproduces that protocol in
two variants:

``protocol="rename"`` (default, any rename-atomic filesystem):

    <output>/
        _staging/<snap>/...    in-flight write (never read)
        <snap>/...             data, atomically renamed from staging
        _manifests/<snap>.manifest   commit marker, written LAST

``protocol="manifest-only"`` (object stores without atomic directory
rename — raw S3): the data stays where it was written, under
``_staging/<snap>/``, and the manifest itself lists the data file
paths. The only atomic primitive used is the single-object manifest
publish (an S3 PUT is atomic per object); ``os.rename`` of a
directory is never called.

Either way, commit = write data -> publish manifest LAST. Readers
(and resume) list ONLY manifested snapshots, so every possible crash
point is safe:

    * during the data write: garbage stays under _staging;
    * after the data is in place, before the manifest: invisible to
      readers, re-emitted by resume;
    * after the manifest: fully committed, resume skips its doc_ids.

Crashed runs leave orphans (unmanifested snapshot/staging dirs) that
resume never reads but also never reclaims; ``gc_orphans`` deletes
them at job start, with a grace period so a concurrently-committing
writer's in-flight snapshot is never swept. Consequently ``output``
must only ever be read via ``read_committed`` — a plain
``spark.read.parquet(output)`` would double-count orphans (and, under
the rename protocol, read uncommitted data).

On a real cluster, swap this module for ``format("iceberg")`` with a
catalog — the job's call sites are the only coupling.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
STAGING_DIR = "_staging"


def _publish(output: str, snap: str, files: list[str] | None = None,
             supersedes: list[str] | None = None) -> None:
    """Atomic commit marker: the LAST step of a commit. Line 1 is the
    snapshot id; any further lines are output-relative data file paths
    (the manifest-only protocol) or ``#supersedes <snap>`` directives
    (compaction: the named snapshots are replaced by this one and
    ignored by readers from this publish on). Separated out so
    crash-injection tests can fail a commit after its data write."""
    mdir = os.path.join(output, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{snap}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(snap + "\n")
        for s in supersedes or []:
            fh.write(f"#supersedes {s}\n")
        for f in files or []:
            fh.write(f + "\n")
        # durability before visibility: without the fsync a power
        # loss after os.replace can surface an EMPTY or torn
        # manifest — a "committed" snapshot whose file list is gone,
        # the one crash shape the protocol docs promise cannot happen
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(mdir, f"{snap}.manifest"))
    # fsync the directory too: the rename itself must survive power
    # loss (POSIX does not order metadata without it)
    dfd = os.open(mdir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _manifest_files(output: str, snap: str) -> list[str]:
    """Data file list recorded in a manifest ([] = rename protocol:
    the data lives under <output>/<snap>)."""
    p = os.path.join(output, MANIFEST_DIR, f"{snap}.manifest")
    with open(p, encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    # torn-write guard (belt to _publish's fsync braces): line 1 must
    # echo the snapshot id, else the manifest is corrupt — refuse to
    # read it as an empty (rename-protocol) list, which would point
    # the reader at a snapshot directory that never existed
    if not lines or lines[0] != snap:
        raise ValueError(f"corrupt manifest for snapshot {snap} "
                         f"under {output}")
    return [ln for ln in lines[1:] if ln and not ln.startswith("#")]


def _manifest_supersedes(output: str, snap: str) -> list[str]:
    """Snapshot ids this manifest's ``#supersedes`` directives replace
    ([] for ordinary append snapshots)."""
    p = os.path.join(output, MANIFEST_DIR, f"{snap}.manifest")
    with open(p, encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    return [ln.split(" ", 1)[1] for ln in lines[1:]
            if ln.startswith("#supersedes ")]


def _list_data_files(base: str, relative_to: str) -> list[str]:
    """The protocol's single definition of 'data file': every
    non-hidden, non-marker file under ``base``, as paths relative to
    ``relative_to``. Shared by the commit path (_stage_snapshot) and
    the crash-recovery path (reconcile_aux) so the two can never
    drift on what a manifest lists."""
    return sorted(
        os.path.relpath(os.path.join(d, fn), relative_to)
        for d, _sub, fns in os.walk(base)
        for fn in fns
        if fn and not fn.startswith(("_", "."))
    )


def _stage_snapshot(
    df: DataFrame, output: str, snap: str, fmt: str,
    partition_by: str | None = None, rename: bool = True,
) -> list[str] | None:
    """Write ``df`` under _staging/<snap> and either atomically rename
    into place (rename protocol; returns []) or leave it staged and
    return the output-relative data file list for the manifest
    (manifest-only protocol). Returns None (and cleans up) when the
    write produced no data files — a file-less parquet snapshot cannot
    be read back."""
    staging = os.path.join(output, STAGING_DIR, snap)
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.save(staging)
    files = _list_data_files(staging, output)
    if not files:
        shutil.rmtree(staging, ignore_errors=True)
        return None
    if rename:
        dest = os.path.join(output, snap)
        if os.path.isdir(dest):
            # only reachable with a DETERMINISTIC snap id: a prior
            # attempt crashed between this rename and its manifest
            # publish. The leftover is unmanifested (the caller checks
            # before staging), so replacing it loses nothing.
            shutil.rmtree(dest)
        os.rename(staging, dest)
        return []
    return files


def commit_append(
    df: DataFrame, output: str, fmt: str = "parquet",
    partition_by: str | None = None,
    aux: list[tuple[DataFrame, str]] | None = None,
    protocol: str = "rename",
    snap_id: str | None = None,
) -> str | None:
    """Append ``df`` to ``output`` as one atomically-committed
    snapshot; returns the snapshot id, or None for an empty ``df``
    (a resume run with nothing left to do commits nothing, like an
    Iceberg empty-append fast path).

    ``protocol`` — "rename" (default) or "manifest-only" (see module
    docstring; pick the latter for stores without atomic rename).

    ``aux`` — side tables (e.g. the lineage metrics) committed under
    the SAME snapshot id, analogous to an Iceberg multi-table commit.
    Ordering closes every crash window:

        1. stage the data snapshot (+ rename, rename protocol only)
        2. stage each aux snapshot likewise          (unmanifested)
        3. publish the DATA manifest                 <- commit point
        4. publish each aux manifest

    A crash before 3 leaves everything invisible (resume re-emits the
    documents and the orphan aux dirs are never read). A crash between
    3 and 4 leaves the aux DATA fully on disk, only its marker
    missing — ``reconcile_aux`` republishes it on the next run, so the
    lineage rows for a committed data snapshot can never be lost.

    ``snap_id`` — caller-supplied DETERMINISTIC snapshot id (must
    start with ``snap-``): the idempotent-replay hook for streaming
    foreachBatch sinks. If that id is already manifested the append is
    a no-op returning the id — a crash-replayed micro-batch commits
    exactly once. The default random id keeps batch appends
    collision-free."""
    if protocol not in ("rename", "manifest-only"):
        raise ValueError(f"unknown snapshot protocol: {protocol!r}")
    rename = protocol == "rename"
    if snap_id is not None:
        if not snap_id.startswith("snap-"):
            # gc_orphans/GC only recognize the snap- prefix; an alien
            # name would become unreclaimable invisible debris
            raise ValueError(f"snap_id must start with 'snap-': {snap_id!r}")
        if os.path.isfile(
            os.path.join(output, MANIFEST_DIR, f"{snap_id}.manifest")
        ) or snap_id in _known_snapshot_ids(output):
            # replay of a committed batch: exactly-once. The direct
            # stat is the O(1) common case; the KNOWN-id fallback
            # (live + superseded ids) covers a compaction between the
            # original commit and this replay — it deleted the
            # per-epoch manifest but recorded its id in a #supersedes
            # line, and the rows live on in the compacted snapshot;
            # re-appending would double them.
            return snap_id
    snap = snap_id or f"snap-{time.time_ns()}-{uuid.uuid4().hex[:8]}"
    files = _stage_snapshot(df, output, snap, fmt, partition_by,
                            rename=rename)
    if files is None:
        return None
    aux_staged = []
    for aux_df, aux_output in aux or []:
        af = _stage_snapshot(aux_df, aux_output, snap, "parquet",
                             rename=rename)
        if af is not None:
            aux_staged.append((aux_output, af))
    _publish(output, snap, files)
    for aux_output, af in aux_staged:
        _publish(aux_output, snap, af)
    return snap


def reconcile_aux(output: str, aux_outputs: list[str]) -> int:
    """Close the commit protocol's last crash window: for every
    manifested DATA snapshot whose aux snapshot data exists but whose
    aux manifest is missing (died between steps 3 and 4 of
    ``commit_append``), publish the aux manifest. Run at job start
    before reading any aux table. Returns the number published.

    Keys on _known_snapshot_ids, not just live manifests: a
    compaction of the DATA table between the crash and this heal
    replaced the per-snapshot manifest with a #supersedes record, but
    the staged aux data still deserves its marker — iterating only
    live ids would strand it until gc_orphans deletes the lineage of
    a committed snapshot forever."""
    n = 0
    for snap in sorted(_known_snapshot_ids(output)):
        for aux_output in aux_outputs:
            if os.path.isfile(
                os.path.join(aux_output, MANIFEST_DIR, f"{snap}.manifest")
            ):
                continue
            renamed = os.path.join(aux_output, snap)
            staged = os.path.join(aux_output, STAGING_DIR, snap)
            if os.path.isdir(renamed):
                _publish(aux_output, snap)
                n += 1
            elif os.path.isdir(staged):
                files = _list_data_files(staged, aux_output)
                if files:
                    _publish(aux_output, snap, files)
                    n += 1
    return n


def gc_orphans(output: str, grace_s: float = 3600.0) -> int:
    """Reclaim crash debris: unmanifested snapshot dirs (rename
    protocol, died between rename and publish) and unmanifested
    staging entries (either protocol, died mid-write). Returns the
    number of directories removed.

    ``grace_s`` — minimum age (mtime) before an orphan is swept, so a
    concurrent writer's snapshot that is between its data write and
    its manifest publish is never deleted. Run at job start (the
    extract job does, alongside ``reconcile_aux``); orphans are
    invisible to ``read_committed``/resume either way — GC only
    reclaims the disk."""
    committed = set(committed_snapshots(output))
    now = time.time()
    n = 0

    def sweep(base: str) -> int:
        removed = 0
        if not os.path.isdir(base):
            return 0
        for name in os.listdir(base):
            if not name.startswith("snap-") or name in committed:
                continue
            p = os.path.join(base, name)
            if not os.path.isdir(p):
                continue
            try:
                age = now - os.path.getmtime(p)
            except OSError:
                continue
            if age < grace_s:
                continue
            shutil.rmtree(p, ignore_errors=True)
            removed += 1
        return removed

    n += sweep(output)
    # manifest-only committed snapshots keep their data under
    # _staging/<snap> forever — `committed` excludes them from sweep
    n += sweep(os.path.join(output, STAGING_DIR))
    # a crash inside _publish (between opening .{snap}.tmp and the
    # os.replace) leaves a hidden tmp manifest no other path ever
    # touches — sweep those too, same grace period
    mdir = os.path.join(output, MANIFEST_DIR)
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if not (name.startswith(".") and name.endswith(".tmp")):
                continue
            p = os.path.join(mdir, name)
            try:
                if now - os.path.getmtime(p) < grace_s:
                    continue
                os.remove(p)
                n += 1
            except OSError:
                continue
    return n


def committed_snapshots(output: str) -> list[str]:
    """Manifested snapshot ids, minus any a compacted snapshot's
    ``#supersedes`` directives replace — the reader-side half of the
    compaction commit: the instant the compacted manifest publishes
    (one atomic os.replace), its inputs stop being listed, so no
    reader ever sees the rows twice."""
    mdir = os.path.join(output, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    names, superseded = _manifested_and_superseded(output)
    return [s for s in names if s not in superseded]


def _manifested_and_superseded(output: str) -> tuple[list[str], set[str]]:
    """(sorted manifested snapshot ids, ids any manifest's
    ``#supersedes`` directives name). THE one definition both the
    reader filter (committed_snapshots) and cleanup
    (_cleanup_superseded) use — they must never diverge on what
    counts as superseded."""
    mdir = os.path.join(output, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return [], set()
    names = sorted(
        m[: -len(".manifest")]
        for m in os.listdir(mdir)
        if m.endswith(".manifest")
    )
    superseded: set[str] = set()
    for s in names:
        try:
            superseded.update(_manifest_supersedes(output, s))
        except OSError:
            continue  # raced with cleanup of a superseded manifest
    return names, superseded


def _known_snapshot_ids(output: str) -> set[str]:
    """Every snapshot id that has EVER committed here: live manifests
    plus every id recorded in ``#supersedes`` directives. Compaction
    carries superseded ids forward transitively, so this set never
    shrinks — it is what idempotent replay (commit_append snap_id)
    and crash healing (reconcile_aux) key on; consulting only LIVE
    manifests would let a compaction run between commit and replay
    make a committed batch look uncommitted."""
    names, superseded = _manifested_and_superseded(output)
    return set(names) | superseded


def read_committed(
    spark: SparkSession, output: str, fmt: str = "parquet"
) -> DataFrame | None:
    """Union of all manifested snapshots, or None when nothing has
    committed yet (partial/staging data is never visible). Handles
    both protocols per snapshot: a manifest with a file list is read
    by explicit paths (basePath keeps partition-column inference);
    an empty list means the renamed <output>/<snap> directory."""
    snaps = committed_snapshots(output)
    if not snaps:
        return None
    return _union_snapshots(
        [_read_snapshot(spark, output, s, fmt) for s in snaps])


def _union_snapshots(dfs: list[DataFrame]) -> DataFrame:
    """unionByName as a balanced TREE, not a linear chain: a
    micro-batch-ingested table can hold thousands of snapshots, and a
    thousands-deep Union plan sends Catalyst analysis quadratic (or
    overflows the analyzer stack). Tree depth is log2(n) — 4k
    snapshots plan at depth 12. allowMissingColumns keeps cross-
    snapshot schema evolution readable, same as the old chain."""
    while len(dfs) > 1:
        dfs = [
            dfs[i] if i + 1 == len(dfs)
            else dfs[i].unionByName(dfs[i + 1], allowMissingColumns=True)
            for i in range(0, len(dfs), 2)
        ]
    return dfs[0]


def _read_snapshot(spark: SparkSession, output: str, snap: str,
                   fmt: str = "parquet") -> DataFrame:
    """One manifested snapshot as a DataFrame (either protocol)."""
    files = _manifest_files(output, snap)
    if files:
        base = os.path.join(output, STAGING_DIR, snap)
        return (
            spark.read.format(fmt)
            .option("basePath", base)
            .load([os.path.join(output, f) for f in files])
        )
    return spark.read.format(fmt).load(os.path.join(output, snap))


def compact_snapshots(
    spark: SparkSession, output: str, fmt: str = "parquet",
    n_files: int = 1, protocol: str = "rename",
    min_snapshots: int = 2, partition_by: str | None = None,
    lock_ttl_s: float = 3600.0,
) -> str | None:
    """Small-files maintenance: rewrite every committed snapshot into
    ONE new snapshot of ``n_files`` files and atomically supersede the
    inputs — the Iceberg ``rewrite_data_files`` analogue for this
    sink. Streaming ingest (extract_stream) commits one snapshot per
    micro-batch, so a long-running table accumulates thousands of
    tiny part-files; at corpus scale that serializes scan planning
    and wastes one task per sliver. Returns the compacted snapshot id
    (None when fewer than ``min_snapshots`` inputs exist — nothing
    worth rewriting).

    Crash-safety inherits the append protocol's shape: stage data →
    publish the compacted manifest carrying ``#supersedes`` lines for
    every input (THE commit point, one atomic os.replace) → delete
    superseded manifests, then their data. Readers before the publish
    see the inputs; after it, only the compacted snapshot
    (``committed_snapshots`` filters superseded ids) — at no instant
    both. A crash mid-cleanup leaves ignored manifests/dirs that the
    next ``compact_snapshots`` or ``gc_orphans`` reclaims. Snapshots
    committed CONCURRENTLY with the rewrite are untouched (they are
    not in the input list, so never superseded). Two compactors racing
    on the SAME inputs could double-publish (Iceberg prevents this
    with a CAS catalog); here an O_EXCL lock file under _manifests
    enforces the single-maintenance-writer rule on any filesystem
    with atomic create — a second compactor raises instead of
    corrupting, and a crashed holder's stale lock is taken over after
    ``lock_ttl_s``. (On a raw object store without atomic create,
    serialize maintenance from one scheduler instead.)"""
    if protocol not in ("rename", "manifest-only"):
        # validate BEFORE the lock and before _cleanup_superseded's
        # side effects — a bad argument must not mutate the table
        raise ValueError(f"unknown snapshot protocol: {protocol!r}")
    lock, token = _acquire_maintenance_lock(output, lock_ttl_s)
    hb_stop = _start_lock_heartbeat(lock, lock_ttl_s)
    try:
        return _compact_locked(spark, output, fmt, n_files, protocol,
                               min_snapshots, partition_by)
    finally:
        hb_stop.set()
        _release_maintenance_lock(lock, token)


def _acquire_maintenance_lock(output: str, ttl_s: float) -> tuple[str, str]:
    """O_EXCL create of _manifests/.maintenance.lock holding a unique
    owner token; raises when a FRESH lock exists (another compactor is
    live — the heartbeat keeps a live holder's mtime fresh, so only a
    genuinely dead holder ever looks stale). Stale takeover is an
    atomic os.rename to a unique tombstone: of N racers exactly the
    one whose rename succeeds proceeds, the rest loop and see the
    winner's fresh lock."""
    mdir = os.path.join(output, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, ".maintenance.lock")
    token = uuid.uuid4().hex
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, token.encode())
            os.close(fd)
            return path, token
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(path)
            except OSError:
                continue  # holder released between open and stat
            if age <= ttl_s:
                raise ValueError(
                    f"maintenance lock held on {output} "
                    f"(age {age:.0f}s <= ttl {ttl_s:.0f}s); another "
                    "compactor is running")
            tomb = path + f".takeover-{token}"
            try:
                os.rename(path, tomb)  # atomic: one racer wins
            except OSError:
                continue  # lost the takeover race; re-examine
            try:
                os.remove(tomb)
            except OSError:
                pass


def _start_lock_heartbeat(path: str, ttl_s: float):
    """Daemon thread refreshing the lock's mtime so a LIVE compaction
    outlasting ``ttl_s`` (a big table rewrite) is never mistaken for
    a crashed holder. Returns the stop event."""
    import threading

    stop = threading.Event()

    def beat():
        while not stop.wait(max(1.0, min(60.0, ttl_s / 4))):
            try:
                os.utime(path)
            except OSError:
                return  # lock gone (released/taken over): stop beating

    t = threading.Thread(target=beat, daemon=True,
                         name="pdfspark-maintenance-lock-heartbeat")
    t.start()
    return stop


def _release_maintenance_lock(path: str, token: str) -> None:
    """Remove the lock only if WE still own it (token match): after a
    TTL takeover the file belongs to someone else, and a blind remove
    would strip the new holder's mutual exclusion."""
    try:
        with open(path, encoding="utf-8") as fh:
            if fh.read().strip() != token:
                return
        os.remove(path)
    except OSError:
        pass


def _compact_locked(spark, output, fmt, n_files, protocol,
                    min_snapshots, partition_by) -> str | None:
    _cleanup_superseded(output)
    snaps = committed_snapshots(output)
    if len(snaps) < min_snapshots:
        return None
    df = _union_snapshots(
        [_read_snapshot(spark, output, s, fmt) for s in snaps])
    rename = protocol == "rename"  # validated by compact_snapshots
    snap = f"snap-{time.time_ns()}-{uuid.uuid4().hex[:8]}"
    # carry the inputs' OWN #supersedes ids forward (transitively):
    # the compacted manifest becomes the single record of every id
    # that ever committed, which the snap_id replay check and
    # reconcile_aux depend on after the per-epoch manifests are gone
    inherited: set[str] = set()
    for s in snaps:
        try:
            inherited.update(_manifest_supersedes(output, s))
        except OSError:
            pass
    # partition_by preserves a bucketed table's directory layout
    # (n_files then applies per partition dir)
    files = _stage_snapshot(df.coalesce(max(1, n_files)), output, snap,
                            fmt, partition_by=partition_by, rename=rename)
    if files is None:  # inputs were committed-but-empty
        return None
    _publish(output, snap, files,
             supersedes=sorted(set(snaps) | inherited))  # <- commit point
    _cleanup_superseded(output)
    return snap


def detect_partition_col(output: str) -> str | None:
    """Partition column of a table's committed snapshots, discovered
    from the ``name=value`` directory layout (None = unpartitioned).
    Maintenance callers use this instead of trusting a re-passed
    CLI flag: omitting the flag would silently flatten a bucketed
    table's layout on rewrite, and passing it for an unpartitioned
    table would crash mid-maintenance. Mixed layouts raise — a table
    like that needs a human."""
    cols: set[str | None] = set()
    for s in committed_snapshots(output):
        base = (os.path.join(output, s) if os.path.isdir(
            os.path.join(output, s))
            else os.path.join(output, STAGING_DIR, s))
        if not os.path.isdir(base):
            continue
        part_dirs = sorted(
            d.split("=", 1)[0] for d in os.listdir(base)
            if "=" in d and os.path.isdir(os.path.join(base, d)))
        cols.add(part_dirs[0] if part_dirs else None)
    if len(cols) > 1:
        raise ValueError(
            f"snapshots of {output} disagree on partition layout: {cols}")
    return next(iter(cols), None)


def _cleanup_superseded(output: str) -> int:
    """Reclaim snapshots a compaction replaced: manifest FIRST (it is
    already ignored by readers), then the data. The reverse order
    could leave a live manifest pointing at deleted data. Counts only
    ids that still had something on disk (compaction carries
    superseded ids forward forever, so most are long gone)."""
    mdir = os.path.join(output, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return 0
    _names, superseded = _manifested_and_superseded(output)
    n = 0
    for s in superseded:
        removed = False
        mpath = os.path.join(mdir, f"{s}.manifest")
        if os.path.isfile(mpath):
            os.remove(mpath)
            removed = True
        for p in (os.path.join(output, s),
                  os.path.join(output, STAGING_DIR, s)):
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                removed = True
        n += removed
    return n
