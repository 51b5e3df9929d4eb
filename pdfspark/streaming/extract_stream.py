"""Streaming extraction ingest (north-rule resumability, streaming
form): payload files arriving in a directory are decoded and folded
continuously — binaryFile file-source stream -> Arrow decode
(quarantine on corrupt bytes) -> salted exact fold -> append parquet
sink with a checkpoint.

The file source's checkpoint gives exactly-once per input FILE: a
restart (same checkpoint dir) skips every payload already committed
and processes only newly arrived files — the streaming analogue of
jobs/extract_job.py's snapshot-resume anti-join, and what a
continuously-fed 100 TB ingest actually runs (`availableNow` drains
the backlog and stops; drop the trigger for continuous micro-batches).

All the heavy lifting reuses the batch operators: decode_payloads
(sources/binary_decode.py) and the _fold_batches mapInPandas fold
(operators/extract.py) run unchanged on the streaming DataFrame —
Structured Streaming's incremental planner handles the rest. No
stateful operator is involved (each document folds independently), so
there is no watermark and no state store to size.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pdfspark.config import ExtractConfig
from pdfspark.operators.extract import EXTRACT_FULL, _fold_batches
from pdfspark.sources.binary_decode import decode_payloads


def extract_payload_stream(
    spark: SparkSession,
    payload_dir: str,
    out_path: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = ExtractConfig(),
    max_files_per_trigger: int | None = None,
    metrics_path: str | None = None,
    snapshot_output: bool = False,
    path_glob: str = "*.{bin,pdf}",
    commit_protocol: str = "rename",
) -> None:
    """Drain all unprocessed payload files into the parquet sink;
    returns after the availableNow query terminates.

    With `metrics_path` the query runs through foreachBatch so each
    micro-batch also appends its per-partition lineage rows
    (partition_id, doc_count, bytes_in, spans_out, wall_ms, plus the
    batch epoch) to the metrics table — the north rule's lineage
    contract on the streaming ingest. The file-source checkpoint keeps
    input exactly-once per file; plain-append output (default) is
    at-least-once on crash-during-write (standard Structured Streaming
    semantics — dedupe by doc_id downstream or let the batch job's
    resume anti-join reconcile).

    ``snapshot_output=True`` upgrades the OUTPUT to exactly-once: each
    micro-batch commits through the manifest-snapshot protocol
    (``commit_protocol``: "rename" or "manifest-only" — same semantics
    as the batch sink) under a
    DETERMINISTIC id derived from (epoch, input-file list), so a
    crash-replayed batch finds its manifest and no-ops instead of
    appending twice (the idempotent-foreachBatch pattern). Lineage
    commits as an aux table under the same id; a crash between the two
    publishes is healed by reconcile_aux at the next start. Read the
    table via read_committed (never plain spark.read.parquet), and run
    ``extract_job --compact`` periodically — per-micro-batch snapshots
    are exactly the small-files debt compaction exists for. Output and
    checkpoint must be wiped together (the contract the file-source
    checkpoint already imposes)."""
    reader = (
        spark.readStream.format("binaryFile")
        # the binaryFile format's fixed schema, required explicitly for
        # a streaming source
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        # brace glob (Hadoop GlobFilter): raw %PDF corpora arrive as
        # .pdf, the fixture stand-ins as .bin — a single-extension
        # default silently ignored half the real arrivals
        .option("pathGlobFilter", path_glob)
    )
    if max_files_per_trigger is not None:
        # NOT a truthiness test: an explicit 0 must reach Spark
        # (which rejects it) rather than silently meaning "no limit"
        # — the opposite of the throttle the caller asked for
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    bin_stream = reader.load(payload_dir)

    # a payload that failed decode carries an empty span list; give it
    # the DecodeError marker span so the fold lands it in the same F4
    # quarantine state the batch path uses (status='quarantined')
    err_span = F.array(
        F.struct(
            F.lit("DecodeError").alias("kind"),
            F.lit("corrupt payload").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )
    )
    from pdfspark.operators.extract import _with_hf, lineage_table

    # BOTH modes sink through foreachBatch plain appends. The earlier
    # split — streaming file sink without metrics, foreachBatch with —
    # wrote incompatible layouts to the same out_path: the file sink's
    # _spark_metadata log makes batch reads list only log-registered
    # files, silently hiding anything a later foreachBatch run
    # appended. One layout means checkpointed restarts can switch
    # metrics on/off freely; output is at-least-once on
    # crash-during-write either way (input stays exactly-once per file
    # via the source checkpoint) — dedupe by doc_id downstream or let
    # the batch job's resume anti-join reconcile.
    #
    # Decode + fold run INSIDE foreachBatch, on the raw binary batch:
    # lineage bytes_in must report the PAYLOAD size for quarantined
    # docs (not len('corrupt payload')), which needs the decoded
    # frame's bytes_len joined back to the folded rows — as a
    # streaming-plan self-join that would be a watermark-requiring
    # stream-stream join; batch-side it is a plain equi-join.
    def sink(batch_df, epoch_id: int) -> None:
        decoded = decode_payloads(batch_df).localCheckpoint(eager=True)
        # the stream has no geometry side input: _with_hf(df, None)
        # is the batch fold's own empty-header/footer defaulting
        # seam, reused so the two paths cannot drift
        docs = _with_hf(
            decoded.withColumn(
                "spans",
                F.when(F.col("status") == "ok",
                       F.col("spans")).otherwise(err_span),
            ),
            None,
        )
        folded = docs.repartition(F.xxhash64("doc_id")).mapInPandas(
            _fold_batches(cfg), EXTRACT_FULL
        )
        # one row per doc_id on the bytes side: two payload files in a
        # micro-batch can declare the same doc_id (e.g. two versions
        # arriving together), and a raw row-level join would fan out
        # |payloads|^2 rows per colliding doc into the committed output.
        # Each colliding payload still folds to its own output row
        # (the documented dedupe-by-doc_id-downstream contract); its
        # quarantine lineage reports the doc's total payload bytes.
        folded = folded.join(
            decoded.groupBy("doc_id").agg(
                F.sum(F.col("bytes_len").cast("long"))
                .alias("payload_bytes")),
            "doc_id",
        ).withColumn(
            "bytes_in",
            F.when(F.col("status") == "quarantined",
                   F.col("payload_bytes")).otherwise(F.col("bytes_in")),
        ).drop("payload_bytes")
        write_metrics = metrics_path is not None
        if write_metrics:
            folded.persist()
        try:
            out_rows = folded.select("doc_id", "status", "spans",
                                     "spans_in", "spans_out")
            if snapshot_output:
                import hashlib

                from pdfspark.sinks.snapshot import commit_append

                # deterministic id: a replayed epoch re-reads the SAME
                # file set (recorded in the source commit log), so the
                # path digest matches and the commit no-ops; a fresh
                # checkpoint over a grown input dir yields a new digest
                # even at the same epoch number. Paths only — a
                # driver-sized collect bounded by maxFilesPerTrigger.
                paths = sorted(r.path for r in
                               batch_df.select("path").collect())
                digest = hashlib.md5(
                    "\n".join(paths).encode("utf-8")).hexdigest()[:12]
                aux = None
                if write_metrics:
                    aux = [(lineage_table(folded)
                            .withColumn("epoch_id",
                                        F.lit(epoch_id).cast("long")),
                            metrics_path)]
                commit_append(out_rows, out_path, aux=aux,
                              protocol=commit_protocol,
                              snap_id=f"snap-epoch{epoch_id:09d}-{digest}")
            else:
                out_rows.write.mode("append").parquet(out_path)
                if write_metrics:
                    (lineage_table(folded)
                     .withColumn("epoch_id", F.lit(epoch_id).cast("long"))
                     .write.mode("append").parquet(metrics_path))
        finally:
            if write_metrics:
                folded.unpersist()

    if snapshot_output:
        # the batch job's _prepare_output preamble, streaming form:
        # heal the data-manifested / aux-unmanifested crash window a
        # prior run may have left (the replay no-ops on the data side,
        # so only this pass can republish the aux marker), then
        # reclaim unmanifested crash debris — this IS the advertised
        # scheduled-drain loop, so without the GC here a driver killed
        # mid micro-batch leaks staging dirs forever
        import os as _os

        from pdfspark.sinks.snapshot import gc_orphans, reconcile_aux

        if metrics_path is not None:
            reconcile_aux(out_path, [metrics_path])
        for tgt in [out_path] + ([metrics_path] if metrics_path else []):
            if _os.path.isdir(tgt):
                gc_orphans(tgt)

    q = (
        bin_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
