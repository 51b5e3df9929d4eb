"""Streaming exact dedup: keep the FIRST occurrence of each
normalized-content hash across a continuously-fed documents stream —
the streaming form of dedup.exact_duplicates' keep-first contract,
and the front gate a 100 TB training-data ingest actually runs
(suppress re-crawls/re-uploads before they reach the expensive fold).

Shape: file-source stream -> foreachBatch {batch-local keep-min,
anti-join against the accumulated output, append}. The output parquet
IS the keeper state:

* within a micro-batch, the keeper is the MIN doc_id per hash (a
  groupBy, deterministic under any partitioning — a bare streaming
  ``dropDuplicates`` keeps whichever row a task saw first, which is
  run-dependent);
* across batches, first-batch-wins falls out of the anti-join against
  everything already written;
* across restarts, the file-source checkpoint keeps input
  exactly-once per FILE, and a crash between the anti-join and the
  append is self-healing: the retried batch re-runs the anti-join, so
  hashes that did land are skipped (the idempotence argument the
  batch snapshot sink makes with manifests, here bought by keying the
  state on the content hash itself).

Spark also ships a built-in stateful operator for this
(``stream.dropDuplicates(["content_hash"])``, bounded-state variant
``dropDuplicatesWithinWatermark``); it was not chosen because its
within-batch winner is nondeterministic and its state store is not
readable as a table (the keeper set here doubles as the published
dedup index downstream batch jobs anti-join against — same contract
as operators/textstats.curate_documents' exact stage).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from pdfspark.operators.dedup import normalized_text

DOCS_SCHEMA = "doc_id long, text string"


def dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all unprocessed document files (parquet, DOCS_SCHEMA)
    into the keeper table at ``out_path``; returns after the
    availableNow query terminates. Restart with the same
    ``checkpoint_dir`` to process only newly arrived files."""
    reader = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(docs_dir)

    def sink(batch_df, epoch_id: int) -> None:
        firsts = (
            batch_df
            .withColumn("content_hash",
                        F.md5(normalized_text(F.col("text"))))
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.min_by("text", "doc_id").alias("text"))
        )
        try:
            seen = batch_df.sparkSession.read.parquet(out_path).select(
                "content_hash")
        except AnalysisException:
            seen = None  # first batch ever: no keeper table yet
        if seen is not None:
            firsts = firsts.join(seen, "content_hash", "left_anti")
        (firsts.select("content_hash", "doc_id", "text")
         .write.mode("append").parquet(out_path))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
