"""Shared parquet file-source construction for the streaming surface.

One subtlety concentrated here: ``pathGlobFilter`` matches LEAF file
names. The original per-module default — glob = basename of the input
path — silently matched nothing when the input was a directory-shaped
parquet dataset (the standard Spark output layout: a directory of
part-*.parquet files whose basenames never equal the directory name),
draining an empty stream with no error. Directories therefore stream
with a ``*.parquet`` glob over the directory itself; single files keep
the exact-basename filter over their parent (so unrelated siblings are
not picked up).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def parquet_stream(
    spark: SparkSession,
    events_path: str,
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a parquet file OR directory dataset.

    The schema is taken from a batch read of the same path (a
    streaming file source requires an explicit schema). Flat
    directory datasets only — hive-partitioned (key=value subdir)
    layouts need an explicit ``path_glob`` plus recursive lookup,
    which this surface does not cover."""
    schema = spark.read.parquet(events_path).schema
    if os.path.isdir(events_path):
        base, glob = events_path, (path_glob or "*.parquet")
    else:
        base, glob = (
            os.path.dirname(events_path),
            (path_glob or os.path.basename(events_path)),
        )
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.parquet(base)
