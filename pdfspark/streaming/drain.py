"""Shared availableNow -> memory-sink drain for the finite streaming
surfaces (windowed counts, stateful sessionization).

One place holds the leak-prevention invariant: the memory sink pins
its result set on the driver for the session lifetime, so the caller
must materialize off it (eager localCheckpoint) and ALWAYS drop the
uuid-named temp view — including when the streaming query fails,
which with the previous inline copies leaked one registered table per
failed call (awaitTermination raised before dropTempView ran).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def drain_memory_sink(
    df: DataFrame,
    prefix: str,
    output_mode: str = "append",
    transform=None,
) -> DataFrame:
    """Run `df` (a streaming frame) to completion through a memory
    sink and return the materialized result. `transform`, if given,
    maps the sink table BEFORE materialization (e.g. the stateful
    path's cumulative-snapshot dedupe), so the checkpoint holds the
    final shape only."""
    spark = df.sparkSession
    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        out = spark.table(sink)
        if transform is not None:
            out = transform(out)
        return out.localCheckpoint(eager=True)
    finally:
        try:
            q.stop()  # no-op after a clean availableNow termination
        except Exception:
            pass
        spark.catalog.dropTempView(sink)
