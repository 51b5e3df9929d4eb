"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/featurized in Arrow-batched pandas via mapInPandas.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (`_fake_decode`) — the Spark-side
plumbing (binary schema, partitioning, mapInPandas batch shape,
output schema) is real and tested. Swap `_fake_decode` for a PIL /
ffmpeg call in production; nothing else changes.

Scale shape: mapInPandas streams Arrow batches through the Python
worker — no collect, no per-row Python; batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so a partition of large
blobs cannot OOM the worker. Heavy media should be
repartition(hash(media_ref)) first so decode cost spreads evenly.

Reference basis: Figure/Image layout elements carry media geometry
(src/processors/element_processors.py:380-391); our media table is
their payload-bearing analogue per BASELINE.json (media_ref spans).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("status", StringType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Derive an opaque-binary media table from the documents table
    (deterministic fake payload = utf-8 bytes of the text): one media
    row per document, media_ref = 'img://<doc_id>'."""
    return docs.select(
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        ),
        F.lit("image").alias("media_kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB: stands in for a real image decode (no codecs in this
    container). Deterministic: dimensions derived from the payload
    hash. Replace with PIL.Image.open in production."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 640, 16 + h[1] % 480


def media_features(media: DataFrame) -> DataFrame:
    """Featurize media payloads with mapInPandas (Arrow batches).

    Errors never kill the stage: a failed decode yields
    status='decode_error' with null dimensions (quarantine column,
    mirroring the extraction pipeline's DecodeError handling).
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["content"]
            ):
                b = bytes(payload) if payload is not None else b""
                try:
                    w, h = _fake_decode(b)
                    rows.append(
                        (ref, kind, len(b), hashlib.md5(b).hexdigest(),
                         w, h, "ok")
                    )
                except Exception:
                    rows.append((ref, kind, len(b), None, None, None,
                                 "decode_error"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(featurize, MEDIA_FEATURE_SCHEMA)
