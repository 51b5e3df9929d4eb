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


# --- video frame sampling ---------------------------------------------------

FRAME_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame_md5", StringType()),
        StructField("status", StringType()),
    ]
)


def media_table_video(docs: DataFrame) -> DataFrame:
    """Opaque-binary video table (fake payload, as media_table)."""
    return docs.select(
        F.concat(F.lit("vid://"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        ),
        F.lit("video").alias("media_kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )


def _fake_frame_count(payload: bytes) -> int:
    """STUB for the container demuxer: frame count from the payload
    hash (1..120). Replace with ffprobe/pyav in production."""
    return 1 + hashlib.md5(payload).digest()[2] % 120


def sample_frames(media: DataFrame, every_n: int = 5,
                  fps: int = 25) -> DataFrame:
    """Frame sampling: one OUTPUT row per sampled frame of each video
    payload (the 1->N mapInPandas batch shape a real frame extractor
    has; frame bytes stand in as a deterministic hash). Decode errors
    quarantine as a single status row. Scale shape: Arrow batches in,
    no shuffle — repartition big video tables by hash(media_ref)
    upstream so demux cost spreads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    n = _fake_frame_count(b)
                    cmd5 = hashlib.md5(b).hexdigest()
                    for i in range(0, n, every_n):
                        fm = hashlib.md5(f"{cmd5}:{i}".encode()).hexdigest()
                        rows.append((ref, i, i * 1000 // fps, fm, "ok"))
                except Exception:
                    rows.append((ref, None, None, None, "decode_error"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select("media_ref", "content").mapInPandas(run, FRAME_SCHEMA)


# --- image resize planning --------------------------------------------------

RESIZE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("status", StringType()),
    ]
)


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize plan per image: decode dims (stub) ->
    integer-arithmetic target dims (floor((d*target)/max_dim), min 1 —
    integer-exact in every engine). The actual pixel resample is the
    stubbed codec step; the schema/batching is the production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    w, h = _fake_decode(b)
                    m = max(w, h)
                    rows.append(
                        (ref, w, h, max(1, (w * target) // m),
                         max(1, (h * target) // m), "ok")
                    )
                except Exception:
                    rows.append((ref, None, None, None, None, "decode_error"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return media.select("media_ref", "content").mapInPandas(run, RESIZE_SCHEMA)


# --- audio chunking ---------------------------------------------------------

AUDIO_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_chunks", IntegerType()),
        StructField("last_chunk_samples", IntegerType()),
        StructField("status", StringType()),
    ]
)


def audio_chunk_plan(media: DataFrame, sample_rate: int = 16000,
                     chunk_seconds: int = 1) -> DataFrame:
    """Fixed-window audio chunking plan: fake decode maps payload bytes
    to a sample count (4 samples per byte), then 1-second windows with
    a ragged tail — the schema a streaming ASR feature extractor needs.
    Integer arithmetic only (engine-portable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk = sample_rate * chunk_seconds
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    n = len(b) * 4
                    n_chunks = max(1, -(-n // chunk))
                    last = n - (n_chunks - 1) * chunk
                    rows.append((ref, sample_rate, n, n_chunks, last, "ok"))
                except Exception:
                    rows.append((ref, sample_rate, None, None, None,
                                 "decode_error"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    return media.select("media_ref", "content").mapInPandas(run, AUDIO_SCHEMA)
