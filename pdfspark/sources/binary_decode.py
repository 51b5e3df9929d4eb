"""S1 — PDF byte-stream source scaffold (SURVEY §2.1 S1).

Reference: src/pdf_extractor.py:181-210 opens the PDF byte stream and
iterates pdfminer layout pages. Per BASELINE north_star the Spark
shape is ``spark.read.format("binaryFile")`` feeding vectorized
pandas/Arrow batches that decode whole documents — one input row per
byte payload, one output row per document, decode errors quarantined
as rows (status='decode_error') instead of killing the stage (F4).

The container ships no PDF codec, so the payload format here is a
deterministic JSON stand-in produced by synth.write_payloads; the
single seam to swap for a real decoder is ``_decode_payload`` (replace
json.loads with pdfminer page iteration emitting the same span dicts).
Everything around it — binaryFile scan, Arrow batching, quarantine
column, schema — is the real production plumbing and is oracle- and
pytest-checked.

Scale shape: binaryFile splits per file; decode is embarrassingly
parallel per payload; no shuffle at all until downstream operators
repartition by doc_id.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pdfspark.schema import SPAN

DECODED = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("bytes_len", T.LongType()),
    ]
)


def read_payloads(spark: SparkSession, path: str) -> DataFrame:
    """Binary scan: one row per payload file (path, length, content)."""
    return spark.read.format("binaryFile").load(path)


def _decode_payload(content: bytes) -> dict:
    """THE decoder seam: payload bytes -> dict(doc_id, spans). Raises
    on any malformed payload; the caller quarantines.

    Dispatches on the payload magic: real `%PDF` byte streams go
    through the stdlib mini-decoder (pdfspark.sources.pdf_mini —
    uncompressed text streams; swap for pdfminer where available,
    mirroring ref src/pdf_extractor.py:181-210), everything else is
    the JSON stand-in format."""
    if content.startswith(b"%PDF"):
        from pdfspark.sources.pdf_mini import decode_tiny_pdf

        return decode_tiny_pdf(content)
    body = json.loads(content.decode("utf-8"))
    spans = [
        dict(kind=s.get("kind"), text=s.get("text"),
             media_ref=s.get("media_ref"), offset=s.get("offset"))
        for s in body["spans"]
    ]
    return dict(doc_id=body["doc_id"], spans=spans)


def decode_payloads(bin_df: DataFrame, decoder=None) -> DataFrame:
    """binaryFile rows -> documents_in rows + quarantine. ``decoder``
    overrides the payload decoder (bytes -> dict(doc_id, spans)) —
    the pluggable seam for a real PDF library."""
    decode = decoder or _decode_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                stem = os.path.splitext(os.path.basename(r.path))[0]
                try:
                    body = decode(bytes(r.content))
                    rows.append(dict(doc_id=body["doc_id"] or stem,
                                     status="ok", spans=body["spans"],
                                     bytes_len=int(r.length)))
                except Exception:
                    rows.append(dict(doc_id=stem, status="decode_error",
                                     spans=[], bytes_len=int(r.length)))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED.fields])

    return bin_df.select("path", "length", "content").mapInPandas(run, DECODED)
