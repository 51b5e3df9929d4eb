"""S1 — PDF byte-stream source scaffold (SURVEY §2.1 S1).

Reference: src/pdf_extractor.py:181-210 opens the PDF byte stream and
iterates pdfminer layout pages. Per BASELINE north_star the Spark
shape is ``spark.read.format("binaryFile")`` feeding vectorized
pandas/Arrow batches that decode whole documents — one input row per
byte payload, one output row per document, decode errors quarantined
as rows (status='decode_error') instead of killing the stage (F4).

Payload formats: real `%PDF` byte streams go through the stdlib mini
codec (pdfspark.sources.pdf_mini), which since round 5 also tracks
text state (Td/TD/Tm/T*/TL) and emits per-show geometry — so the
full layout pipeline (W1 reading order, F10-F12 margins, A4/EP3
table reconstruction) runs bytes-in → tables-out. The deterministic
JSON stand-in format (synth.write_payloads) remains for geometry-free
span payloads. The single seam to swap for pdfminer is
``_decode_payload``.

Scale shape: binaryFile splits per file; decode is embarrassingly
parallel per payload; no shuffle at all until downstream operators
repartition by doc_id.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pdfspark.schema import SPAN, SPANS_GEOM

DECODED = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("bytes_len", T.LongType()),
        T.StructField("geom_digest", T.StringType()),
    ]
)


def read_payloads(spark: SparkSession, path: str) -> DataFrame:
    """Binary scan: one row per payload file (path, length, content)."""
    return spark.read.format("binaryFile").load(path)


def geom_digest(spans: list[dict]) -> str:
    """Deterministic digest of a decode's span geometry: md5 over
    `offset:page_id:x0,y0,x1,y1` (2-decimal) in offset order for every
    span carrying coordinates; '' when none do (JSON stand-ins,
    quarantined rows). Computed identically Spark-side (decode batch)
    and Spark-FREE at fixture-gen time (synth.write_pdf_payloads), so
    the driver's DuckDB oracle hash-checks the y-ordinates end to end.
    """
    # all four coordinates required: a span with partial geometry
    # (x0 set, y0 None — possible through the pluggable-decoder seam)
    # must not TypeError inside the format string; decode_payloads'
    # catch-all would silently misreport a decoded doc as
    # status='decode_error'. The mini codec emits all-or-none, so
    # fixture digests are unchanged.
    parts = [
        f"{s['offset']}:{s['page_id']}:"
        f"{s['x0']:.2f},{s['y0']:.2f},{s['x1']:.2f},{s['y1']:.2f}"
        for s in spans
        if all(s.get(k) is not None for k in ("x0", "y0", "x1", "y1"))
    ]
    if not parts:
        return ""
    return hashlib.md5(";".join(parts).encode("ascii")).hexdigest()


def _decode_payload(content: bytes) -> dict:
    """THE decoder seam: payload bytes -> dict(doc_id, spans). Raises
    on any malformed payload; the caller quarantines.

    Dispatches on the payload magic: real `%PDF` byte streams go
    through the stdlib mini-decoder (pdfspark.sources.pdf_mini —
    spans carry page_id + x0/y0/x1/y1 geometry; swap for pdfminer
    where available, mirroring ref src/pdf_extractor.py:181-210),
    everything else is the JSON stand-in format (geometry-free)."""
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
    the pluggable seam for a real PDF library.

    Spans are projected to the narrow SPAN contract (kind, text,
    media_ref, offset); the geometry a PDF decode carries is
    summarized into `geom_digest` here (the hash-checked driver
    column) and surfaced in full by decode_payloads_geom."""
    decode = decoder or _decode_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                stem = os.path.splitext(os.path.basename(r.path))[0]
                try:
                    body = decode(bytes(r.content))
                    spans = [
                        dict(kind=s["kind"], text=s["text"],
                             media_ref=s["media_ref"], offset=s["offset"])
                        for s in body["spans"]
                    ]
                    rows.append(dict(doc_id=body["doc_id"] or stem,
                                     status="ok", spans=spans,
                                     bytes_len=int(r.length),
                                     geom_digest=geom_digest(
                                         body["spans"])))
                except Exception:
                    rows.append(dict(doc_id=stem, status="decode_error",
                                     spans=[], bytes_len=int(r.length),
                                     geom_digest=""))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED.fields])

    return bin_df.select("path", "length", "content").mapInPandas(run, DECODED)


def decode_payloads_geom(bin_df: DataFrame, decoder=None) -> DataFrame:
    """binaryFile rows -> exploded SPANS_GEOM-shaped layout rows —
    the bytes-in → geometry-out path: raw `%PDF` payloads come out as
    the same (doc_id, page_id, page_number, kind, text, media_ref,
    x0..y1, offset) frame the synthetic corpus materializes, so every
    geometry operator (W1 reading order, F10-F12 margins, A1
    header/footer, A4/EP3 table reconstruction) runs end-to-end from
    raw bytes. Geometry-free spans (TOC prologue, JSON stand-ins)
    carry NULL coordinates; quarantined payloads emit no rows here
    (decode_payloads is the status-bearing surface).

    page_number follows the synthetic convention (synth.py):
    max(0, page_id - 1). Same scale shape as decode_payloads — narrow
    per-file decode, no shuffle."""
    decode = decoder or _decode_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SPANS_GEOM.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                stem = os.path.splitext(os.path.basename(r.path))[0]
                # the span projection sits INSIDE the try, collected
                # per file and appended atomically: a pluggable
                # decoder returning a malformed span dict (missing
                # key) quarantines the file like decode_payloads does,
                # instead of killing the Spark task — and never leaves
                # a half-projected file in the output
                try:
                    body = decode(bytes(r.content))
                    rows_f = []
                    for s in body["spans"]:
                        pid = s.get("page_id")
                        rows_f.append(dict(
                            # SAME doc_id rule as decode_payloads: a
                            # PDF without an Info /Title falls back to
                            # the filename stem — a None here could
                            # never join the document rows it belongs
                            # to
                            doc_id=body["doc_id"] or stem,
                            page_id=pid,
                            page_number=None if pid is None
                            else max(0, pid - 1),
                            kind=s["kind"], text=s["text"],
                            media_ref=s["media_ref"],
                            x0=s.get("x0"), y0=s.get("y0"),
                            x1=s.get("x1"), y1=s.get("y1"),
                            offset=s["offset"],
                        ))
                except Exception:
                    continue
                rows.extend(rows_f)
            yield pd.DataFrame(rows, columns=cols)

    return bin_df.select("path", "length", "content").mapInPandas(
        run, SPANS_GEOM)
