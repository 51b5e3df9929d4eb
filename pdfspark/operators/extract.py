"""Exact-parity extraction over documents_in (SURVEY.md §7 Phase 3/4).

``extract_documents``  — mapInPandas fold per document (Arrow batches)
with explicit salted repartition on xxhash64(doc_id); emits spans +
sections + per-doc lineage columns.

``extract_spans_split`` — the skew path: documents whose span count
exceeds a threshold are split into page chunks, folded in parallel,
and reassembled in order. Correct because the output *span labels*
depend only on each span's own text (branch selection is pure regex
on the first line, see fold.py) — only the sections side-output is
order-stateful, and that is kept on the sequential path.

``lineage_table``      — per-partition metrics rows (partition_id,
doc_count, bytes_in, spans_out, wall_ms) per the north rule.

``resume_filter``      — anti-join against already-committed doc_ids
(resume from the last committed snapshot).
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdfspark.config import SKEW_SPAN_THRESHOLD, ExtractConfig
from pdfspark.fold import fold_document
from pdfspark.schema import SPAN

SECTION_STRUCT = T.StructType(
    [
        T.StructField("heading", T.StringType()),
        T.StructField("paragraphs", T.ArrayType(T.StringType())),
        T.StructField("figures", T.ArrayType(T.StringType())),
        T.StructField("tables", T.ArrayType(T.StringType())),
    ]
)

EXTRACT_FULL = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("sections", T.ArrayType(SECTION_STRUCT)),
        T.StructField("spans_in", T.LongType()),
        T.StructField("spans_out", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("wall_ms", T.DoubleType()),
    ]
)


def _with_hf(documents_in: DataFrame, header_footer_df: DataFrame | None):
    if header_footer_df is None:
        return documents_in.withColumn("header", F.lit("")).withColumn(
            "footer", F.lit("")
        )
    return documents_in.join(header_footer_df, "doc_id", "left").fillna(
        {"header": "", "footer": ""}
    )


def _fold_batches(cfg: ExtractConfig):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                t0 = time.perf_counter()
                spans = [
                    dict(kind=s["kind"], text=s["text"],
                         media_ref=s["media_ref"], offset=s["offset"])
                    for s in (r.spans if r.spans is not None else [])
                ]
                res = fold_document(spans, r.header or "", r.footer or "", cfg)
                wall = (time.perf_counter() - t0) * 1000.0
                rows.append(
                    dict(
                        doc_id=r.doc_id,
                        status=res["status"],
                        spans=res["out_spans"],
                        sections=res["sections"],
                        spans_in=res["spans_in"],
                        spans_out=res["spans_out"],
                        bytes_in=sum(len(s["text"] or "") for s in spans),
                        partition_id=pid,
                        wall_ms=wall,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in EXTRACT_FULL.fields]
            )

    return run


def extract_documents(
    documents_in: DataFrame,
    header_footer_df: DataFrame | None = None,
    cfg: ExtractConfig = ExtractConfig(),
    num_partitions: int | None = None,
) -> DataFrame:
    """Sequential-per-doc exact fold; salted repartition first."""
    df = _with_hf(documents_in, header_footer_df)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # hash-repartition on doc_id: uniform unless one doc is huge (that
    # case goes through extract_spans_split)
    df = df.repartition(n, F.xxhash64("doc_id"))
    return df.mapInPandas(_fold_batches(cfg), EXTRACT_FULL)


def chunk_exploded_spans(exploded: DataFrame, cfg: ExtractConfig,
                         spans_per_chunk: int) -> DataFrame:
    """Front-matter cutoff + chunk assignment for exploded big-doc
    spans — windowless (see extract_spans_split docstring). Split out
    so tests can assert the REAL chunk ids fan out (not re-derive them
    arithmetically)."""
    if cfg.start_page > 0:
        # cutoff = pos of the (start_page+1)-th PageStart marker; a doc
        # with fewer pages keeps only its TOC spans (page_index never
        # reaches start_page), exactly like the sequential fold
        cut = (
            exploded.filter(F.col("s.kind") == "PageStart")
            .groupBy("doc_id")
            .agg(
                F.element_at(
                    F.sort_array(F.collect_list("pos")), cfg.start_page + 1
                ).alias("cut")
            )
        )
        exploded = exploded.join(F.broadcast(cut), "doc_id", "left").filter(
            (F.col("s.kind") == "TOC")
            | (F.col("cut").isNotNull() & (F.col("pos") >= F.col("cut")))
        ).drop("cut")
    return exploded.withColumn(
        "chunk", (F.col("pos") / F.lit(spans_per_chunk)).cast("int")
    )


CHUNKED_SPANS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("chunk", T.IntegerType()),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)


def extract_spans_split(
    documents_in: DataFrame,
    header_footer_df: DataFrame | None = None,
    cfg: ExtractConfig = ExtractConfig(),
    skew_threshold: int = SKEW_SPAN_THRESHOLD,
    spans_per_chunk: int = 1024,
) -> DataFrame:
    """Span-sequence output (doc_id, spans) with skew splitting.

    Big docs: explode spans, apply the front-matter skip via a per-doc
    cutoff position, chunk by `floor(pos / spans_per_chunk)`, fold each
    chunk independently, reassemble ordered and renumber offsets.

    No per-doc global window anywhere in the pre-split (a 10M-span doc
    must not serialize into one task before it is even split):

    * the front-matter skip needs only the position of the PageStart
      that opens page `start_page` — computed from the PageStart rows
      alone (#pages per doc, a tiny aggregation), then joined back;
    * chunk ids need NO page alignment: after the cutoff the chunk
      folds run with start_page=0, PageStart markers are pure
      pass-throughs, and every output span label depends only on its
      own text (see fold.py) — so a chunk boundary mid-page is safe.
      The sections side-output, which IS order-stateful, stays on the
      sequential path by design.
    """
    df = _with_hf(documents_in, header_footer_df)
    is_big = F.size("spans") > F.lit(skew_threshold)
    is_bad = F.exists("spans", lambda s: s["kind"] == "DecodeError")
    small = df.filter(~is_big)
    # a pathologically large doc can still carry a DecodeError marker:
    # the sequential fold quarantines the WHOLE document, so the skew
    # path must not chunk-fold its clean parts — route it straight to
    # an empty span list (same observable output as the small path's
    # quarantined rows)
    big = df.filter(is_big & ~is_bad)
    big_bad = df.filter(is_big & is_bad).select(
        "doc_id",
        F.array().cast(T.ArrayType(SPAN)).alias("spans"),
    )

    small_out = (
        small.repartition(F.xxhash64("doc_id"))
        .mapInPandas(_fold_batches(cfg), EXTRACT_FULL)
        .select("doc_id", "spans")
    )

    # --- skew path -------------------------------------------------------
    exploded = big.select(
        "doc_id", "header", "footer", F.posexplode("spans").alias("pos", "s")
    )
    exploded = chunk_exploded_spans(exploded, cfg, spans_per_chunk)

    import dataclasses

    chunk_cfg = dataclasses.replace(cfg, start_page=0)  # skip already applied
    chunks = exploded.groupBy("doc_id", "chunk", "header", "footer").agg(
        F.sort_array(F.collect_list(F.struct("pos", "s"))).alias("ps")
    ).select(
        "doc_id", "chunk", "header", "footer",
        F.transform(
            "ps",
            lambda x: F.struct(
                x["s"]["kind"].alias("kind"),
                x["s"]["text"].alias("text"),
                x["s"]["media_ref"].alias("media_ref"),
                x["pos"].cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )

    def run_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                spans = [dict(kind=s["kind"], text=s["text"],
                              media_ref=s["media_ref"], offset=s["offset"])
                         for s in r.spans]
                res = fold_document(spans, r.header or "", r.footer or "",
                                    chunk_cfg)
                rows.append(dict(doc_id=r.doc_id, chunk=r.chunk,
                                 spans=res["out_spans"]))
            yield pd.DataFrame(rows, columns=["doc_id", "chunk", "spans"])

    folded = chunks.repartition(F.xxhash64("doc_id", "chunk")).mapInPandas(
        run_chunks, CHUNKED_SPANS
    )
    big_out = (
        folded.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk", "spans"))
                    ),
                    lambda x: x["spans"],
                )
            ).alias("raw")
        )
        .select(
            "doc_id",
            F.transform(
                "raw",
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    return small_out.unionByName(big_out).unionByName(big_bad)


EVENT = T.StructType(
    [
        T.StructField("code", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("first_line", T.StringType()),
        T.StructField("line_count", T.IntegerType()),
    ]
)

CHUNKED_FULL = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("chunk", T.IntegerType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("events", T.ArrayType(EVENT)),
    ]
)

DOC_OUT = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("sections", T.ArrayType(SECTION_STRUCT)),
    ]
)


def extract_documents_split(
    documents_in: DataFrame,
    header_footer_df: DataFrame | None = None,
    cfg: ExtractConfig = ExtractConfig(),
    skew_threshold: int = SKEW_SPAN_THRESHOLD,
    spans_per_chunk: int = 1024,
) -> DataFrame:
    """FULL skew-safe extraction: spans AND the order-stateful sections
    side-output, with pathological documents chunk-parallelized.

    The fold splits into two halves (see fold.SectionState):

    * the regex-heavy classification (matcher, section/appendix/figure
      patterns, cleanup) is text-local — chunk folds run it in
      parallel and emit, besides their output spans, an ordered event
      stream ('W' wipe / 'H' / 'A' / 'F' / 'P' + content/first_line/
      line_count);
    * the attachment state machine (current-header thread, first-match
      -wins lookups, in-place heading rewrites) is irreducibly
      sequential — replay_sections runs it per doc over the
      reassembled event stream, through the SAME SectionState class
      the sequential fold uses, so equality holds by construction
      (and is pinned by tests).

    Amdahl's split: the replay is pointer-chasing over pre-classified
    events (~an order of magnitude lighter than the full fold), so a
    10M-span pathology parallelizes everything except that thin tail.

    Output: (doc_id, status, spans, sections) — same contract as
    extract_documents.
    """
    import dataclasses

    df = _with_hf(documents_in, header_footer_df)
    is_big = F.size("spans") > F.lit(skew_threshold)
    is_bad = F.exists("spans", lambda s: s["kind"] == "DecodeError")
    small = df.filter(~is_big)
    big = df.filter(is_big & ~is_bad)
    big_bad = df.filter(is_big & is_bad).select(
        "doc_id",
        F.lit("quarantined").alias("status"),
        F.array().cast(T.ArrayType(SPAN)).alias("spans"),
        F.array().cast(T.ArrayType(SECTION_STRUCT)).alias("sections"),
    )

    small_out = (
        small.repartition(F.xxhash64("doc_id"))
        .mapInPandas(_fold_batches(cfg), EXTRACT_FULL)
        .select("doc_id", "status", "spans", "sections")
    )

    exploded = big.select(
        "doc_id", "header", "footer", F.posexplode("spans").alias("pos", "s")
    )
    toc = (
        exploded.filter(F.col("s.kind") == "TOC")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda x: x["s"]["text"],
            ).alias("toc_lines")
        )
    )
    chunked = chunk_exploded_spans(exploded, cfg, spans_per_chunk)
    chunk_cfg = dataclasses.replace(cfg, start_page=0)
    chunks = chunked.groupBy("doc_id", "chunk", "header", "footer").agg(
        F.sort_array(F.collect_list(F.struct("pos", "s"))).alias("ps")
    ).select(
        "doc_id", "chunk", "header", "footer",
        F.transform(
            "ps",
            lambda x: F.struct(
                x["s"]["kind"].alias("kind"),
                x["s"]["text"].alias("text"),
                x["s"]["media_ref"].alias("media_ref"),
                x["pos"].cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )

    def run_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                spans = [dict(kind=s["kind"], text=s["text"],
                              media_ref=s["media_ref"], offset=s["offset"])
                         for s in r.spans]
                res = fold_document(spans, r.header or "", r.footer or "",
                                    chunk_cfg, collect_events=True)
                rows.append(dict(
                    doc_id=r.doc_id, chunk=r.chunk, spans=res["out_spans"],
                    events=[dict(code=c, content=ct, first_line=fl,
                                 line_count=lc)
                            for c, ct, fl, lc in res["events"]],
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk", "spans", "events"]
            )

    folded = chunks.repartition(F.xxhash64("doc_id", "chunk")).mapInPandas(
        run_chunks, CHUNKED_FULL
    )
    assembled = (
        folded.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk", "spans"))),
                    lambda x: x["spans"],
                )
            ).alias("raw"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk", "events"))),
                    lambda x: x["events"],
                )
            ).alias("events"),
        )
        .select(
            "doc_id",
            F.transform(
                "raw",
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
            "events",
        )
        .join(toc, "doc_id", "left")
    )

    def run_replay(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdfspark.fold import replay_sections

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                events = [(e["code"], e["content"], e["first_line"],
                           e["line_count"]) for e in r.events]
                toc_lines = list(r.toc_lines) if r.toc_lines is not None else []
                sections = replay_sections(events, toc_lines, cfg)
                rows.append(dict(doc_id=r.doc_id, status="ok",
                                 spans=list(r.spans), sections=sections))
            yield pd.DataFrame(
                rows, columns=["doc_id", "status", "spans", "sections"]
            )

    big_out = assembled.mapInPandas(run_replay, DOC_OUT)
    return small_out.unionByName(big_out).unionByName(big_bad)


SPAN_ROWS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("chunk", T.IntegerType()),
        T.StructField("within_off", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
    ]
)


def extract_spans_split_rows(
    documents_in: DataFrame,
    header_footer_df: DataFrame | None = None,
    cfg: ExtractConfig = ExtractConfig(),
    skew_threshold: int = SKEW_SPAN_THRESHOLD,
    spans_per_chunk: int = 1024,
) -> DataFrame:
    """Exploded-row skew path: (doc_id, offset, kind, text, media_ref)
    with NO nested-array reassembly anywhere.

    Measured motivation: on a 1M-span pathological doc, BOTH the
    sequential fold and the array-reassembling split path spend ~95%
    of their ~80 s in materializing the one-row million-element span
    array (collect_list + Arrow transfer of a single fat row), not in
    fold compute (~5 s). This variant keeps spans as ROWS end to end:
    chunk folds yield one output row per span, and global offsets come
    from a per-(doc, chunk) size aggregation (tiny) prefix-summed over
    #chunks rows and joined back — no giant row ever exists after the
    initial input explode. This is the shape a 10^12-doc table uses
    anyway (the driver contract's nested arrays are re-exploded by
    every consumer).
    """
    df = _with_hf(documents_in, header_footer_df)
    is_big = F.size("spans") > F.lit(skew_threshold)
    is_bad = F.exists("spans", lambda s: s["kind"] == "DecodeError")
    small = df.filter(~is_big)
    big = df.filter(is_big & ~is_bad)
    # big+bad docs: quarantined, no span rows at all

    small_out = (
        small.repartition(F.xxhash64("doc_id"))
        .mapInPandas(_fold_batches(cfg), EXTRACT_FULL)
        .select("doc_id", F.posexplode("spans").alias("_i", "s"))
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )

    exploded = big.select(
        "doc_id", "header", "footer", F.posexplode("spans").alias("pos", "s")
    )
    chunked = chunk_exploded_spans(exploded, cfg, spans_per_chunk)
    import dataclasses

    chunk_cfg = dataclasses.replace(cfg, start_page=0)
    chunks = chunked.groupBy("doc_id", "chunk", "header", "footer").agg(
        F.sort_array(F.collect_list(F.struct("pos", "s"))).alias("ps")
    ).select(
        "doc_id", "chunk", "header", "footer",
        F.transform(
            "ps",
            lambda x: F.struct(
                x["s"]["kind"].alias("kind"),
                x["s"]["text"].alias("text"),
                x["s"]["media_ref"].alias("media_ref"),
                x["pos"].cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )

    def run_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                spans = [dict(kind=s["kind"], text=s["text"],
                              media_ref=s["media_ref"], offset=s["offset"])
                         for s in r.spans]
                res = fold_document(spans, r.header or "", r.footer or "",
                                    chunk_cfg)
                for o in res["out_spans"]:
                    rows.append(dict(
                        doc_id=r.doc_id, chunk=r.chunk,
                        within_off=o["offset"], kind=o["kind"],
                        text=o["text"], media_ref=o["media_ref"],
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in SPAN_ROWS.fields]
            )

    rows = chunks.repartition(F.xxhash64("doc_id", "chunk")).mapInPandas(
        run_chunks, SPAN_ROWS
    ).persist()
    # global offsets: prefix-sum of chunk output sizes (#chunks rows
    # per doc — model-sized, windowed over that tiny frame only)
    sizes = rows.groupBy("doc_id", "chunk").agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = sizes.withColumn(
        "base", F.sum("n").over(w) - F.col("n")
    ).select("doc_id", "chunk", "base")
    big_out = (
        rows.join(F.broadcast(base), ["doc_id", "chunk"])
        .select(
            "doc_id",
            (F.col("base") + F.col("within_off")).cast("int").alias("offset"),
            "kind", "text", "media_ref",
        )
    )
    return small_out.unionByName(big_out)


def extract_spans_relational(documents_in: DataFrame) -> DataFrame:
    """Pure-SQL fast path for the flagship span extraction under the
    reference's DEFAULT quirk configuration (matcher-always-fires +
    broken dict-membership header/footer strip, start_page=0): every
    surviving span's label depends only on its own text, so the whole
    fold collapses to regex projections + one per-doc renumbering
    window — no Python anywhere, whole-stage codegen end to end.

    Exactly the relational semantics the DuckDB extract-spans oracle
    encodes; pytest pins equality against the mapInPandas fold, which
    remains the path for non-default configs and the sections
    side-output (those are order-stateful).

    Output: exploded (doc_id, offset, kind, text, media_ref).
    """
    bad = F.exists("spans", lambda s: s["kind"] == "DecodeError")
    # Python str.strip() strips ALL whitespace (tabs/newlines/unicode),
    # Spark's trim() only spaces: (?U)\s anchored replace matches the
    # fold for everything but the exotic \x1c-\x1f separators (Python-
    # space, not Unicode White_Space) — pinned by the adversarial-
    # padding case in the fold-equality test.
    pytrim = F.regexp_replace(
        F.col("s.text"), r"(?U)^\s+|\s+$", ""
    )
    df = documents_in.filter(~bad).select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("pos"),
        F.col("s.kind").alias("k"),
        pytrim.alias("content"),
        F.col("s.media_ref").alias("mref"),
    )
    from pdfspark.functions import patterns as P
    from pdfspark.functions.text import first_line, replace_extra_space

    fl = replace_extra_space(first_line(F.col("content")))
    nl = F.regexp_replace("content", "\n", "")
    is_tb = F.col("k") == "TextBox"
    keep_tb = (
        is_tb
        & ~nl.isin("header", "footer")
        & ~F.col("content").rlike(P.JAVA_PAGE_NUMBER_MATCH)
    )
    keep_other = F.col("k").isin(
        "TextLine", "Line", "Rectangle", "Figure", "Image"
    )
    df = df.filter(keep_tb | keep_other).withColumn("fl", fl)
    label = (
        F.when(F.col("k").isin("TextLine", "Line", "Rectangle"), F.col("k"))
        .when(F.col("k").isin("Figure", "Image"), "media")
        .when(
            (F.trim("fl") != "") | F.col("fl").rlike(P.JAVA_SECTION),
            "heading",
        )
        .when(F.col("fl").rlike(P.JAVA_APPENDIX), "appendix")
        .when(F.col("fl").rlike(P.JAVA_FIGURE), "figure_caption")
        .otherwise("paragraph")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return df.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("offset"),
        label.alias("kind"),
        F.when(is_tb, F.col("content")).otherwise("").alias("text"),
        F.when(F.col("k").isin("Figure", "Image"), F.col("mref")).alias(
            "media_ref"
        ),
    )


def lineage_table(extracted_full: DataFrame) -> DataFrame:
    """North-rule metrics: one row per executor partition."""
    return extracted_full.groupBy("partition_id").agg(
        F.count("*").alias("doc_count"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("spans_out").alias("spans_out"),
        F.sum("wall_ms").alias("wall_ms"),
    )


def resume_filter(documents_in: DataFrame, committed: DataFrame) -> DataFrame:
    """Skip documents already present in the committed output snapshot
    (exactly-once resume; ref analogue: the file-existence recompute
    guards at src/pdf_extractor.py:343-349,377-383)."""
    return documents_in.join(
        committed.select("doc_id").distinct(), "doc_id", "left_anti"
    )
