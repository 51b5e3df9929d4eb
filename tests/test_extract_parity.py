"""Span-sequence equality: engine fold vs reference-transliteration
oracle (pure Python), then Spark plumbing vs the fold, then the skew
splitter vs the unsplit path."""

import itertools

import pytest
from pyspark.sql import functions as F

from pdfspark.config import ExtractConfig
from pdfspark.fold import fold_document
from pdfspark.operators.boilerplate import all_doc_headers_footers
from pdfspark.operators.extract import (
    extract_documents,
    extract_spans_split,
    lineage_table,
    resume_filter,
)
from pdfspark.oracle import oracle_extract
from pdfspark.synth import generate_docs


def _docs():
    return {d.doc_id: d.spans for d in generate_docs("sf0.001")}


def _hf_strings(spark, spans_geom):
    return {
        r.doc_id: (r.header, r.footer)
        for r in all_doc_headers_footers(spans_geom).collect()
    }


CONFIGS = [
    ExtractConfig(),
    ExtractConfig(matcher_always_fires=False),
    ExtractConfig(broken_hf_strip=False),
    ExtractConfig(start_page=3),
    ExtractConfig(matcher_always_fires=False, broken_hf_strip=False,
                  start_page=3),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: (
    f"quirk={c.matcher_always_fires},hf={c.broken_hf_strip},sp={c.start_page}"))
def test_fold_matches_oracle_all_fixture_docs(spark, spans_geom, cfg):
    hf = _hf_strings(spark, spans_geom)
    n_checked = 0
    for doc_id, spans in _docs().items():
        sp = [dict(kind=s["kind"], text=s["text"], media_ref=s["media_ref"],
                   offset=s["offset"]) for s in spans]
        h, f = hf.get(doc_id, ("", ""))
        got = fold_document(sp, h, f, cfg)
        want = oracle_extract(sp, h, f, cfg)
        assert got["status"] == want["status"], doc_id
        assert got["out_spans"] == want["out_spans"], (
            doc_id,
            [a for a, b in itertools.zip_longest(
                got["out_spans"], want["out_spans"]) if a != b][:3],
        )
        assert got["sections"] == want["sections"], doc_id
        n_checked += 1
    assert n_checked >= 60


def test_spark_extract_matches_fold(spark, documents_in, spans_geom):
    cfg = ExtractConfig()
    hf_df = all_doc_headers_footers(spans_geom)
    out = extract_documents(documents_in, hf_df, cfg)
    got = {r.doc_id: (r.status, [t.asDict() for t in r.spans])
           for r in out.collect()}
    hf = _hf_strings(spark, spans_geom)
    for doc_id, spans in _docs().items():
        sp = [dict(kind=s["kind"], text=s["text"], media_ref=s["media_ref"],
                   offset=s["offset"]) for s in spans]
        h, f = hf.get(doc_id, ("", ""))
        want = fold_document(sp, h, f, cfg)
        assert got[doc_id][0] == want["status"]
        assert got[doc_id][1] == want["out_spans"], doc_id


def test_partitioning_determinism(spark, documents_in, spans_geom):
    hf_df = all_doc_headers_footers(spans_geom)
    a = extract_documents(documents_in, hf_df, num_partitions=2)
    b = extract_documents(documents_in, hf_df, num_partitions=16)
    ka = {(r.doc_id): [t.asDict() for t in r.spans] for r in a.collect()}
    kb = {(r.doc_id): [t.asDict() for t in r.spans] for r in b.collect()}
    assert ka == kb


def test_skew_splitter_equality(spark, documents_in, spans_geom):
    hf_df = all_doc_headers_footers(spans_geom)
    # force the skew path for the 2000-span skew doc
    split = extract_spans_split(documents_in, hf_df, skew_threshold=500,
                                spans_per_chunk=200)
    unsplit = extract_documents(documents_in, hf_df).select("doc_id", "spans")
    ks = {r.doc_id: [t.asDict() for t in r.spans] for r in split.collect()}
    ku = {r.doc_id: [t.asDict() for t in r.spans] for r in unsplit.collect()}
    assert set(ks) == set(ku)
    assert ks["skew-00000"], "skew doc produced no spans"
    for d in ku:
        assert ks[d] == ku[d], d


def test_lineage_and_resume(spark, documents_in, spans_geom):
    hf_df = all_doc_headers_footers(spans_geom)
    full = extract_documents(documents_in, hf_df, num_partitions=4)
    lin = lineage_table(full).collect()
    assert sum(r.doc_count for r in lin) == documents_in.count()
    assert all(r.wall_ms >= 0 for r in lin)
    # resume: after committing half the docs, only the rest remain
    committed = documents_in.limit(30).select("doc_id")
    rest = resume_filter(documents_in, committed)
    assert rest.count() == documents_in.count() - 30


def test_local_hf_transliteration_matches_spark(spark, spans_geom):
    """synth._hf_local (used to materialize the driver oracle's exact-
    parity inputs) must equal the Spark A1 operator byte-for-byte."""
    from pdfspark.synth import _hf_local, generate_docs

    want = _hf_strings(spark, spans_geom)
    for d in generate_docs("sf0.001"):
        h, f = _hf_local(d)
        wh, wf = want.get(d.doc_id, ("", ""))
        assert (h, f) == (wh, wf), d.doc_id


def test_skew_splitter_equality_with_front_matter_skip(spark, documents_in,
                                                       spans_geom):
    """The windowless cutoff join must reproduce the sequential fold's
    front-matter skip (start_page=3) on the skew path."""
    cfg = ExtractConfig(start_page=3)
    hf_df = all_doc_headers_footers(spans_geom)
    split = extract_spans_split(documents_in, hf_df, cfg=cfg,
                                skew_threshold=500, spans_per_chunk=200)
    unsplit = extract_documents(documents_in, hf_df, cfg).select(
        "doc_id", "spans")
    ks = {r.doc_id: [t.asDict() for t in r.spans] for r in split.collect()}
    ku = {r.doc_id: [t.asDict() for t in r.spans] for r in unsplit.collect()}
    assert set(ks) == set(ku)
    for d in ku:
        assert ks[d] == ku[d], d


def test_skew_giant_doc_parallel_presplit(spark):
    """A 100k-span pathological doc: the skew path must (a) equal the
    sequential fold and (b) run its chunk folds across >1 task — the
    pre-split itself must not serialize the doc into one task."""
    from pdfspark.synth import DocBuilder, gen_skew
    import random

    b = DocBuilder("giant-00000")
    gen_skew(b, random.Random("42|giant"), 100_000)
    b.finish()
    spans = [dict(kind=s["kind"], text=s["text"], media_ref=s["media_ref"],
                  offset=s["offset"]) for s in b.spans]
    df = spark.createDataFrame(
        [(b.doc_id, spans)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = extract_spans_split(df, None, skew_threshold=5000,
                              spans_per_chunk=4096)
    got = [t.asDict() for t in out.collect()[0].spans]
    want = fold_document(spans, "", "", ExtractConfig())["out_spans"]
    assert got == want
    # the REAL chunk assignment (same helper the split path runs) must
    # fan the doc out over many chunk ids — not arithmetic on len()
    from pdfspark.operators.extract import chunk_exploded_spans

    exploded = df.withColumn("header", F.lit("")).withColumn(
        "footer", F.lit("")
    ).select("doc_id", "header", "footer",
             F.posexplode("spans").alias("pos", "s"))
    chunked = chunk_exploded_spans(exploded, ExtractConfig(), 4096)
    n_chunks = chunked.select("chunk").distinct().count()
    assert n_chunks > 20, n_chunks


def test_sections_auto_routes_equal(spark, documents_in, spans_geom):
    """The adaptive route must emit identical rows whichever plan the
    probe picks (high threshold -> sequential, forced low -> split)."""
    from pdfspark.operators.extract import extract_sections_auto

    hf = all_doc_headers_footers(spans_geom)

    def key(df):
        rows = df.select("doc_id", "status", "sections").collect()
        return {
            r.doc_id: (r.status, [(s.heading, list(s.paragraphs),
                                   list(s.figures)) for s in r.sections])
            for r in rows
        }

    hi = key(extract_sections_auto(documents_in, hf,
                                   skew_threshold=10**9))
    lo = key(extract_sections_auto(documents_in, hf, skew_threshold=500,
                                   spans_per_chunk=200))
    assert hi == lo


def test_spans_auto_routes_equal(spark, documents_in, spans_geom):
    """The flagship's adaptive route must emit identical span rows
    whichever plan the probe picks (high threshold -> plain fold +
    posexplode, forced low -> exploded-rows split path)."""
    from pdfspark.operators.extract import extract_spans_auto

    hf = all_doc_headers_footers(spans_geom)

    def key(df):
        rows = df.collect()
        return sorted(
            (r.doc_id, r.offset, r.kind, r.text, r.media_ref)
            for r in rows
        )

    hi = key(extract_spans_auto(documents_in, hf, skew_threshold=10**9))
    lo = key(extract_spans_auto(documents_in, hf, skew_threshold=500,
                                spans_per_chunk=200))
    assert hi == lo


def test_spans_auto_routing_choice(spark, documents_in, spans_geom,
                                   monkeypatch):
    """The probe must pick the one-scan sequential fold when no doc
    crosses the threshold, and the split path only when one does —
    the round-3 review caught the flagship call site shipping with a
    threshold below the planted sf-fixture doc, silently putting the
    whole corpus on the chunk machinery."""
    import pdfspark.operators.extract as X

    hf = all_doc_headers_footers(spans_geom)

    def boom(*a, **k):
        raise AssertionError("split path engaged")

    # no doc crosses: the split path must NOT be touched
    monkeypatch.setattr(X, "extract_spans_split_rows", boom)
    assert X.extract_spans_auto(documents_in, hf,
                                skew_threshold=10**9).count() > 0

    # a doc crosses: the split path MUST be the route
    sentinel = object()
    monkeypatch.setattr(X, "extract_spans_split_rows",
                        lambda *a, **k: sentinel)
    assert X.extract_spans_auto(documents_in, hf,
                                skew_threshold=1) is sentinel


def test_sections_split_cutoff_doc_single_row(spark):
    """A big doc whose spans are ALL removed by the start_page cutoff
    (and one whose TOC survives) must come out of the sections split
    as exactly ONE row per doc, equal to the sequential fold — the
    round-3 review found the old `missing` re-add duplicated them."""
    from pdfspark.operators.extract import extract_sections_split

    def mkdoc(doc_id, with_toc):
        spans = []
        if with_toc:
            spans.append(dict(kind="TOC", text="1. Intro", media_ref=None,
                              offset=0))
        spans.append(dict(kind="PageStart", text="", media_ref=None,
                          offset=len(spans)))
        spans += [dict(kind="TextBox", text=f"1. Intro\nbody {i}",
                       media_ref=None, offset=len(spans) + i)
                  for i in range(600)]
        return (doc_id, spans)

    df = spark.createDataFrame(
        [mkdoc("cut-notoc", False), mkdoc("cut-toc", True)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    cfg = ExtractConfig(start_page=3)
    got = extract_sections_split(df, None, cfg=cfg, skew_threshold=500,
                                 spans_per_chunk=200).collect()
    assert sorted(r.doc_id for r in got) == ["cut-notoc", "cut-toc"]
    want = {r.doc_id: (r.status,
                       [(s.heading, list(s.paragraphs), list(s.figures))
                        for s in r.sections])
            for r in extract_documents(df, None, cfg).collect()}
    for r in got:
        assert (r.status, [(s.heading, list(s.paragraphs), list(s.figures))
                           for s in r.sections]) == want[r.doc_id], r.doc_id


def test_skew_big_doc_fewer_pages_than_start_page(spark):
    """A big doc with >=1 but <=start_page PageStart markers: under
    Spark 4 ANSI mode a plain element_at would THROW on the
    out-of-bounds cutoff lookup; try_element_at yields NULL and the
    skew path must match the sequential fold (only TOC spans survive
    — page_index never reaches start_page)."""
    spans = [dict(kind="TOC", text="1. Intro", media_ref=None, offset=0),
             dict(kind="PageStart", text="", media_ref=None, offset=1)]
    spans += [dict(kind="TextBox", text=f"body {i}", media_ref=None,
                   offset=2 + i) for i in range(600)]
    spans.append(dict(kind="PageStart", text="", media_ref=None,
                      offset=len(spans)))
    df = spark.createDataFrame(
        [("fewpages-00000", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    cfg = ExtractConfig(start_page=3)
    got = extract_spans_split(df, None, cfg=cfg, skew_threshold=500,
                              spans_per_chunk=200).collect()
    want = extract_documents(df, None, cfg).select("doc_id", "spans").collect()
    assert len(got) == 1 and len(want) == 1
    assert [t.asDict() for t in got[0].spans] == \
        [t.asDict() for t in want[0].spans]


def test_skew_big_doc_with_decode_error_is_quarantined(spark):
    """A doc ABOVE the skew threshold that contains a DecodeError span
    must come out empty from the split path exactly like the
    sequential fold quarantines it — not as partial spans from its
    clean chunks."""
    from pdfspark.synth import DocBuilder, gen_skew
    import random

    b = DocBuilder("bigbad-00000")
    gen_skew(b, random.Random("42|bigbad"), 3000)
    b.spans.append(dict(page_id=99, kind="DecodeError", text="enc",
                        media_ref=None, x0=0.0, y0=0.0, x1=0.0, y1=0.0))
    b.finish()
    spans = [dict(kind=s["kind"], text=s["text"], media_ref=s["media_ref"],
                  offset=s["offset"]) for s in b.spans]
    df = spark.createDataFrame(
        [(b.doc_id, spans)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = extract_spans_split(df, None, skew_threshold=500,
                              spans_per_chunk=200).collect()
    assert len(out) == 1
    assert out[0].doc_id == b.doc_id
    assert list(out[0].spans) == []
    seq = extract_documents(df, None).collect()[0]
    assert seq.status == "quarantined" and list(seq.spans) == []


def test_relational_spans_equal_fold_default_config(spark, documents_in,
                                                    spans_geom):
    """The pure-SQL fast path must equal the mapInPandas fold span-for-
    span under the default quirk config (labels are text-local there),
    including on adversarially padded text (tabs/newlines around page
    numbers and headings — Python strip() vs Spark trim territory)."""
    from pdfspark.operators.extract import extract_spans_relational

    pad_spans = [
        dict(kind="TextBox", text="\tPage 3", media_ref=None, offset=0),
        dict(kind="TextBox", text="\n1. Intro\nbody text", media_ref=None,
             offset=1),
        dict(kind="TextBox", text="  Figure 2 padded  \t", media_ref=None,
             offset=2),
        dict(kind="TextBox", text="\x0bpg iv\n", media_ref=None, offset=3),
        dict(kind="TextBox", text="plain\ttabbed body", media_ref=None,
             offset=4),
        # NULL text: the fold coerces None to '' and emits a span; the
        # SQL path must coalesce, not silently drop the row
        dict(kind="TextBox", text=None, media_ref=None, offset=5),
    ]
    pad_doc = spark.createDataFrame(
        [("pad-00000", pad_spans)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    docs = documents_in.unionByName(pad_doc)

    hf_df = all_doc_headers_footers(spans_geom)
    fold_out = extract_documents(docs, hf_df).filter(
        "status = 'ok'"
    ).select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.offset", "s.kind", "s.text", "s.media_ref"
    )
    a = {(r.doc_id, r.offset): (r.kind, r.text, r.media_ref)
         for r in fold_out.collect()}
    b = {(r.doc_id, r.offset): (r.kind, r.text, r.media_ref)
         for r in extract_spans_relational(docs).collect()}
    assert a == b
    assert any(k[0] == "pad-00000" for k in a)  # padded doc exercised


def _unicode_doc_spans():
    """Non-ASCII headings, NBSP/em-space whitespace, unicode word
    chars — the divergence class the (?U) regex alignment exists for."""
    spans = [
        dict(kind="TOC", text="Résumé", media_ref=None, offset=0),
        dict(kind="PageStart", text="pageid:1", media_ref=None, offset=1),
        dict(kind="TextBox", text="2. Résumé\nCorps du texte",
             media_ref=None, offset=2),
        dict(kind="TextBox", text="3. Überblick und Kontext",
             media_ref=None, offset=3),
        dict(kind="TextBox", text="Appendix B. em-space annex",
             media_ref=None, offset=4),
        dict(kind="TextBox", text="Figure 7 caption nbsp",
             media_ref=None, offset=5),
        dict(kind="TextBox", text="plain körper paragraph",
             media_ref=None, offset=6),
        dict(kind="TextBox", text="page 12", media_ref=None, offset=7),
    ]
    return spans


def test_fold_matches_oracle_on_unicode_doc():
    """fold.py vs the independent transliteration on the unicode doc,
    across quirk configs (pure-Python both sides — the ground truth)."""
    from pdfspark.oracle import oracle_extract

    spans = _unicode_doc_spans()
    for cfg in CONFIGS:
        got = fold_document(list(spans), "", "", cfg)
        want = oracle_extract(list(spans), "", "", cfg)
        assert got["out_spans"] == want["out_spans"], cfg
        assert got["sections"] == want["sections"], cfg


def test_relational_spans_equal_fold_on_unicode_doc(spark):
    """The (?U)-aligned SQL fast path must agree with the Python-re
    fold on non-ASCII text too (default config)."""
    from pdfspark.operators.extract import extract_spans_relational

    spans = _unicode_doc_spans()
    df = spark.createDataFrame(
        [("uni-00000", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    want = fold_document(spans, "", "", ExtractConfig())["out_spans"]
    got = [
        dict(kind=r.kind, text=r.text, media_ref=r.media_ref,
             offset=r.offset)
        for r in extract_spans_relational(df).orderBy("offset").collect()
    ]
    assert got == want


@pytest.mark.parametrize("cfg", [ExtractConfig(), ExtractConfig(start_page=3)],
                         ids=["default", "sp3"])
def test_full_split_extraction_equals_sequential(spark, documents_in,
                                                 spans_geom, cfg):
    """extract_documents_split (chunk-parallel classification + event
    replay) must equal extract_documents on status, spans AND the
    order-stateful sections side-output — the skew path is now
    feature-complete."""
    from pdfspark.operators.extract import extract_documents_split

    hf_df = all_doc_headers_footers(spans_geom)
    split = extract_documents_split(documents_in, hf_df, cfg,
                                    skew_threshold=500, spans_per_chunk=200)
    seq = extract_documents(documents_in, hf_df, cfg)
    ks = {r.doc_id: (r.status, [t.asDict() for t in r.spans],
                     [t.asDict() for t in r.sections])
          for r in split.collect()}
    ku = {r.doc_id: (r.status, [t.asDict() for t in r.spans],
                     [t.asDict() for t in r.sections])
          for r in seq.collect()}
    assert set(ks) == set(ku)
    for d in ku:
        assert ks[d][0] == ku[d][0], d
        assert ks[d][1] == ku[d][1], d
        assert ks[d][2] == ku[d][2], d
    # the skew doc actually exercised the chunked branch
    assert ks["skew-00000"][2] == ku["skew-00000"][2]


@pytest.mark.parametrize("cfg", [ExtractConfig(), ExtractConfig(start_page=3)],
                         ids=["default", "sp3"])
def test_exploded_rows_split_equals_sequential(spark, documents_in,
                                               spans_geom, cfg):
    """extract_spans_split_rows (no nested-array reassembly; offsets
    from chunk-size prefix sums) must equal the sequential fold span-
    for-span on the fixture, skew path forced."""
    from pdfspark.operators.extract import extract_spans_split_rows

    hf_df = all_doc_headers_footers(spans_geom)
    collected = extract_spans_split_rows(documents_in, hf_df, cfg,
                                         skew_threshold=500,
                                         spans_per_chunk=200).collect()
    got = {}
    for r in collected:
        got.setdefault(r.doc_id, {})[r.offset] = (r.kind, r.text, r.media_ref)
    # no duplicate (doc_id, offset) rows hiding behind the dict
    assert len(collected) == sum(len(v) for v in got.values())
    seq = extract_documents(documents_in, hf_df, cfg)
    want = {}
    for r in seq.collect():
        want[r.doc_id] = {s.offset: (s.kind, s.text, s.media_ref)
                          for s in r.spans}
    # docs with zero output spans have no rows in the exploded shape
    want = {d: v for d, v in want.items() if v}
    assert got == want
    assert "skew-00000" in got  # the chunked branch ran


@pytest.mark.parametrize("cfg", [ExtractConfig(), ExtractConfig(start_page=3)],
                         ids=["default", "sp3"])
def test_sections_split_rows_equals_sequential(spark, documents_in,
                                               spans_geom, cfg):
    """extract_sections_split (chunk-row applyInPandas replay, no
    doc-sized arrays) must equal the sequential fold's sections."""
    from pdfspark.operators.extract import extract_sections_split

    hf_df = all_doc_headers_footers(spans_geom)
    got = {r.doc_id: (r.status, [t.asDict() for t in r.sections])
           for r in extract_sections_split(documents_in, hf_df, cfg,
                                           skew_threshold=500,
                                           spans_per_chunk=200).collect()}
    want = {r.doc_id: (r.status, [t.asDict() for t in r.sections])
            for r in extract_documents(documents_in, hf_df, cfg).collect()}
    assert got == want


def test_fold_arrow_twin_matches_pandas(spark, fixture_dir):
    """The mapInArrow fold twin (kept as a measured negative result —
    see _fold_batches_arrow docstring) must stay row-identical to the
    production pandas fold, so the A/B can be rerun any time."""
    import os

    from pyspark.sql import functions as F

    from pdfspark.operators import extract as X

    docs = spark.read.parquet(
        os.path.join(fixture_dir, "documents_in.parquet"))
    base = X._with_hf(docs, None).repartition(F.xxhash64("doc_id"))
    cfg = X.ExtractConfig()
    pd_rows = sorted(
        (r.doc_id, r.status, [tuple(s) for s in r.spans])
        for r in base.mapInPandas(
            X._fold_batches(cfg, spans_only=True),
            X.EXTRACT_SPANS_ONLY).collect())
    ar_rows = sorted(
        (r.doc_id, r.status, [tuple(s) for s in r.spans])
        for r in base.mapInArrow(
            X._fold_batches_arrow(cfg, spans_only=True),
            X.EXTRACT_SPANS_ONLY).collect())
    assert pd_rows == ar_rows
    assert pd_rows


def test_split_path_null_spans_and_null_toc_text_parity(spark):
    """Two ANSI NULL edges the skew path used to diverge on: a doc
    with spans=NULL (size(NULL) is NULL -> fell out of all three
    _split_inputs branches and VANISHED, vs. the sequential fold's
    status='empty' row) and a skew-routed doc with a NULL-text TOC
    span (replay's clean_toc_line crashed on re.sub(None) while the
    fold coerces `text or ''`). Both must now match the sequential
    output doc-for-doc."""
    from pdfspark.operators.extract import (
        extract_documents,
        extract_documents_split,
    )

    span_t = ("array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    big = ([("TOC", None, None, 0)]
           + [("TOC", "1. Intro ... 1", None, 1)]
           + [("NarrativeText", f"body line {i}", None, i + 2)
              for i in range(30)])
    docs = spark.createDataFrame(
        [("nullspans", None), ("tocnull", big),
         ("plain", [("NarrativeText", "hello", None, 0)])],
        f"doc_id string, spans {span_t}")

    seq = {r.doc_id: (r.status, [t.asDict() for t in r.spans])
           for r in extract_documents(docs, None).collect()}
    spl = {r.doc_id: (r.status, [t.asDict() for t in r.spans])
           for r in extract_documents_split(
               docs, None, skew_threshold=10,
               spans_per_chunk=8).collect()}
    assert set(spl) == set(seq) == {"nullspans", "tocnull", "plain"}
    for d in seq:
        assert spl[d] == seq[d], d
    assert seq["nullspans"][0] == "empty"


def test_skew_route_equality_out_of_order_spans_array(spark):
    """A spans array stored OUT of offset order (upstream reassembly)
    must fold identically on the sequential and skew routes: both now
    order by the span's own offset field (fold.py:182), with array
    position as the stable tiebreak — the skew path used to chunk and
    cut by raw array position."""
    import random

    from pdfspark.config import ExtractConfig
    from pdfspark.operators.extract import (
        SKEW_SPAN_THRESHOLD,
        extract_documents,
        extract_spans_split,
    )

    rng = random.Random(99)
    n = SKEW_SPAN_THRESHOLD + 200
    spans = [dict(kind="TOC", text="Introduction", media_ref=None,
                  offset=0)]
    spans += [dict(kind="PageStart", text=None, media_ref=None, offset=1)]
    spans += [
        dict(kind="TextBox", text=f"line {i} body", media_ref=None,
             offset=i)
        for i in range(2, n)
    ]
    shuffled = spans[:]
    rng.shuffle(shuffled)
    df = spark.createDataFrame(
        [("ooo-doc", shuffled)],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>",
    )
    cfg = ExtractConfig()
    seq = extract_documents(df, None, cfg, spans_only=True).collect()
    par = extract_spans_split(df, None, cfg).collect()
    assert len(seq) == len(par) == 1
    assert [t.asDict() for t in seq[0].spans] == \
           [t.asDict() for t in par[0].spans]
    # start_page front-matter cutoff must follow offset order too
    cfg2 = ExtractConfig(start_page=1)
    seq2 = extract_documents(df, None, cfg2, spans_only=True).collect()
    par2 = extract_spans_split(df, None, cfg2).collect()
    assert [t.asDict() for t in seq2[0].spans] == \
           [t.asDict() for t in par2[0].spans]
