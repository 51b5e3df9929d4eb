"""A1/F2/F3/F10/F11 — header/footer boilerplate (SURVEY.md §2.2, §2.4).

Reproduces ``get_header_footer_text`` (ref src/utilities/parse_util.py:
417-442) exactly, but as one aggregation instead of a second full pass
over every document:

  * header candidate iff ``page_y1 - y0 <= top_margin``
  * footer candidate iff not header and ``y0 <= bottom_margin``
  * per doc, in (page, offset) order, concatenate candidate texts
    (newlines removed) into one string, skipping a text if it is
    already a *substring* of the accumulated string — the reference's
    quirky dedup (parse_util.py:436,439).

The order-sensitive substring fold is expressed with
``aggregate(sort_array(collect_list(...)))`` — all JVM-side.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from pdfspark.config import BOTTOM_MARGIN, PAGE_H, TOP_MARGIN


def with_page_y1(spans_geom: DataFrame) -> DataFrame:
    """Page top edge from the PageStart marker rows (fallback PAGE_H).

    An aggregate over the PageStart rows joined back, NOT a window over
    the whole frame: a window partitioned by (doc_id, page_id) shuffles
    every row of every kind AND blocks Catalyst from pushing the
    callers' kind filters below it, whereas with a join the
    ``kind == 'TextBox'`` filter reaches the scan and only the
    one-row-per-page tops frame aggregates (AQE broadcasts it at small
    scale; at 10^12 docs it degrades to an equi-join shuffle of
    candidate rows only — still strictly smaller than the window's
    all-kinds shuffle). Measured 2.2 s -> sub-second for the
    header/footer derivation at sf0.1."""
    tops = (
        spans_geom.filter(F.col("kind") == "PageStart")
        .groupBy("doc_id", "page_id")
        .agg(F.max("y1").alias("_page_top"))
    )
    return (
        spans_geom.join(tops, ["doc_id", "page_id"], "left")
        .withColumn(
            "page_y1", F.coalesce(F.col("_page_top"), F.lit(PAGE_H))
        )
        .drop("_page_top")
    )


def margin_candidates(
    spans_geom: DataFrame,
    top_margin: float = TOP_MARGIN,
    bottom_margin: float = BOTTOM_MARGIN,
) -> DataFrame:
    """F10/F11 — TextBox spans in the header/footer bands, with the
    newline-stripped comparison text."""
    df = with_page_y1(spans_geom).filter(F.col("kind") == "TextBox")
    # coalesce: one NULL-text candidate would otherwise null the whole
    # doc's _dedup_concat fold (concat is null-intolerant and the NULL
    # acc then survives every later iteration), silently erasing the
    # header/footer string instead of stripping boilerplate
    df = df.withColumn(
        "txt",
        F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "\n", ""),
    )
    is_hdr = (F.col("page_y1") - F.col("y0")) <= F.lit(top_margin)
    is_ftr = (~is_hdr) & (F.col("y0") <= F.lit(bottom_margin))
    return (
        df.withColumn("is_header", is_hdr)
        .withColumn("is_footer", is_ftr)
        .filter(is_hdr | is_ftr)
        .select("doc_id", "page_id", "offset", "txt", "is_header", "is_footer")
    )


def _dedup_concat(col):
    """Ordered fold with substring dedup: acc + 'txt ' unless txt in acc.

    Deliberately the interpreted JVM HOF, NOT a mapInPandas fold: the
    per-doc candidate arrays are tens of elements, so interpreter
    overhead is negligible while the Arrow group-shuffle + Python
    round-trip is not — measured at sf0.1 (6k docs, warm workers,
    min-of-3): aggregate() fold 0.70 s vs applyInPandas fold 2.0 s,
    outputs identical. The engine's mapInPandas-kernel rule applies to
    corpus-linear scans (similarity, winnowing), not to bounded
    per-group folds."""
    return F.aggregate(
        col,
        F.lit(""),
        lambda acc, x: F.when(acc.contains(x["txt"]), acc).otherwise(
            F.concat(acc, x["txt"], F.lit(" "))
        ),
    )


def header_footer(
    spans_geom: DataFrame,
    top_margin: float = TOP_MARGIN,
    bottom_margin: float = BOTTOM_MARGIN,
) -> DataFrame:
    """Per-doc boilerplate strings: (doc_id, header, footer)."""
    cands = margin_candidates(spans_geom, top_margin, bottom_margin)
    agg = cands.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(
                F.when(F.col("is_header"), F.struct("offset", "txt"))
            )
        ).alias("hdr_items"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("is_footer"), F.struct("offset", "txt"))
            )
        ).alias("ftr_items"),
    )
    return agg.select(
        "doc_id",
        _dedup_concat(F.col("hdr_items")).alias("header"),
        _dedup_concat(F.col("ftr_items")).alias("footer"),
    )


def all_doc_headers_footers(spans_geom: DataFrame, docs: DataFrame | None = None,
                            **kw) -> DataFrame:
    """header_footer() left-joined back onto the full doc list so docs
    with no margin spans get empty strings (reference initializes
    header/footer to '', parse_util.py:421-425).

    Only needed when the hf table itself is the output (a1). Every
    extract/tables/classify consumer left-joins hf onto its own doc
    stream and fillna('')s, which makes this base join redundant
    there — those call sites use header_footer() directly and save a
    distinct-aggregate over the geometry table plus a join."""
    hf = header_footer(spans_geom, **kw)
    base = (docs if docs is not None else spans_geom.select("doc_id").distinct())
    return (
        base.select("doc_id")
        .distinct()
        .join(hf, "doc_id", "left")
        .fillna({"header": "", "footer": ""})
    )


def margin_candidates_normalized(
    spans_geom: DataFrame,
    header_threshold: float = 0.1,
    footer_threshold: float = 0.9,
) -> DataFrame:
    """F12 — the normalized-position variant
    (ref src/utilities/doc_util.py:4-24), bug reproduced verbatim:
    `footer_threshold=0.9` compares `y1/page_height < 0.9`, which marks
    nearly every body element a footer candidate (the intended test
    would be `< footer_threshold` with a small threshold, or on y0).
    Applies to LTTextBox and LTTextLine analogues."""
    df = with_page_y1(spans_geom).filter(
        F.col("kind").isin("TextBox", "TextLine")
    )
    top_pos = F.col("y1") / F.col("page_y1")
    return (
        df.withColumn("txt", F.trim("text"))
        .withColumn("is_header", top_pos > F.lit(1.0 - header_threshold))
        .withColumn("is_footer", top_pos < F.lit(footer_threshold))
        .filter(F.col("is_header") | F.col("is_footer"))
    )
