"""J2 — title↔table parent-id join with consume-once semantics.

Reference: src/utilities/parse_util.py:188-205 (extract_table_data_
from_json). The reference builds a dict of NarrativeText titles keyed
by ``metadata.parent_id`` (falling back to the narrative's own
``element_id``), then walks Table elements in document order: each
table probes its ``parent_id`` first, then its own ``element_id``, and
a matched title is ``del``-eted from the dict so it can be consumed at
most once (parse_util.py:201-205). Python-dict build semantics mean a
later title on the same key OVERWRITES an earlier one.

Spark-first formulation — no per-doc Python, two broadcast-sized
passes:

1. titles dict  = groupBy(doc_id, key) . max_by(text, ord)
                  (dict-overwrite: last write wins)
2. parent pass  = tables ⋈ titles ON key = parent_id; per (doc_id,
                  key) the FIRST table in document order wins
                  (row_number over tord) — that IS consume-once
3. element pass = tables unmatched in pass 1 ⋈ titles ON key =
                  element_id, restricted to keys NOT consumed by the
                  parent pass (left-anti); element_ids are unique so
                  no further contention
4. left join back: unmatched tables get title '' exactly like the
                   reference's ``title = ""`` default

Faithfulness note: the reference interleaves consumption of both probe
paths in strict table order; the two-pass form can differ only when a
title key is simultaneously some table's parent_id AND a *different*
table's element_id (a table nested inside a table). That shape does
not occur in Unstructured output (a caption's parent is either a
shared container or the table itself) and is absent from the fixture;
tests/test_pipeline_ops.py pins equality against a statement-level
transliteration of the reference loop.

Scale shape: titles per doc are tiny (one per table caption) — the
joins broadcast the aggregated title side; everything else is a
narrow projection of the elements scan. No global window, no
cross-doc shuffle beyond the doc_id-keyed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def title_dict(elements: DataFrame) -> DataFrame:
    """The reference's ``table_titles`` dict as a table:
    (doc_id, key, title) with last-write-wins per key."""
    return (
        elements.filter(F.col("etype") == "NarrativeText")
        .withColumn("key", F.coalesce("parent_id", "element_id"))
        .groupBy("doc_id", "key")
        .agg(F.max_by("text", "ord").alias("title"))
    )


def match_table_titles(elements: DataFrame) -> DataFrame:
    """(doc_id, element_id, tord, title) for every Table element;
    title = '' when nothing matched (reference default)."""
    titles = title_dict(elements)
    tables = elements.filter(F.col("etype") == "Table").select(
        "doc_id", "element_id", "parent_id", F.col("ord").alias("tord")
    )

    # pass 1 — parent_id probe, consume-once: first table (doc order)
    # per title key wins. Both sides descend from the same `elements`
    # scan, so their doc_id columns share an expression id — a raw
    # tables.doc_id == titles.doc_id comparison logs Spark's
    # "trivially true equals predicate" warning and leans on the
    # analyzer's dataset-id self-join disambiguation to recover the
    # intended equi-join. Explicit subquery aliases make the join
    # condition unambiguous at construction time instead (behavior
    # pinned by test_j2_no_cross_document_title_match).
    w_key = Window.partitionBy("doc_id", "key").orderBy("tord")
    tb = tables.filter(F.col("parent_id").isNotNull()).alias("tb")
    ti = titles.alias("ti")
    p1 = (
        tb.join(
            F.broadcast(ti),
            (F.col("tb.doc_id") == F.col("ti.doc_id"))
            & (F.col("tb.parent_id") == F.col("ti.key")),
        )
        .select(
            F.col("tb.doc_id").alias("doc_id"),
            "element_id", "tord", "key", "title",
        )
        .withColumn("rn", F.row_number().over(w_key))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # p1 is consumed three times (remaining-titles anti-join, pass-2
    # anti-join, the matched union); it is output-sized (one row per
    # matched table), so persist it rather than re-running the
    # elements scan + broadcast join + consume-once window per
    # consumer — the same diamond rule as the j3 merge.
    p1 = p1.persist()

    # pass 2 — element_id probe for tables the parent pass missed,
    # against title keys the parent pass did not consume
    remaining_titles = titles.join(
        p1.select("doc_id", "key"), ["doc_id", "key"], "left_anti"
    )
    rem = remaining_titles.select(
        F.col("doc_id").alias("t_doc_id"),
        F.col("key").alias("ekey"),
        "title",
    )
    p2 = (
        tables.join(p1.select("doc_id", "element_id"),
                    ["doc_id", "element_id"], "left_anti")
        .join(
            F.broadcast(rem),
            (F.col("doc_id") == F.col("t_doc_id"))
            & (F.col("element_id") == F.col("ekey")),
        )
        .select("doc_id", "element_id", "tord", "title")
    )

    matched = p1.select("doc_id", "element_id", "tord", "title").unionByName(p2)
    return (
        tables.join(matched.select("doc_id", "element_id", "title"),
                    ["doc_id", "element_id"], "left")
        .select(
            "doc_id",
            "element_id",
            F.col("tord").cast("int").alias("tord"),
            F.coalesce("title", F.lit("")).alias("title"),
        )
    )
