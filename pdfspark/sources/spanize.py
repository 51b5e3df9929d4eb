"""Deterministic span-izer for the driver's flat `documents` table.

Turns documents(doc_id, text, lang, source, n_chars) into the
canonical interleaved shape documents_in(doc_id, spans[]) so the
extraction pipeline has a second, larger input family beyond the
layout fixtures. Pure Spark SQL (no UDF): words are chunked into
sentence spans; every CHUNKS_PER_HEADING-th chunk becomes a numbered
multi-line heading textbox ("k. <Sent>\\n body of section <idx>" — a
synthetic second line, so the heading box is multi-line like
pdfminer's merged heading+body textboxes); the chunks in between stay
standalone paragraph spans.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORDS_PER_CHUNK = 12
CHUNKS_PER_HEADING = 4


def spanize_documents(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id string, spans array<struct<kind,text,media_ref,offset>>)."""
    words = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.split(F.col("text"), " ").alias("w"),
    )
    chunks = words.select(
        "doc_id",
        F.expr(
            f"""
            transform(
              sequence(0, greatest(0, cast((size(w)-1)/{WORDS_PER_CHUNK} as int))),
              i -> struct(
                i as idx,
                array_join(slice(w, i*{WORDS_PER_CHUNK}+1, {WORDS_PER_CHUNK}), ' ') as sent
              )
            )
            """
        ).alias("chunks"),
    )
    # chunk i%N==0 -> heading textbox "k. <Sent>\\n<next words>", else paragraph
    spans = chunks.select(
        "doc_id",
        F.expr(
            f"""
            transform(chunks, c ->
              struct(
                'TextBox' as kind,
                case when c.idx % {CHUNKS_PER_HEADING} = 0
                     then concat(cast(c.idx / {CHUNKS_PER_HEADING} + 1 as int), '. ',
                                 upper(substring(c.sent, 1, 1)), substring(c.sent, 2),
                                 '\\n', 'body of section ', cast(c.idx as string))
                     else c.sent end as text,
                cast(null as string) as media_ref,
                cast(c.idx as int) as offset
              )
            )
            """
        ).alias("spans"),
    )
    return spans
