"""W1 — reading-order sort (SURVEY.md §2.5).

The reference sorts a page's textboxes by ``(-y1, x1)`` — top-to-
bottom, then left-to-right (ref src/utilities/parse_util.py:454).
Here that is a per-(doc,page) window; no global shuffle of anything
but the (doc_id, page_id) hash.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reading_order_window(per_page: bool = True) -> Window:
    keys = ["doc_id", "page_id"] if per_page else ["doc_id"]
    # offset tie-break = the stable-sort semantics of Python list.sort
    # (equal keys keep storage order).
    order = (
        [F.desc("y1"), F.asc("x1"), F.asc("offset")]
        if per_page
        else [F.asc("page_id"), F.desc("y1"), F.asc("x1"), F.asc("offset")]
    )
    return Window.partitionBy(*keys).orderBy(*order)


def with_reading_order(spans_geom: DataFrame, per_page: bool = True,
                       col_name: str = "rord") -> DataFrame:
    """Adds 1-based reading-order rank among TextBox spans of a page."""
    tb = spans_geom.filter(F.col("kind") == "TextBox")
    return tb.withColumn(col_name, F.row_number().over(reading_order_window(per_page)))
