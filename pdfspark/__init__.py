"""pdfspark — a PySpark-native document-extraction engine.

Re-expresses the extraction semantics of the reference
(maroonvillage/pdf-parser, a single-threaded Python PDF pipeline) as a
declarative Spark DataFrame pipeline over tables of interleaved
text+media documents:

    documents_in(doc_id string,
                 spans array<struct<kind,text,media_ref,offset>>)

Design goals (see SURVEY.md):
  * DataFrame/SQL-first: filters, joins, windows and aggregations are
    native Catalyst plans (predicate pushdown, column pruning, AQE).
  * Exactly two pandas/Arrow UDF surfaces: the per-document stateful
    extraction fold (`operators.extract`) and table-row clustering
    fast paths that need Python `re` parity.
  * Explicit partitioning: salted repartition on doc_id + a skew
    splitter for pathological documents; per-partition lineage rows.
"""

__version__ = "0.1.0"
