"""X19 — HTML table -> rows (reference
src/utilities/parse_util.py:58-115, html_table_to_json).

Semantics reproduced:
 - only the FIRST <table> is parsed; a document without a table is
   passed through (no rows emitted here; the reference dumps the raw
   html into the JSON instead).
 - title = first <h1> text stripped, else 'No Title'.
 - columns = text of ALL <th> elements, stripped.
 - data rows = every <tr> except the FIRST (header skipped by
   position, not by tag).
 - a row whose <td> count equals the column count is keyed by the
   column names; otherwise keys fall back to 'Column {i+1}' (the
   arity-mismatch quirk).

Implemented as an Arrow-batched mapInPandas over stdlib
html.parser (BeautifulSoup is not available in the engine; for the
well-formed snippets the pipeline ingests, the two parsers agree —
divergence would only appear on malformed nesting).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

HTML_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("cells", T.StringType()),  # 'k=v|k=v' (driver-hashable)
    ]
)


class _TableParser(HTMLParser):
    """Collects first-<h1> text, first-<table> <th> texts, and the
    td texts of every <tr> of that table."""

    def __init__(self):
        super().__init__()
        self.h1: str | None = None
        self.ths: list[str] = []
        self.trs: list[list[str]] = []
        self._in_h1 = False
        self._h1_done = False
        self._table_depth = 0
        self._table_done = False
        self._in_tr = False
        self._cell_kind: str | None = None  # 'th' | 'td'
        self._buf: list[str] = []

    def _flush_cell(self):
        # implied end tag (valid HTML5: <tr><td>1<td>2</tr>): commit the
        # open cell when a new cell/row starts or the row/table closes —
        # BeautifulSoup (the reference parser) does this implicitly
        if self._cell_kind is None:
            return
        text = "".join(self._buf)
        if self._cell_kind == "th":
            self.ths.append(text)
        elif self._in_tr and self.trs:
            self.trs[-1].append(text)
        self._cell_kind = None

    def handle_starttag(self, tag, attrs):
        if tag == "h1" and not self._h1_done:
            self._in_h1 = True
            self._buf = []
        elif tag == "table":
            if self._table_done:
                return
            self._table_depth += 1
        elif self._table_depth and not self._table_done:
            if tag == "tr":
                self._flush_cell()
                self._in_tr = True
                self.trs.append([])
            elif tag in ("th", "td"):
                self._flush_cell()
                self._cell_kind = tag
                self._buf = []

    def handle_endtag(self, tag):
        if tag == "h1" and self._in_h1:
            self.h1 = "".join(self._buf)
            self._in_h1 = False
            self._h1_done = True
        elif tag == "table" and self._table_depth:
            self._flush_cell()
            self._table_depth -= 1
            if self._table_depth == 0:
                self._table_done = True
        elif self._table_depth and not self._table_done:
            if tag == "tr":
                self._flush_cell()
                self._in_tr = False
            elif tag in ("th", "td") and self._cell_kind is not None:
                self._flush_cell()

    def handle_data(self, data):
        if self._in_h1 or self._cell_kind is not None:
            self._buf.append(data)


def parse_html_table(doc_id: int, html: str) -> list[tuple]:
    # case-insensitive precheck: HTMLParser (and the reference's
    # BeautifulSoup) lowercase tag names, so <TABLE> must not be dropped
    if html is None or "<table" not in html.lower():
        return []
    p = _TableParser()
    p.feed(html)
    title = p.h1.strip() if p.h1 is not None else "No Title"
    columns = [t.strip() for t in p.ths]
    out = []
    for ri, tds in enumerate(p.trs[1:]):  # skip header row by position
        if len(tds) == len(columns):
            keys = columns
        else:
            keys = [f"Column {i + 1}" for i in range(len(tds))]
        cells = "|".join(f"{k}={v.strip()}" for k, v in zip(keys, tds))
        out.append((doc_id, title, ri, cells))
    return out


def html_tables(snippets: DataFrame) -> DataFrame:
    """(doc_id, html) -> flat table rows. Narrow map (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                rows.extend(parse_html_table(int(doc_id), html))
            yield pd.DataFrame(
                rows, columns=[f.name for f in HTML_ROWS_SCHEMA.fields]
            )

    return snippets.mapInPandas(run, HTML_ROWS_SCHEMA)
