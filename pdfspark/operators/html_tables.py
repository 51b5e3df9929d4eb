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
   column names; duplicate names collapse dict-style (first position,
   last value — the reference builds a dict comprehension); otherwise
   keys fall back to 'Column {i+1}' (the arity-mismatch quirk).
 - BeautifulSoup descend semantics: `table.find_all("tr")` and
   `tr.find_all("td")` DESCEND into nested tables, and `td.text`
   includes every descendant's text — so an inner table's cells count
   both as extra tds of the outer row (at the outer td's text
   containing them) and as their own rows, and flow content inside a
   cell (an <h1>) stays part of the cell text while still feeding the
   first-h1 title capture.

Implemented as an Arrow-batched mapInPandas over stdlib
html.parser (BeautifulSoup is not available in the engine; the
descend/implied-end rules above are reproduced explicitly and pinned
by pytest against hand-derived BeautifulSoup outputs).
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
    td texts of every <tr> of that table, with BeautifulSoup descend
    semantics (see module docstring).

    Open cells/rows live on stacks tagged with their <table> depth:
    a new td/tr implied-closes only siblings AT ITS OWN depth (an
    inner table's tr must not close the outer td it nests in); td
    text slots are reserved at START-tag time in every open ancestor
    row (find_all document order) and filled at close; data appends
    to every open cell buffer (td.text includes descendants)."""

    def __init__(self):
        super().__init__()
        self.h1: str | None = None
        self.ths: list[str] = []
        self.trs: list[list] = []       # flat, document order
        self._h1_buf: list[str] | None = None
        self._h1_done = False
        self._depth = 0
        self._done = False
        self._open_rows: list[tuple[int, list]] = []   # (depth, row)
        # cell = [depth, kind, buf, slots]; slots = [(row, index), ...]
        self._open_cells: list[list] = []

    def _close_cell(self):
        depth, kind, buf, slots = self._open_cells.pop()
        text = "".join(buf)
        if kind == "th":
            self.ths.append(text)
        else:
            for row, idx in slots:
                row[idx] = text

    def _close_cells_at(self, depth):
        while self._open_cells and self._open_cells[-1][0] >= depth:
            self._close_cell()

    def _close_rows_at(self, depth):
        while self._open_rows and self._open_rows[-1][0] >= depth:
            self._open_rows.pop()

    def handle_starttag(self, tag, attrs):
        if tag == "h1" and not self._h1_done:
            self._h1_buf = []
        elif tag == "table":
            if self._done:
                return
            self._depth += 1
        elif self._depth and not self._done:
            if tag == "tr":
                # implied end: a sibling tr closes this depth's open
                # cell and row, never an outer table's
                self._close_cells_at(self._depth)
                self._close_rows_at(self._depth)
                row: list = []
                self.trs.append(row)
                self._open_rows.append((self._depth, row))
            elif tag in ("th", "td"):
                self._close_cells_at(self._depth)
                slots = []
                if tag == "td":
                    # reserve a slot in every open ancestor row NOW:
                    # find_all("td") orders by start tag (pre-order),
                    # but the text is only complete at the end tag
                    for _, row in self._open_rows:
                        row.append(None)
                        slots.append((row, len(row) - 1))
                self._open_cells.append([self._depth, tag, [], slots])

    def handle_endtag(self, tag):
        if tag == "h1" and self._h1_buf is not None:
            self.h1 = "".join(self._h1_buf)
            self._h1_buf = None
            self._h1_done = True
        elif tag == "table" and self._depth:
            self._close_cells_at(self._depth)
            self._close_rows_at(self._depth)
            self._depth -= 1
            if self._depth == 0:
                self._done = True
        elif self._depth and not self._done:
            if tag == "tr":
                self._close_cells_at(self._depth)
                self._close_rows_at(self._depth)
            elif tag in ("th", "td"):
                if self._open_cells and self._open_cells[-1][1] == tag:
                    self._close_cell()

    def handle_data(self, data):
        if self._h1_buf is not None:
            self._h1_buf.append(data)
        for cell in self._open_cells:
            cell[2].append(data)


def parse_html_table(doc_id: int, html: str) -> list[tuple]:
    # case-insensitive precheck: HTMLParser (and the reference's
    # BeautifulSoup) lowercase tag names, so <TABLE> must not be dropped
    if html is None or "<table" not in html.lower():
        return []
    p = _TableParser()
    p.feed(html)
    # truncated input (missing end tags): commit whatever is still
    # open, like BeautifulSoup's tree completion — an unfilled slot
    # must not survive as None
    p._close_cells_at(0)
    title = p.h1.strip() if p.h1 is not None else "No Title"
    columns = [t.strip() for t in p.ths]
    out = []
    for ri, tds in enumerate(p.trs[1:]):  # skip header row by position
        if len(tds) == len(columns):
            # reference builds a dict comprehension keyed by column
            # name: duplicate <th> names collapse to ONE entry at the
            # first position with the LAST value
            d: dict = {}
            for k, v in zip(columns, tds):
                d[k] = v
            cells = "|".join(f"{k}={v.strip()}" for k, v in d.items())
        else:
            cells = "|".join(
                f"Column {i + 1}={v.strip()}" for i, v in enumerate(tds)
            )
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
