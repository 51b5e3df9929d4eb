"""X19 HTML table parsing — reference-semantics table cases
(parse_util.py:58-115), parser-level (no Spark needed)."""

from pdfspark.operators.html_tables import parse_html_table


def test_well_formed_with_headers():
    rows = parse_html_table(
        0,
        "<h1>T</h1><table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>",
    )
    assert rows == [(0, "T", 0, "a=1|b=2")]


def test_arity_mismatch_falls_back_to_column_n():
    rows = parse_html_table(
        1,
        "<table><tr><th>a</th><th>b</th><th>c</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>",
    )
    assert rows == [(1, "No Title", 0, "Column 1=1|Column 2=2")]


def test_first_tr_skipped_even_without_th():
    rows = parse_html_table(
        2,
        "<table><tr><td>h1</td><td>h2</td></tr>"
        "<tr><td>r1</td><td>r2</td></tr></table>",
    )
    # no <th> -> columns []; the first tr is still skipped by position
    assert rows == [(2, "No Title", 0, "Column 1=r1|Column 2=r2")]


def test_no_table_passthrough():
    assert parse_html_table(3, "<h1>x</h1><p>prose</p>") == []


def test_whitespace_stripped():
    rows = parse_html_table(
        4,
        "<h1>  S  </h1><table><tr><th> c </th></tr>"
        "<tr><td> v </td></tr></table>",
    )
    assert rows == [(4, "S", 0, "c=v")]


def test_second_table_ignored():
    rows = parse_html_table(
        5,
        "<table><tr><th>a</th></tr><tr><td>1</td></tr></table>"
        "<table><tr><th>z</th></tr><tr><td>9</td></tr></table>",
    )
    assert rows == [(5, "No Title", 0, "a=1")]


def test_parse_html_implied_end_tags():
    """Valid HTML5 omits </td>/</th>/</tr>; BeautifulSoup (the
    reference parser) closes them implicitly, so the stdlib parser
    must flush open cells on the next cell/row/table boundary."""
    from pdfspark.operators.html_tables import parse_html_table

    html = ("<table><tr><th>a<th>b</tr>"
            "<tr><td>1<td>2</tr><tr><td>3<td>4</table>")
    rows = parse_html_table(7, html)
    assert [r[3] for r in rows] == ["a=1|b=2", "a=3|b=4"]


def test_parse_html_uppercase_tags():
    """HTMLParser lowercases tag names; the <table> precheck must be
    case-insensitive too (BeautifulSoup's find('table') is)."""
    from pdfspark.operators.html_tables import parse_html_table

    html = ("<TABLE><TR><TH>a</TH></TR>"
            "<TR><TD>1</TD></TR></TABLE>")
    assert len(parse_html_table(8, html)) == 1


def test_flow_content_inside_cell_stays_in_cell():
    """BeautifulSoup parity: an <h1> inside a <td> feeds BOTH the
    first-h1 title capture and the cell text (td.text includes
    descendants) — the old parser reset the shared buffer, dropping
    the cell prefix and leaking the heading into the cell."""
    rows = parse_html_table(
        1, "<table><tr><th>c</th></tr>"
           "<tr><td>x<h1>T</h1>y</td></tr></table>")
    assert rows == [(1, "T", 0, "c=xTy")]


def test_nested_table_descend_semantics():
    """BeautifulSoup parity: find_all('tr')/find_all('td') DESCEND —
    the inner table's td counts as an extra td of the outer row (whose
    own td text contains the nested content), and the inner tr is also
    its own row."""
    rows = parse_html_table(
        2, "<h1>T</h1><table><tr><th>c</th></tr>"
           "<tr><td>a<table><tr><td>b</td></tr></table></td></tr>"
           "</table>")
    assert rows == [
        (2, "T", 0, "Column 1=ab|Column 2=b"),
        (2, "T", 1, "c=b"),
    ]


def test_duplicate_th_collapses_dict_style():
    """Reference parity: the row dict comprehension keyed by column
    name collapses duplicate <th> names — first position, last
    value."""
    rows = parse_html_table(
        3, "<table><tr><th>a</th><th>a</th></tr>"
           "<tr><td>1</td><td>2</td></tr></table>")
    assert rows == [(3, "No Title", 0, "a=2")]


def test_truncated_html_commits_open_cells():
    """Missing end tags (tree completion): the open cell/row still
    commit, no None placeholders survive."""
    rows = parse_html_table(
        4, "<table><tr><th>k</th></tr><tr><td>v")
    assert rows == [(4, "No Title", 0, "k=v")]
