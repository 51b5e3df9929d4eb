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
