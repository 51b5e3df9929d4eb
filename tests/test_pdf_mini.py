"""The S1 decode seam run on REAL `%PDF` byte payloads (stdlib mini
codec, pdfspark/sources/pdf_mini.py) — generator/decoder round trip,
escape handling, quarantine, and the distributed binaryFile plumbing.
"""

import os

import pytest

from pdfspark.sources.pdf_mini import (
    build_tiny_pdf,
    decode_tiny_pdf,
)


def test_pdf_round_trip_two_pages():
    pdf = build_tiny_pdf("doc-1", [["1. Intro", "Body line."],
                                   ["2. Methods"]])
    assert pdf.startswith(b"%PDF-1.4")
    out = decode_tiny_pdf(pdf)
    assert out["doc_id"] == "doc-1"
    assert [(s["kind"], s["text"]) for s in out["spans"]] == [
        ("PageStart", ""),
        ("TextBox", "1. Intro"),
        ("TextBox", "Body line."),
        ("PageStart", ""),
        ("TextBox", "2. Methods"),
    ]
    assert [s["offset"] for s in out["spans"]] == [0, 1, 2, 3, 4]


def test_pdf_string_escapes_round_trip():
    lines = ["with (parens) kept", "back\\slash", "tab\tand newline"]
    out = decode_tiny_pdf(build_tiny_pdf("esc", [lines]))
    got = [s["text"] for s in out["spans"] if s["kind"] == "TextBox"]
    # \t survives; \n inside a line was written as a literal escape
    assert got[0] == "with (parens) kept"
    assert got[1] == "back\\slash"
    assert got[2] == "tab\tand newline"


def test_pdf_tj_array_and_octal():
    """Hand-built content stream: TJ array concatenation and octal
    escapes (features a generator round trip alone would not hit)."""
    pdf = build_tiny_pdf("tj", [["placeholder"]])
    raw = pdf.replace(b"(placeholder) Tj",
                      b"[(Hel) -20 (lo\\040world)] TJ")
    out = decode_tiny_pdf(raw)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "TextBox"]
    assert texts == ["Hello world"]


def test_pdf_non_octal_digit_escape_is_not_an_error():
    """Per spec a backslash before a non-special char is dropped:
    `\\8` yields '8', it must not quarantine the document."""
    pdf = build_tiny_pdf("oct", [["placeholder"]])
    raw = pdf.replace(b"(placeholder) Tj", b"(a\\8b \\9 \\101) Tj")
    out = decode_tiny_pdf(raw)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "TextBox"]
    assert texts == ["a8b 9 A"]  # \101 octal = 'A'


def test_pdf_flate_round_trip_matches_uncompressed():
    """/Filter /FlateDecode content streams (the real-world default)
    decode to the exact same span sequence as the uncompressed form."""
    pages = [["1. Intro", "Body with (parens)."], ["2. More"]]
    plain = decode_tiny_pdf(build_tiny_pdf("zdoc", pages))
    comp_pdf = build_tiny_pdf("zdoc", pages, compress=True)
    assert b"/FlateDecode" in comp_pdf
    assert b"1. Intro" not in comp_pdf  # text genuinely compressed
    assert decode_tiny_pdf(comp_pdf) == plain


def test_pdf_flate_one_element_filter_array():
    """`/Filter [/FlateDecode]` (single-element array form) is legal
    and must decode identically to the name form."""
    pdf = build_tiny_pdf("zarr", [["line one"]], compress=True)
    arr = pdf.replace(b"/Filter /FlateDecode", b"/Filter [/FlateDecode]")
    # /Length stays valid: only the dict text changed, not the stream
    out = decode_tiny_pdf(arr)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "TextBox"]
    assert texts == ["line one"]


def test_pdf_unsupported_filter_quarantines():
    pdf = build_tiny_pdf("zbad", [["x"]], compress=True)
    chain = pdf.replace(b"/Filter /FlateDecode",
                        b"/Filter [/ASCII85Decode /FlateDecode]")
    with pytest.raises(ValueError, match="unsupported stream filter"):
        decode_tiny_pdf(chain)
    lzw = pdf.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    with pytest.raises(ValueError, match="unsupported stream filter"):
        decode_tiny_pdf(lzw)


def test_pdf_indirect_filter_quarantines():
    """A /Filter whose value is an indirect reference can't be resolved
    by the dict regex; it must quarantine, not silently decode to a
    text-less page (the compressed text would be dropped)."""
    pdf = build_tiny_pdf("zind", [["hidden text"]], compress=True)
    ind = pdf.replace(b"/Filter /FlateDecode", b"/Filter 99 0 R")
    with pytest.raises(ValueError, match="unreadable stream filter"):
        decode_tiny_pdf(ind)


def test_pdf_indirect_length_not_prefix_matched():
    """Backtracking must not let '/Length 50 0 R' match a truncated
    '5' — the indirect form is rejected whole, multi-digit or not."""
    from pdfspark.sources.pdf_mini import _LENGTH_RE

    assert _LENGTH_RE.search(b"/Length 50 0 R") is None
    assert _LENGTH_RE.search(b"/Length 5 0 R") is None
    m = _LENGTH_RE.search(b"/Length 50")
    assert m is not None and m.group(1) == b"50"
    # an indirect /Length on a real PDF still decodes via the
    # endstream-scan fallback for uncompressed streams
    pdf = build_tiny_pdf("zlen", [["some line"]], compress=False)
    n = len(b"BT\n/F1 12 Tf\n72 720 Td\n(some line) Tj\n0 -14 Td\nET")
    ind = pdf.replace(b"<< /Length %d >>" % n, b"<< /Length 50 0 R >>")
    out = decode_tiny_pdf(ind)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "TextBox"]
    assert texts == ["some line"]


def test_pdf_corrupt_deflate_quarantines():
    """Valid PDF skeleton, /FlateDecode filter, garbage stream bytes
    (same length, so /Length stays consistent) must quarantine."""
    pdf = build_tiny_pdf("zcorrupt", [["placeholder text here"]],
                         compress=True)
    with pytest.raises(ValueError):
        decode_tiny_pdf(_corrupt_stream(pdf))


def _corrupt_stream(pdf: bytes) -> bytes:
    """Flip bytes inside the (single) deflate stream, keeping length."""
    start = pdf.index(b"stream\n") + len(b"stream\n")
    end = pdf.index(b"\nendstream", start)
    body = bytes((b ^ 0xFF) for b in pdf[start:end])
    return pdf[:start] + body + pdf[end:]


def test_pdf_corrupt_quarantines():
    with pytest.raises(ValueError):
        decode_tiny_pdf(b"%PDF-1.4\nnoise only\n%%EOF\n")
    with pytest.raises(ValueError):
        decode_tiny_pdf(b"not a pdf at all")


def test_pdf_payloads_through_spark_seam(spark, tmp_path):
    """binaryFile scan -> Arrow-batch decode over a mixed dir of real
    PDFs, a JSON stand-in, and a corrupt PDF — statuses and span
    sequences must come out exactly."""
    from pdfspark.sources.binary_decode import decode_payloads, read_payloads

    d = str(tmp_path / "payloads")
    os.makedirs(d)
    with open(os.path.join(d, "a.pdf"), "wb") as fh:
        fh.write(build_tiny_pdf("pdf-a", [["1. Intro", "body"]]))
    with open(os.path.join(d, "b.bin"), "wb") as fh:
        fh.write(b'{"doc_id": "json-b", "spans": '
                 b'[{"kind": "TextBox", "text": "t", '
                 b'"media_ref": null, "offset": 0}]}')
    with open(os.path.join(d, "bad.pdf"), "wb") as fh:
        fh.write(b"%PDF-1.4\nbroken\n")
    rows = {r.doc_id: r for r in
            decode_payloads(read_payloads(spark, d)).collect()}
    assert rows["pdf-a"].status == "ok"
    assert [s.text for s in rows["pdf-a"].spans] == ["", "1. Intro", "body"]
    assert [s.kind for s in rows["pdf-a"].spans] == [
        "PageStart", "TextBox", "TextBox"]
    assert rows["json-b"].status == "ok"
    assert rows["bad"].status == "decode_error"
    assert list(rows["bad"].spans) == []


def test_pdf_line_continuation_drops_backslash_and_eol():
    """PDF 7.3.4.2: a reverse solidus at end-of-line is a line
    continuation — BOTH the backslash and the EOL marker are
    disregarded (the old decoder kept the newline, injecting a
    spurious line break into the span)."""
    pdf = build_tiny_pdf("cont", [["placeholder"]])
    raw = pdf.replace(b"(placeholder) Tj", b"(long \\\n text) Tj")
    out = decode_tiny_pdf(raw)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "TextBox"]
    assert texts == ["long  text"]
    # \r\n and \r forms collapse identically
    raw = pdf.replace(b"(placeholder) Tj", b"(a\\\r\nb) Tj")
    assert [s["text"] for s in decode_tiny_pdf(raw)["spans"]
            if s["kind"] == "TextBox"] == ["ab"]
    raw = pdf.replace(b"(placeholder) Tj", b"(a\\\rb) Tj")
    assert [s["text"] for s in decode_tiny_pdf(raw)["spans"]
            if s["kind"] == "TextBox"] == ["ab"]


def test_pdf_title_resolved_via_trailer_info():
    """doc_id must come from the trailer's /Info object; a /Title in a
    LATER non-Info object (outline, annotation) must not override it
    (the old decoder took the last /Title anywhere)."""
    pdf = build_tiny_pdf("real-title", [["text line"]])
    # append an extra object carrying its own /Title after everything;
    # keep the original trailer (startxref tail is not parsed)
    extra = b"9 0 obj\n<< /Title (outline-imposter) >>\nendobj\n"
    raw = pdf.replace(b"trailer", extra + b"trailer")
    out = decode_tiny_pdf(raw)
    assert out["doc_id"] == "real-title"
