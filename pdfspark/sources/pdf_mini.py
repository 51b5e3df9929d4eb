"""Minimal pure-stdlib PDF text codec for the S1 decode seam.

The container ships no PDF library, but the decode seam
(`binary_decode._decode_payload`) should not go un-exercised by real
PDF bytes: this module implements the smallest useful slice of the
(public) PDF 1.4 spec — uncompressed content streams, Type1 text
operators — so the fixture can carry genuine `%PDF` payloads that
round-trip through the production binaryFile -> Arrow-batch plumbing.

``build_tiny_pdf`` emits a syntactically complete PDF (catalog, page
tree, per-page uncompressed content streams, Info dict carrying the
doc id, correct xref offsets). ``decode_tiny_pdf`` plays the role of
the reference's pdfminer page iteration (ref src/pdf_extractor.py:
181-210): walk pages in /Kids order, parse each content stream's
BT..ET text blocks, and emit one TextBox span per text-show operator
plus a PageStart marker per page — the same span-dict shape the JSON
stand-in payloads decode to. A real pdfminer swap-in would replace
only these ~60 lines; everything upstream/downstream is identical.

Compressed content streams (/Filter /FlateDecode — what virtually
every real-world PDF writer emits) are supported via stdlib zlib;
stream bytes are sliced by the dict's /Length when present because a
regex scan to `endstream` is unsound over binary deflate output.

Out of scope (quarantined as decode errors, like any malformed
payload): filters other than FlateDecode, filter chains, xref
streams, encryption, non-literal strings beyond the standard escapes.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_INFO_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_TITLE_RE = re.compile(rb"/Title\s*\(((?:[^()\\]|\\.)*)\)")
_BT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_SHOW_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj|\[(.*?)\]\s*TJ",
                      re.DOTALL)
_TJ_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_STREAM_START_RE = re.compile(rb"stream(\r\n|\n)")
# (?![0-9]) pins the full number first — without it, backtracking lets
# a multi-digit indirect length like "/Length 50 0 R" match a truncated
# "5" ("0 0 R" fails the lookahead's \s+, so the prefix sneaks through)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+0\s+R)")
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/\w+)")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in b"\r\n":
                # line continuation (PDF 7.3.4.2): the reverse solidus
                # AND the end-of-line marker are BOTH disregarded;
                # keeping the newline would inject a spurious line
                # break and change first_line/line_count downstream
                i += 2
                if nxt == b"\r" and raw[i:i + 1] == b"\n":
                    i += 1
                continue
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal escape, 1-3 OCTAL digits
                # (\8 / \9 are NOT octal: the backslash is dropped and
                # the digit kept, like any other unknown escape)
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1] in b"01234567":
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            i += 1  # lone backslash: dropped, per spec
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _escape(s: str) -> bytes:
    return (
        s.encode("latin-1", "replace")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
    )


def build_tiny_pdf(doc_id: str, pages: list[list[str]],
                   compress: bool = False) -> bytes:
    """A complete PDF: one content stream per page, one Tj text-show
    per line, doc_id in the Info /Title. ``compress=True`` deflates
    each content stream (/Filter /FlateDecode), the shape real-world
    PDF writers emit."""
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3..2+n page objs,
    # 3+n..2+2n content streams, 3+2n font, 4+2n info
    page_objs = [3 + i for i in range(n_pages)]
    cont_objs = [3 + n_pages + i for i in range(n_pages)]
    font_obj = 3 + 2 * n_pages
    info_obj = font_obj + 1

    objs: dict[int, bytes] = {}
    kids = b" ".join(b"%d 0 R" % p for p in page_objs)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (b"<< /Type /Pages /Kids [" + kids
               + b"] /Count %d >>" % n_pages)
    for i, (pobj, cobj) in enumerate(zip(page_objs, cont_objs)):
        objs[pobj] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (font_obj, cobj)
        )
        ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for line in pages[i]:
            ops.append(b"(" + _escape(line) + b") Tj")
            ops.append(b"0 -14 Td")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            stream = zlib.compress(stream)
            objs[cobj] = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(stream) + stream + b"\nendstream")
        else:
            objs[cobj] = (b"<< /Length %d >>\nstream\n" % len(stream)
                          + stream + b"\nendstream")
    objs[font_obj] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica >>")
    objs[info_obj] = b"<< /Title (" + _escape(doc_id) + b") >>"

    buf = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(buf)
    n_objs = info_obj + 1
    buf += b"xref\n0 %d\n" % n_objs
    buf += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        buf += b"%010d 00000 n \n" % offsets[num]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R /Info %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (n_objs, info_obj, xref_at))
    return bytes(buf)


def _content_stream(cbody: bytes) -> bytes:
    """Raw (inflated) bytes of one content-stream object.

    Stream data is sliced by the dict's direct /Length when present —
    the only sound delimiter for binary deflate output, which may
    contain ``endstream`` (or even ``endobj``; if deflate bytes
    truncate the enclosing object at a phantom ``endobj``, the length
    check below fails and the doc quarantines — never a wrong parse).
    Falls back to the endstream scan for length-less uncompressed
    payloads. Any filter other than a single FlateDecode (optionally
    as a one-element array) raises, and the caller quarantines —
    including a /Filter whose value the dict regex cannot read (an
    indirect reference like ``/Filter 9 0 R``): treating it as
    unfiltered would silently drop the page text. Dict keys are only
    searched in the prefix before ``stream`` so binary stream bytes
    can never fake a /Filter or /Length."""
    m = _STREAM_START_RE.search(cbody)
    if m is None:
        raise ValueError("content object without stream")
    sdict = cbody[:m.start()]
    inflate = False
    if b"/Filter" in sdict:
        fm = _FILTER_RE.search(sdict)
        if fm is None:
            raise ValueError("unreadable stream filter")
        names = re.findall(rb"/(\w+)", fm.group(1))
        if names != [b"FlateDecode"]:
            raise ValueError("unsupported stream filter")
        inflate = True
    lm = _LENGTH_RE.search(sdict)
    data = None
    if lm is not None:
        want = int(lm.group(1))
        cand = cbody[m.end():m.end() + want]
        tail = cbody[m.end() + want:m.end() + want + 11]
        # trust /Length only when `endstream` actually follows the
        # slice — writers with stale lengths exist, and a wrong slice
        # must fall back to the scan, not silently mis-parse
        if len(cand) == want and tail.lstrip(b"\r\n").startswith(
                b"endstream"):
            data = cand
    if data is None:
        sm = _STREAM_RE.search(cbody)
        if sm is None:
            raise ValueError("content object without stream")
        data = sm.group(1)
    if inflate:
        try:
            data = zlib.decompress(data)
        except zlib.error as ex:
            raise ValueError(f"bad deflate stream: {ex}")
    return data


def decode_tiny_pdf(content: bytes) -> dict:
    """PDF bytes -> dict(doc_id, spans), the same contract as the JSON
    payload decode. Raises ValueError on anything it cannot parse —
    the caller quarantines, mirroring F4."""
    if not content.startswith(b"%PDF"):
        raise ValueError("not a PDF payload")
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(content)}
    if not objs:
        raise ValueError("no PDF objects")
    pages_obj = next(
        (body for body in objs.values()
         if b"/Type /Pages" in body or b"/Type/Pages" in body), None)
    if pages_obj is None:
        raise ValueError("no page tree")
    kids_m = _KIDS_RE.search(pages_obj)
    if kids_m is None:
        raise ValueError("no /Kids")
    page_ids = [int(m.group(1)) for m in _REF_RE.finditer(kids_m.group(1))]
    if not page_ids:
        raise ValueError("empty /Kids")

    # doc_id comes from the trailer-designated Info dict, NOT from the
    # last /Title of any object: an outline/annotation object carrying
    # its own /Title must not override the document title and mis-key
    # every downstream doc_id join
    title = None
    tpos = content.rfind(b"trailer")
    im = _INFO_RE.search(content, tpos) if tpos != -1 else None
    if im is not None:
        m = _TITLE_RE.search(objs.get(int(im.group(1)), b""))
        if m is not None:
            title = _unescape(m.group(1))
    if title is None:
        # legacy payloads without an Info reference: last /Title wins
        for body in objs.values():
            m = _TITLE_RE.search(body)
            if m is not None:
                title = _unescape(m.group(1))
    doc_id = title

    spans: list[dict] = []

    def emit(kind, text):
        spans.append(dict(kind=kind, text=text, media_ref=None,
                          offset=len(spans)))

    for pid in page_ids:
        body = objs.get(pid)
        if body is None:
            raise ValueError(f"missing page object {pid}")
        cm = _CONTENTS_RE.search(body)
        if cm is None:
            raise ValueError("page without /Contents")
        cbody = objs.get(int(cm.group(1)))
        if cbody is None:
            raise ValueError("missing content stream object")
        cdata = _content_stream(cbody)
        emit("PageStart", "")
        for bt in _BT_RE.finditer(cdata):
            for show in _SHOW_RE.finditer(bt.group(1)):
                if show.group(1) is not None:  # (..) Tj
                    emit("TextBox", _unescape(show.group(1)))
                else:  # [..] TJ: concatenate the string elements
                    parts = [_unescape(m.group(1))
                             for m in _TJ_STR_RE.finditer(show.group(2))]
                    emit("TextBox", "".join(parts))
    return dict(doc_id=doc_id, spans=spans)
