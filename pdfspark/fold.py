"""The per-document extraction fold — engine-side implementation.

Reproduces the reference's convert_pdf_to_json element loop
(ref src/pdf_extractor.py:158-230 driving
src/processors/element_processors.py:59-179) over one document's span
list, quirks included:

* matcher-always-fires: the spaCy matcher built from all-optional
  token patterns (src/matcher_patterns.py:56-65) matches any non-blank
  first line, so the appendix/figure/else branches are mostly dead
  (ExtractConfig.matcher_always_fires toggles intended semantics).
* broken main-path header/footer strip: process_element tests
  ``text in header_footer_text`` where header_footer_text is the
  *dict* ``{"header": ..., "footer": ...}`` (src/pdf_extractor.py:363
  passes the dict; src/processors/element_processors.py:69 does a dict
  key-membership test) — i.e. only literal texts 'header'/'footer' are
  ever stripped. ExtractConfig toggles the intended substring strip.
* state wipes: every non-TextBox element and every stripped TextBox
  returns None from process_element, and the caller assigns that to
  current_section_header (src/pdf_extractor.py:206) — the running
  section header is wiped to None by any geometry/media span.
* unescaped heading lookup: find_section_by_heading
  (src/document.py:99-112) interpolates the heading into a regex
  without escaping; a malformed pattern raises, the per-element
  try/except (src/pdf_extractor.py:203-210) swallows it, and the
  state update is rolled back for that element.
* heading rewrite: a numbered heading that matches a TOC-skeleton
  section rewrites that section's heading in place
  (element_processors.py:127-131), affecting later lookups.
* front-matter skip: pages with index < start_page are not processed
  at all (src/pdf_extractor.py:179,192).

Output span kinds: 'heading' | 'appendix' | 'figure_caption' |
'paragraph' for surviving TextBoxes (by branch taken), 'media' for
Figure/Image inputs (media_ref preserved), original kind for the
geometry elements the reference keeps as page elements (TextLine,
Line, Rectangle). Kinds the reference merely logs (Image handled as
media here per the north rule; VerticalText, TextGroup, Container,
TextGroupTBRL, Curve) emit nothing.
"""

from __future__ import annotations

import re

from pdfspark.config import ExtractConfig
from pdfspark.functions import patterns as P

GEOM_KINDS = {"TextLine", "Line", "Rectangle"}
MEDIA_KINDS = {"Figure", "Image"}
DROP_KINDS = {"VerticalText", "TextGroup", "Container", "TextGroupTBRL", "Curve", "Char"}


def clean_toc_line(line: str, patterns_to_strip) -> str:
    for p in patterns_to_strip:
        line = re.sub(p, " ", line)
    return P.RE_EXTRA_SPACE.sub(" ", line).strip()


def _find_section_index(heading, section_headings):
    """May raise re.error exactly like the reference (unescaped)."""
    return P.find_section_by_heading(heading, section_headings)


def fold_document(
    spans: list[dict],
    header: str,
    footer: str,
    cfg: ExtractConfig = ExtractConfig(),
) -> dict:
    """Run the extraction fold over one document's spans (offset order).

    Returns dict(status, out_spans, sections, spans_in, spans_out).
    TOC spans (kind='TOC') inside `spans` build the section skeleton;
    a DecodeError span quarantines the document (ref
    src/pdf_extractor.py:185,211-212 is_extractable guard).
    """
    spans = sorted(spans, key=lambda s: s["offset"])
    n_in = len(spans)

    if any(s["kind"] == "DecodeError" for s in spans):
        return dict(status="quarantined", out_spans=[], sections=[],
                    spans_in=n_in, spans_out=0)
    if not spans:
        return dict(status="empty", out_spans=[], sections=[],
                    spans_in=0, spans_out=0)

    toc_lines = [s["text"] for s in spans if s["kind"] == "TOC"]
    headings = [clean_toc_line(l, cfg.patterns_to_strip) for l in toc_lines]
    sections = [
        dict(heading=h, paragraphs=[], figures=[], tables=[]) for h in headings
    ]

    # Memoized section lookup: between heading rewrites the headings
    # list is immutable, so a given heading string always resolves to
    # the same index (first-match-wins). The cache is cleared on every
    # in-place rewrite; re.error results are cached too (the reference
    # raises deterministically per heading). Semantics identical to the
    # per-call scan, cost drops from O(spans x sections) to O(distinct
    # headings x sections) — the difference between 0.13 ms/span and
    # 5 us/span on a 20k-span document.
    _RAISES = object()
    lookup_cache: dict[str, object] = {}

    def lookup(h):
        if h in lookup_cache:
            idx = lookup_cache[h]
            if idx is _RAISES:
                raise re.error("cached re.error for heading lookup")
        else:
            try:
                idx = _find_section_index(h, [s["heading"] for s in sections])
            except re.error:
                lookup_cache[h] = _RAISES
                raise
            lookup_cache[h] = idx
        return None if idx is None else sections[idx]

    current_header: str | None = ""
    out: list[dict] = []
    page_index = -1  # counts PageStart markers; pages < start_page skipped

    def emit(kind, text, media_ref):
        out.append(dict(kind=kind, text=text, media_ref=media_ref,
                        offset=len(out)))

    for s in spans:
        kind = s["kind"]
        if kind == "TOC":
            continue
        if kind == "PageStart":
            page_index += 1
            continue
        if cfg.start_page > 0 and page_index < cfg.start_page:
            continue  # front-matter skip (incl. spans before page 0)

        if kind in DROP_KINDS:
            current_header = None  # processor returns None -> state wipe
            continue
        if kind in MEDIA_KINDS:
            emit("media", "", s.get("media_ref"))
            current_header = None
            continue
        if kind in GEOM_KINDS:
            emit(kind, "", None)
            current_header = None
            continue
        if kind != "TextBox":
            # unsupported element type: ValueError swallowed by caller
            # (src/pdf_extractor.py:207-208); state NOT updated.
            continue

        content = s["text"].lstrip().rstrip() if s["text"] is not None else ""

        # F2 header/footer strip (broken dict-membership by default)
        nl = content.replace("\n", "")
        if cfg.broken_hf_strip:
            stripped = nl in ("header", "footer")
        else:
            stripped = bool((header and nl in header) or (footer and nl in footer))
        if stripped:
            current_header = None
            continue
        # F3 page-number strip
        if P.RE_PAGE_NUMBER.match(content):
            current_header = None
            continue

        first_line = ""
        line_count = 0
        if content != "":
            lines = content.split("\n")
            first_line = lines[0]
            line_count = len(lines)
        first_line = P.RE_EXTRA_SPACE.sub(" ", first_line)

        matches = P.matcher_fires(first_line, cfg.matcher_always_fires)
        found_sections = P.RE_SECTION.findall(first_line)

        # pick the branch first (pure regex, cannot raise), then run
        # its state updates under the reference's per-element
        # try/except: on re.error the span is still emitted (the page
        # element was added before classification,
        # element_processors.py:76-79) but the state update rolls back.
        if matches or found_sections != []:
            label = "heading"
        elif P.RE_APPENDIX.findall(first_line):
            label = "appendix"
        elif P.RE_FIGURE.findall(first_line):
            label = "figure_caption"
        else:
            label = "paragraph"
        emit(label, content, None)

        try:
            if label == "heading":
                new_header = first_line
                section_match = P.RE_SECTION_GROUPS.match(new_header)
                current_section = None
                if section_match is not None:
                    g2 = section_match.group(2)
                    if g2 is not None:
                        current_section = lookup(g2.lstrip().rstrip())
                        if current_section is not None:
                            new_header = (
                                f"{section_match.group(1).strip()} "
                                f"{section_match.group(2).strip()}"
                            )
                            if current_section["heading"] != new_header:
                                current_section["heading"] = new_header
                                lookup_cache.clear()  # headings changed
                else:
                    current_section = lookup(new_header)
                if line_count > 1 and current_section is not None:
                    current_section["paragraphs"].append(content)
                current_header = new_header
            elif label == "appendix":
                new_header = first_line.strip()
                current_section = lookup(new_header)
                if current_section is not None:
                    current_section["paragraphs"].append(content)
                current_header = new_header
            elif label == "figure_caption":
                current_section = lookup(current_header)
                if current_section is not None:
                    current_section["figures"].append(content)
                # no reassignment: returns incoming header unchanged
            else:
                if current_header != "":
                    current_section = lookup(current_header)
                    if current_section is not None:
                        current_section["paragraphs"].append(content)
        except re.error:
            pass  # state rollback; span already emitted

    return dict(
        status="ok",
        out_spans=out,
        sections=sections,
        spans_in=n_in,
        spans_out=len(out),
    )
