"""Deterministic HTML-lite layout renderer: html bytes -> word geometry.

This is the webtext generalization of the reference's pdfplumber word scan
(S1, core/extractor.py:71-198): instead of a PDF parser, a deterministic
box-model renderer assigns every word a bbox, font and size from its DOM
context, so every downstream geometric operator (line clustering, gap
windows, block sessionization, header/footer voting) operates on real
geometry. Boilerplate-relevant DOM features (link density per block) ride
along per word, per the north-star text-density/link-density heuristics.

The layout model (all deterministic, documented so tests can compute
expected geometry by hand):

  page: 612 x 792 pt, content box x in [72, 540], y in [72, 720]
  fonts:   h1 (Helvetica-Bold, 18)   h2 (Helvetica-Bold, 14)
           h3 (Helvetica-BoldOblique, 13)
           p/li (TimesNewRoman, 10)  nav/aside (Helvetica, 9)
           inline <b> -> family+"-Bold", <i> -> family+"-Italic",
           <a> -> family+"-Link" and marks words as links
  metrics: char width = 0.5*size, space = 0.3*size, line height = 1.2*size
  block gap (vertical space before block): h1 24, h2 18, h3 14, p 6,
           li 3, nav/aside 4
  page furniture: <header> renders at top = 36 on EVERY page;
           <footer> renders with bottom = 756 on every page
  page break: a line that would start below y=720 moves to the next page
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

PAGE_W, PAGE_H = 612.0, 792.0
MARGIN_X, CONTENT_TOP, CONTENT_BOTTOM = 72.0, 72.0, 720.0
HEADER_TOP, FOOTER_BOTTOM = 36.0, 756.0

BLOCK_STYLE = {
    # tag: (font family, size, gap_before_block)
    "h1": ("Helvetica-Bold", 18.0, 24.0),
    "h2": ("Helvetica-Bold", 14.0, 18.0),
    "h3": ("Helvetica-BoldOblique", 13.0, 14.0),
    "p": ("TimesNewRoman", 10.0, 6.0),
    "li": ("TimesNewRoman", 10.0, 3.0),
    "nav": ("Helvetica", 9.0, 4.0),
    "aside": ("Helvetica", 9.0, 4.0),
}
FURNITURE = {"header", "footer"}
INLINE = {"b", "i", "a"}
OBJECT_TAGS = {"img", "hr"}
IMG_W, IMG_H, HR_GAP = 144.0, 72.0, 4.0

WORD_FIELDS = [
    "page", "word_idx", "text", "x0", "x1", "top", "bottom",
    "fontname", "size", "upright", "is_link", "tag",
]

# S5 non-text object taxonomy (get_vectors.py:40-107): images, hyperlink
# annotation rects, lines (<hr>), and edges (derived from image rects,
# the way pdfplumber derives edges from rect borders). meta carries the
# edge orientation ('h'/'v'); '' otherwise.
OBJECT_FIELDS = ["page", "obj_idx", "obj_type", "x0", "x1", "top", "bottom", "meta"]


class _Collector(HTMLParser):
    """Collect (tag, [(text, inline_marks)]) block sequence."""

    def __init__(self) -> None:
        super().__init__()
        self.blocks: list[tuple[str, list[tuple[str, frozenset]]]] = []
        self._tag: str | None = None
        self._inline: list[str] = []
        self._words: list[tuple[str, frozenset]] = []

    def handle_starttag(self, tag, attrs):
        if tag in OBJECT_TAGS:
            self.blocks.append((tag, []))
        elif tag in BLOCK_STYLE or tag in FURNITURE:
            self._tag = tag
            self._words = []
            self._inline = []
        elif tag in INLINE and self._tag is not None:
            self._inline.append(tag)

    def handle_endtag(self, tag):
        if tag in INLINE and self._inline and self._inline[-1] == tag:
            self._inline.pop()
        elif tag == self._tag:
            if self._words:
                self.blocks.append((self._tag, self._words))
            self._tag = None

    def handle_data(self, data):
        if self._tag is None:
            return
        marks = frozenset(self._inline)
        for w in data.split():
            self._words.append((w, marks))


def _font_for(family: str, marks: frozenset) -> tuple[str, bool]:
    font = family
    if "b" in marks and "Bold" not in font:
        font += "-Bold"
    if "i" in marks and "Italic" not in font:
        font += "-Italic"
    is_link = "a" in marks
    if is_link:
        font += "-Link"
    return font, is_link


def _layout(html: str) -> tuple[list[tuple], list[tuple]]:
    """Shared renderer core: returns (word rows, object rows).

    Tuple-based hot path (the pandas/Arrow tokenizer builds columnar
    batches straight from these rows); `layout_html` wraps to dicts for
    the fixture/struct-UDF surface.
    """
    parser = _Collector()
    parser.feed(html)
    parser.close()

    furniture = [(t, ws) for t, ws in parser.blocks if t in FURNITURE]
    flow = [(t, ws) for t, ws in parser.blocks if t not in FURNITURE]

    pages: list[list[tuple]] = [[]]
    objects: list[list[tuple]] = [[]]  # per page: (obj_type, x0, x1, top, bottom, meta)
    y = CONTENT_TOP

    def emit_line(out: list[tuple], obj_out: list[tuple],
                  words: list[tuple[str, frozenset]], family: str,
                  size: float, top: float, tag: str) -> None:
        # pdfplumber with keep_blank_chars yields word chunks that carry
        # their separating blanks; we mimic by giving every non-final word
        # a trailing space (the segment text concat then reads naturally,
        # and C4's strip() trims the line-final one).
        x = MARGIN_X
        half, gap, bottom = 0.5 * size, 0.3 * size, top + size
        last = len(words) - 1
        run: list[tuple[float, float]] = []  # link-run x extents
        for i, (text, marks) in enumerate(words):
            font, is_link = _font_for(family, marks)
            w = len(text) * half
            chunk = text if i == last else text + " "
            # (text, x0, x1, top, bottom, fontname, size, upright, is_link, tag)
            out.append((chunk, x, x + w, top, bottom, font, size, True, is_link, tag))
            if is_link:
                run.append((x, x + w))
            elif run:
                obj_out.append(("hyperlink", run[0][0], run[-1][1], top, bottom, ""))
                run = []
            x += w + gap
        if run:
            obj_out.append(("hyperlink", run[0][0], run[-1][1], top, bottom, ""))

    def wrap(words: list[tuple[str, frozenset]], size: float) -> list[list]:
        """Greedy wrap into lines that fit the content width."""
        lines, cur, x = [], [], MARGIN_X
        limit = PAGE_W - MARGIN_X
        for text, marks in words:
            w = len(text) * 0.5 * size
            if cur and x + w > limit:
                lines.append(cur)
                cur, x = [], MARGIN_X
            cur.append((text, marks))
            x += w + 0.3 * size
        if cur:
            lines.append(cur)
        return lines

    def new_page():
        pages.append([])
        objects.append([])

    for tag, words in flow:
        if tag == "img":
            if y + IMG_H > CONTENT_BOTTOM:
                new_page()
                y = CONTENT_TOP
            objects[-1].append(("image", MARGIN_X, MARGIN_X + IMG_W, y, y + IMG_H, ""))
            # edges derived from the image rect (pdfplumber-style)
            objects[-1].append(("edge", MARGIN_X, MARGIN_X + IMG_W, y, y, "h"))
            objects[-1].append(("edge", MARGIN_X, MARGIN_X + IMG_W, y + IMG_H, y + IMG_H, "h"))
            objects[-1].append(("edge", MARGIN_X, MARGIN_X, y, y + IMG_H, "v"))
            objects[-1].append(("edge", MARGIN_X + IMG_W, MARGIN_X + IMG_W, y, y + IMG_H, "v"))
            y += IMG_H
            continue
        if tag == "hr":
            y += HR_GAP
            if y + 1.0 > CONTENT_BOTTOM:
                new_page()
                y = CONTENT_TOP
            objects[-1].append(("line", MARGIN_X, PAGE_W - MARGIN_X, y, y + 1.0, ""))
            y += 1.0 + HR_GAP
            continue
        family, size, gap = BLOCK_STYLE[tag]
        lh = 1.2 * size
        y += gap
        for line_words in wrap(words, size):
            if y + lh > CONTENT_BOTTOM:
                new_page()
                y = CONTENT_TOP
            emit_line(pages[-1], objects[-1], line_words, family, size, y, tag)
            y += lh

    # page furniture on every page (drives cross-page boundary voting)
    out: list[tuple] = []
    out_objects: list[tuple] = []
    idx = 0
    for pno, (page_words, page_objs) in enumerate(zip(pages, objects), 1):
        stamped: list[tuple] = []
        for t, ws in furniture:
            if t == "header":
                emit_line(stamped, page_objs, ws, "Helvetica", 8.0, HEADER_TOP, t)
            else:
                emit_line(stamped, page_objs, ws, "Helvetica", 8.0, FOOTER_BOTTOM - 8.0, t)
        for w in stamped + page_words:
            out.append((pno, idx) + w)
            idx += 1
        # get_vectors.py:111 sorts every page's object list by y0
        for oi, o in enumerate(sorted(page_objs, key=lambda o: (o[3], o[1], o[0]))):
            out_objects.append((pno, oi) + o)
    return out, out_objects


def layout_html_rows(html: str) -> list[tuple]:
    """Render html to flat word tuples in WORD_FIELDS order. Deterministic."""
    return _layout(html)[0]


def layout_objects(html: str) -> list[tuple]:
    """S5 (get_vectors.py:36-111): flat non-text object tuples in
    OBJECT_FIELDS order — images, hyperlink rects, <hr> lines, image
    edges — per page, sorted by y0 within the page."""
    return _layout(html)[1]


def layout_html(html: str) -> list[dict]:
    """Render html to a flat word-dict list (schema WORD_FIELDS)."""
    return [dict(zip(WORD_FIELDS, r)) for r in layout_html_rows(html)]


def plain_text(html: str) -> str:
    """The pages.text column: whitespace-joined non-furniture words."""
    parser = _Collector()
    parser.feed(html)
    parser.close()
    parts = []
    for tag, words in parser.blocks:
        if tag in FURNITURE:
            continue
        parts.append(" ".join(w for w, _ in words))
    return "\n".join(parts)
