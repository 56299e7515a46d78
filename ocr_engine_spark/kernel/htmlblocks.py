"""HTML main-content extraction: DOM tokenization + text-density /
link-density boilerplate classification (SURVEY.md §2.9).

This kernel *replaces* the reference's LLM interpretation stage
(/root/reference/app.py:606-630) with a deterministic densitometric
classifier in the spirit of Boilerpipe / Readability (Kohlschütter et
al., "Boilerplate Detection using Shallow Text Features", WSDM 2010):
the document is segmented into block-level text segments, each scored
by word count, link density (linked words / words) and text density
(words per 80-char wrap line), and classified content vs boilerplate
by fixed thresholds. All thresholds are module constants —
fixture-locked, never tuned at runtime.

Two reference semantics are deliberately carried over:

- **segments-then-tables order** — the reference flattens DOCX as all
  paragraphs first, then all tables (/root/reference/app.py:500-508,
  ocr_any.py:349-359, NOT interleaved document order). We reproduce
  that: non-table segments in document order first, then table rows in
  table-open order.
- **table row rendering** — a row is kept iff any cell is non-blank
  (/root/reference/app.py:504-508) and rendered as the " | " join of
  *all* its (stripped) cells, empty cells included.

Parsing is tolerant and never raises, so ``parse_failed`` is always 0
for HTML payloads. Tokenization is a single compiled-regex scan (tag /
comment / decl events + entity-unescaped text runs) rather than stdlib
``html.parser`` — profiling showed ``HTMLParser.goahead`` at ~88% of
HTML kernel time for identical event streams. The stdlib-driven
variant is kept (``extract_blocks_ref``) as the differential-test
reference: tests/test_kernel_pdf_html.py asserts both emit identical
blocks over the synthetic corpus.
"""

from __future__ import annotations

import math
import re
from html import unescape
from html.parser import HTMLParser
from typing import List, Optional, Tuple

# ---- classification constants (fixture-locked) ----
MAX_LINK_DENSITY = 1.0 / 3.0  # strictly-greater drops the block
MIN_TEXT_DENSITY = 6.0        # words per 80-char wrap line
WRAP_COLS = 80
MIN_LIST_WORDS = 3            # li/dt/dd minimum

# Tag classes
BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "dt", "dd",
    "blockquote", "pre", "div", "section", "article", "main",
    "figcaption", "caption", "summary", "ul", "ol", "dl", "figure",
}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
LIST_ITEM_TAGS = {"li", "dt", "dd"}
# Containers whose entire subtree is boilerplate by construction.
BOILERPLATE_CONTAINERS = {"nav", "footer", "header", "aside", "form"}
# Subtrees whose text is not document text at all.
SKIP_TAGS = {"script", "style", "noscript", "template", "head", "svg", "title"}
VOID_TAGS = {
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


class _Segment:
    __slots__ = ("tag", "boiler", "parts")

    def __init__(self, tag: str, boiler: bool):
        self.tag = tag
        self.boiler = boiler
        self.parts: List[Tuple[str, bool]] = []  # (chunk, inside_link)


class _Cell:
    __slots__ = ("parts",)

    def __init__(self) -> None:
        self.parts: List[Tuple[str, bool]] = []


def _collapse(parts: List[Tuple[str, bool]]) -> Tuple[str, int, int]:
    """Whitespace-collapse the chunks → (text, words, linked_words)."""
    words: List[str] = []
    linked = 0
    for chunk, is_link in parts:
        ws = chunk.split()
        words.extend(ws)
        if is_link:
            linked += len(ws)
    return " ".join(words), len(words), linked


class _Extractor:
    """Event consumer shared by both tokenizers (regex fast path and
    the stdlib reference). Attributes are never inspected — the
    classifier needs only tag identity, nesting, and text runs."""

    def __init__(self) -> None:
        self.segments: List[_Segment] = []
        self.tables: List[List[List[_Cell]]] = []  # table → rows → cells
        self._block_stack: List[str] = []
        self._cur: Optional[_Segment] = None
        self._boiler_depth = 0
        self._skip_depth = 0
        self._link_depth = 0
        # table parse state: stack of (table_rows, current_row, current_cell)
        self._tstack: List[list] = []

    # -- segment plumbing --
    def _flush(self) -> None:
        if self._cur is not None and self._cur.parts:
            self.segments.append(self._cur)
        self._cur = None

    def _open_segment(self, tag: str) -> None:
        self._flush()
        self._cur = _Segment(tag, self._boiler_depth > 0)

    def _context_tag(self) -> str:
        return self._block_stack[-1] if self._block_stack else "text"

    # -- parser hooks --
    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            return
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag in BOILERPLATE_CONTAINERS:
            self._flush()
            self._boiler_depth += 1
            return
        if tag == "table":
            self._flush()
            rows: List[List[_Cell]] = []
            self.tables.append(rows)
            self._tstack.append([rows, None, None])
            return
        if self._tstack:
            frame = self._tstack[-1]
            if tag == "tr":
                frame[1] = []
                frame[0].append(frame[1])
                frame[2] = None
            elif tag in ("td", "th"):
                if frame[1] is None:
                    frame[1] = []
                    frame[0].append(frame[1])
                frame[2] = _Cell()
                frame[1].append(frame[2])
            return
        if tag in BLOCK_TAGS:
            self._block_stack.append(tag)
            self._open_segment(tag)

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            if self._link_depth:
                self._link_depth -= 1
            return
        if tag in BOILERPLATE_CONTAINERS:
            if self._boiler_depth:
                self._flush()
                self._boiler_depth -= 1
            return
        if tag == "table":
            if self._tstack:
                self._tstack.pop()
            return
        if self._tstack:
            frame = self._tstack[-1]
            if tag == "tr":
                frame[1] = None
                frame[2] = None
            elif tag in ("td", "th"):
                frame[2] = None
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in self._block_stack:
                while self._block_stack and self._block_stack[-1] != tag:
                    self._block_stack.pop()
                if self._block_stack:
                    self._block_stack.pop()

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        is_link = self._link_depth > 0
        if self._tstack:
            cell = self._tstack[-1][2]
            if cell is not None:
                cell.parts.append((data, is_link))
            return
        if self._cur is None:
            self._cur = _Segment(self._context_tag(), self._boiler_depth > 0)
        self._cur.parts.append((data, is_link))


# ---- tokenizers -----------------------------------------------------

# One scan: comments (incl. unterminated), doctype/decls, processing
# instructions, end tags, start tags with quoted-attr-safe bodies.
# Anything the regex does not match (stray "<", "< b", "<3") stays in
# the surrounding text run — the same recovery stdlib html.parser uses.
_TOKEN_RX = re.compile(
    r"<!--.*?(?:-->|\Z)"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)[^>]*>"
    r"|<([a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",
    re.DOTALL,
)

# stdlib html.parser's CDATA_CONTENT_ELEMENTS: inside <script>/<style>
# everything up to the matching real end tag is opaque text — tag-like
# literals in script source must not generate events.
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
_ENDTAG_FULL = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")


def _is_startend(body: str) -> bool:
    """Whether a start-tag attr body denotes an XHTML self-closing tag,
    the way stdlib html.parser decides it: after consuming attributes,
    the leftover must be a lone "/" (a "/" that terminates an unquoted
    attribute value — ``href=http://x/`` — belongs to the value). Only
    called when ``body`` ends with "/", so the scan is the rare path."""
    i, n = 0, len(body)
    while True:
        # skip whitespace and stray slashes that are not the final "/"
        while i < n and (body[i].isspace() or (body[i] == "/" and i != n - 1)):
            i += 1
        if i >= n:
            return False
        if body[i] == "/":  # i == n - 1 here by the loop condition
            return True
        # attribute name (stops at whitespace, "/", "=")
        while i < n and not body[i].isspace() and body[i] not in "/=":
            i += 1
        while i < n and body[i].isspace():
            i += 1
        if i < n and body[i] == "=":
            i += 1
            while i < n and body[i].isspace():
                i += 1
            if i < n and body[i] in "'\"":
                q = body[i]
                i += 1
                while i < n and body[i] != q:
                    i += 1
                i += 1
            else:
                # unquoted value: consumes everything up to whitespace,
                # trailing "/" included (stdlib bare-value [^>\s]*)
                while i < n and not body[i].isspace():
                    i += 1


def _skip_cdata(html: str, pos: int, tag: str, h: _Extractor) -> int:
    """Consume a <script>/<style> interior as one opaque data run,
    mirroring stdlib set_cdata_mode: only a *real* end tag of the same
    name (``</script ... >`` with no attrs) terminates; tag-like
    literals inside (``document.write('<style>')``, ``</scriptx>``) are
    data. Returns the scan position after the end tag, or EOF if
    unterminated (the element stays open, exactly like stdlib)."""
    close_rx = _CDATA_CLOSE[tag]
    search_from = pos
    while True:
        cm = close_rx.search(html, search_from)
        if cm is None:
            if pos < len(html):
                h.handle_data(html[pos:])
            return len(html)
        em = _ENDTAG_FULL.match(html, cm.start())
        if em is not None and em.group(1).lower() == tag:
            if cm.start() > pos:
                h.handle_data(html[pos : cm.start()])
            h.handle_endtag(tag)
            return em.end()
        search_from = cm.start() + 2


def _tokenize_fast(html: str, h: _Extractor) -> None:
    pos = 0
    n = len(html)
    data = h.handle_data
    search = _TOKEN_RX.search
    while pos < n:
        m = search(html, pos)
        if m is None:
            break
        s = m.start()
        if s > pos:
            chunk = html[pos:s]
            data(unescape(chunk) if "&" in chunk else chunk)
        pos = m.end()
        endname = m.group(1)
        if endname is not None:
            h.handle_endtag(endname.lower())
            continue
        startname = m.group(2)
        if startname is None:
            continue  # comment / decl / processing instruction
        tag = startname.lower()
        body = m.group(3)
        h.handle_starttag(tag, ())
        if body.endswith("/") and _is_startend(body):
            h.handle_endtag(tag)  # self-closing: startendtag
        elif tag in _CDATA_CLOSE:
            pos = _skip_cdata(html, pos, tag, h)
    if pos < n:
        chunk = html[pos:]
        data(unescape(chunk) if "&" in chunk else chunk)


class _StdlibAdapter(HTMLParser):
    """Drives the same _Extractor through stdlib html.parser — the
    reference event stream for differential tests."""

    def __init__(self, sink: _Extractor) -> None:
        super().__init__(convert_charrefs=True)
        self._sink = sink

    def handle_starttag(self, tag, attrs):
        self._sink.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        self._sink.handle_endtag(tag)

    def handle_startendtag(self, tag, attrs):
        self._sink.handle_starttag(tag, attrs)
        self._sink.handle_endtag(tag)

    def handle_data(self, data):
        self._sink.handle_data(data)


def _classify(tag: str, text: str, words: int, linked: int, boiler: bool) -> bool:
    """True = content (keep). Fixed-threshold densitometric rule:

    1. inside a boilerplate container → drop;
    2. empty (0 words) → drop;
    3. link density strictly above ``MAX_LINK_DENSITY`` → drop;
    4. headings → keep;
    5. list items (li/dt/dd) → keep iff ≥ ``MIN_LIST_WORDS`` words;
    6. otherwise keep iff text density ≥ ``MIN_TEXT_DENSITY``, where
       text density = words / ceil(len(text)/WRAP_COLS).
    """
    if boiler or words == 0:
        return False
    if linked / words > MAX_LINK_DENSITY:
        return False
    if tag in HEADING_TAGS:
        return True
    if tag in LIST_ITEM_TAGS:
        return words >= MIN_LIST_WORDS
    density = words / max(1, math.ceil(len(text) / WRAP_COLS))
    return density >= MIN_TEXT_DENSITY


def extract_blocks(html: str) -> Tuple[List[Tuple[str, str]], int]:
    """HTML fragment → ``([(kind, text), ...] kept blocks, n_dropped)``.

    Output order: classified non-table segments in document order, then
    table rows (" | "-joined cells) in table-open order — the
    segments-then-tables order described in the module docstring.
    """
    p = _Extractor()
    _tokenize_fast(html or "", p)
    p._flush()
    return _finish(p)


def extract_blocks_ref(html: str) -> Tuple[List[Tuple[str, str]], int]:
    """Stdlib-html.parser-driven variant — differential-test reference
    for the regex tokenizer (identical classifier, identical output)."""
    p = _Extractor()
    adapter = _StdlibAdapter(p)
    adapter.feed(html or "")
    adapter.close()
    p._flush()
    return _finish(p)


def _finish(p: _Extractor) -> Tuple[List[Tuple[str, str]], int]:
    kept: List[Tuple[str, str]] = []
    dropped = 0

    for seg in p.segments:
        text, words, linked = _collapse(seg.parts)
        if _classify(seg.tag, text, words, linked, seg.boiler):
            kept.append((seg.tag, text))
        else:
            dropped += 1

    for rows in p.tables:
        for row in rows:
            cell_texts = []
            words = 0
            linked = 0
            for cell in row:
                t, w, lw = _collapse(cell.parts)
                cell_texts.append(t)
                words += w
                linked += lw
            if not any(cell_texts):
                dropped += 1
                continue
            if words and linked / words > MAX_LINK_DENSITY:
                dropped += 1
                continue
            kept.append(("tr", " | ".join(cell_texts)))

    return kept, dropped
