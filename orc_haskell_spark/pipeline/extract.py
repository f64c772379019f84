"""HTML -> text extraction: the html->text leg of the pages schema.

The north rule's per-row invariant is "byte-identical extracted text
per url": the ``text`` column of a Common-Crawl-style pages table is
the main content of ``html`` with boilerplate (nav/header/footer link
chrome) removed. Two extractors:

- ``visible_text``: everything a browser would render (script/style/
  head dropped, entities decoded, whitespace normalized per line) —
  the profiling/quality-scoring surface.
- ``main_content``: boilerplate removal by link-density scoring in the
  spirit of Arc90 readability / boilerpipe: every container element is
  scored ``text_chars - 2 * link_text_chars`` (link-dense nav blocks
  go negative) and the best-scoring container's text is returned RAW —
  entity-decoded but whitespace-preserved — so a page whose main block
  wraps the source text reproduces it byte-identically. That makes the
  invariant executable: ``main_content(page.html) == page.text``.

Parsing is stdlib ``html.parser`` (no external deps), tolerant of
unclosed/mis-nested tags. The Spark wrapper ``extract_df`` is a
mapInArrow batch map — per-document Python is the honest cost of HTML
parsing (same stance as the media decoders); the job shape is a narrow
CPU-bound map with no shuffle, which scales linearly with executors.

No counterpart exists in the reference repo — this is pipeline surface
the reference lacks (cited: reference has no HTML handling at all).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pyarrow as pa

_SKIP = {"script", "style", "noscript", "template", "head", "title"}
# elements whose aggregated text competes for "main content"
_CANDIDATES = {"body", "main", "article", "section", "div", "td"}
_BLOCK = _CANDIDATES | {
    "p", "li", "ul", "ol", "table", "tr", "blockquote", "pre", "h1",
    "h2", "h3", "h4", "h5", "h6", "header", "footer", "nav", "aside",
    "form", "figure", "br", "hr",
}
_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base",
         "col", "embed", "source", "track", "wbr"}


class _Extractor(HTMLParser):
    """One pass: collects per-container aggregated text + link text
    (for main-content scoring) and the flat visible-text chunk list."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._skip = 0          # depth of open skip elements
        self._links = 0         # depth of open <a>
        self._stack: list[dict] = []   # open container elements
        self.containers: list[dict] = []  # all, in document order
        self.chunks: list[str] = []    # visible text + "\n" markers

    # -- tag events -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            if tag in ("br", "hr") and not self._skip:
                self.chunks.append("\n")
            return
        if tag in _SKIP:
            self._skip += 1
            return
        if tag == "a":
            self._links += 1
        if tag in _CANDIDATES:
            node = {"tag": tag, "parts": [], "links": 0,
                    "order": len(self.containers)}
            self._stack.append(node)
            self.containers.append(node)
        if tag in _BLOCK and not self._skip:
            self.chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a":
            self._links = max(0, self._links - 1)
        if tag in _CANDIDATES:
            # tolerate mis-nesting: pop to the nearest matching open tag
            for i in range(len(self._stack) - 1, -1, -1):
                if self._stack[i]["tag"] == tag:
                    del self._stack[i:]
                    break
        if tag in _BLOCK and not self._skip:
            self.chunks.append("\n")

    # -- text -----------------------------------------------------------
    def handle_data(self, data):
        if self._skip or not data:
            return
        self.chunks.append(data)
        n_link = len(data) if self._links else 0
        for node in self._stack:
            node["parts"].append(data)
            node["links"] += n_link


def _parse(html) -> _Extractor:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    return p


def main_content(html) -> str:
    """Best-scoring container's raw text (entities decoded, whitespace
    preserved). Empty string when the page has no scoring container or
    no text at all."""
    p = _parse(html)
    best, best_score = None, None
    for node in p.containers:
        total = sum(len(s) for s in node["parts"])
        score = total - 2 * node["links"]
        # only positive scores qualify: a page that is ALL link chrome
        # has no main content. strict > keeps the EARLIEST max
        # (outermost wrapper of a tie).
        if score > 0 and (best_score is None or score > best_score):
            best, best_score = node, score
    return "".join(best["parts"]) if best else ""


def visible_text(html) -> str:
    """Rendered-text approximation: block boundaries become newlines,
    runs of whitespace collapse within a line, blank lines drop."""
    p = _parse(html)
    lines, cur = [], []
    for c in p.chunks:
        if c == "\n":
            line = " ".join("".join(cur).split())
            if line:
                lines.append(line)
            cur = []
        else:
            cur.append(c)
    line = " ".join("".join(cur).split())
    if line:
        lines.append(line)
    return "\n".join(lines)


_MODES = {"main": main_content, "visible": visible_text}


def extract_df(df, html_col: str = "html", mode: str = "main",
               out_col: str = "text"):
    """Append/replace ``out_col`` = extracted text of ``html_col``.
    Narrow mapInArrow (no shuffle); NULL html -> NULL text."""
    fn_extract = _MODES[mode]
    fields = [f for f in df.schema.fields if f.name != out_col]
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in fields) + f", {out_col} string"
    names = [f.name for f in fields] + [out_col]

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from orc_haskell_spark.engine import clamp_worker_threads

        clamp_worker_threads()
        for b in batches:
            html = b.column(html_col).to_pylist()
            texts = [None if h is None else fn_extract(h) for h in html]
            arrays = [b.column(f.name) for f in fields] + \
                [pa.array(texts, pa.string())]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(fn, ddl)


def escape_html_text(s: str) -> str:
    """The wrap-side escape whose decode ``main_content`` inverts:
    &, <, > to entities. Escaping every '&' neutralizes anything in the
    source that LOOKS like an entity, so decode is an exact inverse."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
