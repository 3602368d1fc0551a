"""HTML main-content extraction: boilerplate strip via block scoring.

Deterministic replacement for the reference's document->page-markdown
extractor (``mistralocr_app.py:225-247`` delegates this to a remote OCR
model; per BASELINE.json ``north_star`` we substitute a
Readability/trafilatura-style text-density + link-density heuristic).

Tokenized by a quote-aware single-regex scanner on the common
well-formed subset (see ``_fast_feed``), falling back to the stdlib
``html.parser`` for anything tricky (lxml/selectolax are not available
in this environment) — both drive the same block extractor, so
malformed HTML degrades gracefully instead of raising and the two
paths cannot disagree (differential-tested).

Algorithm
---------
1. Parse into a flat list of *blocks* — one per block-level element that
   directly holds text (p, h1..h6, li, pre, blockquote, td/th rows are
   merged per tr).
2. Each block records: tag, text, number of link characters (text inside
   <a>), and whether any ancestor is a boilerplate container
   (nav/header/footer/aside/form/script/style/template/button/select).
3. Keep a block iff it is not inside a boilerplate container AND its
   link density (link_chars / chars) < 0.33 AND (it is a heading, a code
   block, or its text length >= MIN_TEXT_LEN).
4. Emit Markdown: headings -> ATX #, li -> "- ", pre -> fenced code,
   blockquote -> "> ", tr -> pipe-table row, p/div -> paragraph.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

MIN_TEXT_LEN = 25
MAX_LINK_DENSITY = 0.33

_BOILERPLATE_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "form", "script", "style",
     "template", "button", "select", "noscript", "iframe"}
)
_BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
     "td", "th", "tr", "div", "article", "section", "main", "table",
     "ul", "ol", "body", "html", "figcaption", "caption"}
)
# Tags whose own direct text forms an emitted block.
_LEAF_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
     "figcaption", "caption"}
)
_HEADING_LEVEL = {f"h{i}": i for i in range(1, 7)}

# Single-lookup tag dispatch for the parser hooks: the five action
# categories are DISJOINT (asserted below), so one dict get replaces
# the 4-6 sequential set-membership tests each hook ran per tag —
# those hooks fire twice per tag over the whole corpus. Tags reach the
# hooks already lowercased (both the fast scanner and stdlib
# HTMLParser lower before calling — parser.py:313,398,407).
_C_BOILER, _C_LINK, _C_BR, _C_CELL, _C_ROW, _C_LEAF = range(6)
_TAG_CODE = {
    **{t: _C_BOILER for t in _BOILERPLATE_TAGS},
    "a": _C_LINK, "br": _C_BR, "td": _C_CELL, "th": _C_CELL,
    "tr": _C_ROW,
    **{t: _C_LEAF for t in _LEAF_TAGS},
}
assert len(_TAG_CODE) == len(_BOILERPLATE_TAGS) + len(_LEAF_TAGS) + 5, \
    "tag categories must stay disjoint for single-code dispatch"

# Matches only horizontal-ws runs that NEED collapsing (len>=2, or a
# single non-space ws char): on the typical segment whose runs are all
# single spaces, sub() finds nothing and returns the SAME object —
# equivalent to the plain r"[ \t\r\f\v]+" -> " " rewrite on every
# maximal run (a single " " run rewrites to itself), proven on 200k
# randomized ws-heavy strings + the full-corpus byte-stability sweep.
_WS_RE = re.compile(r"[ \t\r\f\v]{2,}|[\t\r\f\v]")
_NL_RE = re.compile(r"\n{2,}")


def _collapse_ws(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


class _Block:
    __slots__ = ("tag", "parts", "link_chars", "boiler", "cells", "text")

    def __init__(self, tag: str, boiler: bool):
        self.tag = tag
        self.parts: list[str] = []
        self.link_chars = 0
        self.boiler = boiler
        self.cells: list[str] | None = [] if tag == "tr" else None
        # collapsed text, computed ONCE at flush time (_keep and _emit
        # both read it; the old recomputing property tripled the
        # join+regex work per block)
        self.text = ""


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._boiler_depth = 0
        self._link_depth = 0
        self._cur: _Block | None = None
        self._cell_parts: list[str] | None = None

    # -- helpers ---------------------------------------------------------
    def _open_block(self, tag: str) -> None:
        self._flush()
        self._cur = _Block(tag, self._boiler_depth > 0)

    def _flush(self) -> None:
        b = self._cur
        if b is None:
            return
        self._cur = None
        if b.cells is not None:
            if self._cell_parts is not None:
                b.cells.append(_collapse_ws("".join(self._cell_parts)))
                self._cell_parts = None
            b.cells = [c for c in b.cells if c]
            if b.cells:
                self.blocks.append(b)
            return
        b.text = _collapse_ws("".join(b.parts))
        if b.text:
            self.blocks.append(b)

    # -- HTMLParser hooks (tags arrive lowercase from both callers) ------
    def handle_starttag(self, tag: str, attrs) -> None:
        code = _TAG_CODE.get(tag)
        if code is None:
            return
        if code == _C_LEAF:
            self._open_block(tag)
        elif code == _C_BOILER:
            self._boiler_depth += 1
        elif code == _C_LINK:
            self._link_depth += 1
        elif code == _C_BR:
            if self._cur is not None:
                (self._cell_parts if self._cell_parts is not None
                 else self._cur.parts).append(" ")
        elif code == _C_CELL:
            if self._cur is not None and self._cur.cells is not None:
                if self._cell_parts is not None:
                    self._cur.cells.append(
                        _collapse_ws("".join(self._cell_parts)))
                self._cell_parts = []
        else:  # _C_ROW
            self._open_block("tr")

    def handle_endtag(self, tag: str) -> None:
        code = _TAG_CODE.get(tag)
        if code is None:
            return
        if code == _C_LEAF or code == _C_ROW:
            self._flush()
        elif code == _C_BOILER:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        elif code == _C_LINK:
            self._link_depth = max(0, self._link_depth - 1)
        elif code == _C_CELL:
            if self._cur is not None and self._cur.cells is not None:
                if self._cell_parts is not None:
                    self._cur.cells.append(
                        _collapse_ws("".join(self._cell_parts)))
                    self._cell_parts = None
        # _C_BR: end tag has no action (matches the original hook)

    def handle_data(self, data: str) -> None:
        if not data:
            return
        if self._cur is None:
            # bare text directly under a container: start an implicit <p>
            if data.strip():
                self._open_block("p")
            else:
                return
        target = (self._cell_parts if self._cell_parts is not None
                  else self._cur.parts)
        target.append(data)
        if self._link_depth > 0:
            self._cur.link_chars += len(data.strip())

    def close(self) -> None:  # type: ignore[override]
        super().close()
        self._flush()


def _keep(b: _Block) -> bool:
    if b.boiler:
        return False
    if b.tag in _HEADING_LEVEL or b.tag == "pre":
        return bool(b.text or b.tag == "pre")
    text = " | ".join(b.cells) if b.cells is not None else b.text
    n = len(text)
    if n == 0:
        return False
    if b.link_chars / n > MAX_LINK_DENSITY:
        return False
    if b.cells is not None:
        return True
    return n >= MIN_TEXT_LEN


def _emit(b: _Block) -> str:
    if b.tag in _HEADING_LEVEL:
        return "#" * _HEADING_LEVEL[b.tag] + " " + b.text
    if b.tag == "li":
        return "- " + b.text
    if b.tag == "pre":
        return "```\n" + "".join(b.parts).strip("\n") + "\n```"
    if b.tag == "blockquote":
        return "> " + b.text
    if b.cells is not None:
        return "| " + " | ".join(b.cells) + " |"
    return b.text


class _FallbackNeeded(Exception):
    """Raised by the fast scanner on any construct whose tokenization
    might diverge from HTMLParser; the caller re-parses with the stdlib
    parser (identical semantics, ~3x slower)."""


# One quote-aware tag token: <(/)(name)(attrs)> where attrs may contain
# '>' inside quoted values. Name charset == HTMLParser's
# tagfind_tolerant; the quoted-run alternation mirrors its
# locatestarttagend_tolerant behavior of letting quoted values swallow
# '>' characters.
_FAST_TAG_RE = re.compile(
    r"""<(/?)([a-zA-Z][^\t\n\r\f />\x00]*)((?:"[^"]*"|'[^']*'|[^'">])*)>""")
# a quote-bearing attrs span rides the fast path ONLY if it is a
# strictly well-formed attribute sequence: ws + name (no '='/quote/'/'
# leading chars) + optional = value. On that subset HTMLParser's
# tolerant grammar tokenizes identically (quoted VALUES swallow '>');
# anything looser — e.g. a bare '=' before a quote, which HTMLParser
# reads as an attribute NAME so the tag ends at the first '>' — falls
# back to the stdlib parser rather than risk a span divergence
_ATTRS_QUOTES_OK_RE = re.compile(
    r"""^(?:\s+[^\s/>="'][^\s/>=]*(?:\s*=\s*(?:"[^"]*"|'[^']*'|[^\s>"']*))?)*\s*/?\s*$""")

from html import unescape as _unescape  # noqa: E402  (stdlib, tiny)


def _fast_feed(html: str, ex: _Extractor) -> None:
    """Tokenize well-formed-ish HTML with ONE compiled regex and drive
    the SAME ``_Extractor`` hooks HTMLParser would (the block-building
    semantics live only there, so the two paths cannot drift). The
    stdlib parser spends most of its time in char-by-char bookkeeping
    (goahead/updatepos/parse_starttag, ~60%% of extraction kernel time);
    this scanner is ~3x faster on the hot corpus. Anything it is not
    bit-sure about — comments/declarations/PIs, script/style CDATA
    mode, bogus '<', end tags with attribute junk, unterminated tags —
    raises ``_FallbackNeeded`` and the caller uses HTMLParser."""
    pos, n = 0, len(html)
    find = html.find
    # bound-method + match-group hoists: ~900k attribute lookups per
    # 20k-turn batch land in this loop (measured, not guessed)
    handle_data, handle_starttag, handle_endtag = (
        ex.handle_data, ex.handle_starttag, ex.handle_endtag)
    tag_match = _FAST_TAG_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            handle_data(_unescape(html[pos:]))
            return
        if lt > pos:
            # HTMLParser (convert_charrefs=True) delivers each inter-tag
            # gap as ONE unescaped handle_data call — chunking parity
            # matters because link_chars strips per call
            handle_data(_unescape(html[pos:lt]))
        m = tag_match(html, lt)
        if m is None:
            raise _FallbackNeeded  # comment/decl/PI/bogus/unterminated
        closing, tag, attrs = m.group(1, 2, 3)
        tag = tag.lower()
        if tag in ("script", "style"):
            raise _FallbackNeeded  # CDATA content mode
        if closing:
            if attrs.strip():
                raise _FallbackNeeded  # end tag with junk: parser quirks
            handle_endtag(tag)
        elif ("'" in attrs or '"' in attrs) and not _ATTRS_QUOTES_OK_RE.match(attrs):
            # a quote NOT introducing an attribute VALUE (no preceding
            # '='): HTMLParser only lets quoted runs swallow '>' after
            # '=', so our tag span may differ — let the parser decide
            raise _FallbackNeeded
        elif attrs.endswith("/"):
            if len(attrs) == 1 or attrs[-2] in " \t\n\r\f\"'":
                # '/>' self-close when '/' is its own token (after ws,
                # a quoted value, or the bare name)
                handle_starttag(tag, [])
                handle_endtag(tag)
            else:
                # trailing '/' after a bare token: HTMLParser
                # self-closes when the token is an attribute NAME
                # (<nav foo/>) but NOT when it is an unquoted VALUE
                # (<a b=x/>); telling them apart needs the full
                # tolerant attr grammar — let the parser decide
                raise _FallbackNeeded
        else:
            handle_starttag(tag, [])
        pos = m.end()


def html_to_markdown(html: str) -> str:
    """Extract main content from an HTML string as Markdown.

    Deterministic; never raises on malformed input. Tokenized by the
    fast regex scanner when safe, by the (lenient) stdlib parser
    otherwise — both drive the same block extractor, and the two paths
    are differential-tested byte-for-byte. Empty input -> "".
    """
    if not html or not html.strip():
        return ""
    p = _Extractor()
    try:
        _fast_feed(html, p)
        p._flush()
    except _FallbackNeeded:
        p = _Extractor()
        p.feed(html)
        p.close()
    kept = [b for b in p.blocks if _keep(b)]
    out: list[str] = []
    prev_tag = None
    for b in kept:
        line = _emit(b)
        if out and not (
            (b.tag == "li" and prev_tag == "li")
            or (b.cells is not None and prev_tag == "tr")
        ):
            out.append("")
        out.append(line)
        prev_tag = "tr" if b.cells is not None else b.tag
    return "\n".join(out).strip()
