"""Markdown normalization: heading/list/table reconstruction.

Deterministic replacement for the reference's per-page LLM translation
transform (``mistralocr_app.py:141-221``) per BASELINE.json
``north_star``: a text->text normalizer applied to every turn's
extracted Markdown.

Rules (applied outside fenced code blocks, which pass through verbatim):
- line endings -> "\\n"; trailing whitespace stripped
- setext headings ("Title" + "====" / "----") -> ATX ("# Title" / "## Title")
- ATX headings: exactly one space after the #'s, trailing #'s removed
- bullet markers "*" / "+" -> "-"; "N)" ordered markers -> "N."
- pipe-table rows: cells trimmed, single "|"-space separators,
  separator rows normalized to "---" cells (alignment colons kept)
- 3+ consecutive blank lines -> 1 blank line; leading/trailing blank
  lines removed
"""

from __future__ import annotations

import re

_SETEXT_H1 = re.compile(r"^=+\s*$")
_SETEXT_H2 = re.compile(r"^-+\s*$")
_ATX = re.compile(r"^(#{1,6})\s*(.*?)\s*#*\s*$")
_BULLET = re.compile(r"^(\s*)[*+]\s+(.*)$")
_ORDERED = re.compile(r"^(\s*)(\d+)\)\s+(.*)$")
_FENCE = re.compile(r"^(```|~~~)")
_TABLE_SEP_CELL = re.compile(r"^(:?)-+(:?)$")


def _norm_table_row(line: str) -> str:
    inner = line.strip()
    cells = [c.strip() for c in inner.strip("|").split("|")]
    if cells and all(_TABLE_SEP_CELL.match(c) for c in cells):
        norm = []
        for c in cells:
            m = _TABLE_SEP_CELL.match(c)
            norm.append(m.group(1) + "---" + m.group(2))
        cells = norm
    return "| " + " | ".join(cells) + " |"


def normalize_markdown(md: str) -> str:
    """Normalize a Markdown string (idempotent; '' -> '')."""
    if not md:
        return ""
    lines = md.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    out: list[str] = []
    in_fence = False
    fence_marker = ""
    i = 0
    n_lines = len(lines)
    while i < n_lines:
        raw = lines[i]
        line = raw.rstrip()
        if in_fence:
            out.append(raw.rstrip("\n"))
            if line.startswith(fence_marker):
                in_fence = False
            i += 1
            continue
        # first-char dispatch: each guard is a necessary condition of
        # its anchored regex, so behavior is identical — but the common
        # plain-text line now skips every regex attempt
        s = line.lstrip()
        first = s[:1]
        if first == "`" or first == "~":
            m = _FENCE.match(s)
            if m:
                in_fence = True
                fence_marker = m.group(1)
                out.append(line)
                i += 1
                continue
        if line and i + 1 < n_lines:
            nxt_first = lines[i + 1][:1]
            if nxt_first == "=" or nxt_first == "-":
                nxt = lines[i + 1].rstrip()
                if _SETEXT_H1.match(nxt):
                    out.append("# " + line.strip())
                    i += 2
                    continue
                if len(nxt) >= 2 and _SETEXT_H2.match(nxt):
                    out.append("## " + line.strip())
                    i += 2
                    continue
        if line[:1] == "#":
            m = _ATX.match(line)
            if m:
                title = m.group(2)
                out.append(m.group(1) + (" " + title if title else ""))
                i += 1
                continue
        if first == "*" or first == "+":
            m = _BULLET.match(line)
            if m:
                out.append(f"{m.group(1)}- {m.group(2)}")
                i += 1
                continue
        if first.isdigit():
            m = _ORDERED.match(line)
            if m:
                out.append(f"{m.group(1)}{m.group(2)}. {m.group(3)}")
                i += 1
                continue
        if first == "|" and line.endswith("|") and "|" in line.strip("| "):
            out.append(_norm_table_row(line))
            i += 1
            continue
        out.append(line)
        i += 1
    # collapse blank runs, trim edges
    collapsed: list[str] = []
    blank = 0
    for line in out:
        if line == "":
            blank += 1
            if blank > 1:
                continue
        else:
            blank = 0
        collapsed.append(line)
    while collapsed and collapsed[0] == "":
        collapsed.pop(0)
    while collapsed and collapsed[-1] == "":
        collapsed.pop()
    return "\n".join(collapsed)


def md_spans(md: str) -> list[dict]:
    """Structural spans over normalized Markdown: contiguous blocks of
    one kind with [start, end) char offsets into ``md``.

    Kinds: heading, list, code, table, quote, separator, paragraph.
    (The reference's page/span structure appears implicitly in its
    Markdown output; here it is an explicit typed column —
    ``spans: list<struct<start,end,kind>>`` — per the north-star data
    model.)
    """
    if not md:
        return []
    # single inlined loop with first-char dispatch (no per-line closure
    # calls): each branch is a necessary condition of the predicate it
    # replaces, so classification is identical to the straightforward
    # version — differential-tested against it (TestMdSpansParity)
    spans: list[dict] = []
    append = spans.append
    pos = 0
    cur_kind: str | None = None
    cur_start = 0
    cur_end = 0
    in_fence = False
    for line in md.split("\n"):
        start = pos
        end = start + len(line)
        pos = end + 1  # skip the newline
        s = line.lstrip()
        if in_fence:
            cur_end = end
            if s[:3] in ("```", "~~~"):
                in_fence = False
                append({"start": cur_start, "end": cur_end, "kind": cur_kind})
                cur_kind = None
            continue
        if not s:
            if cur_kind is not None:
                append({"start": cur_start, "end": cur_end, "kind": cur_kind})
                cur_kind = None
            continue
        c = s[0]
        if c == "`" or c == "~":
            if s[:3] in ("```", "~~~"):
                if cur_kind is not None:
                    append({"start": cur_start, "end": cur_end,
                            "kind": cur_kind})
                cur_kind, cur_start, cur_end = "code", start, end
                in_fence = True
                continue
            kind = "paragraph"
        elif c == "#":
            kind = "heading"
        elif c == "-":
            kind = ("list" if s[1:2] == " "
                    else "separator" if s == "---" else "paragraph")
        elif c == "|":
            kind = "table" if line.rstrip().endswith("|") else "paragraph"
        elif c == ">":
            kind = "quote"
        elif c.isdigit():
            kind = "list" if ". " in s[:5] else "paragraph"
        else:
            kind = "paragraph"
        if kind == cur_kind and (kind == "paragraph" or kind == "list"
                                 or kind == "table" or kind == "quote"):
            cur_end = end
        else:
            if cur_kind is not None:
                append({"start": cur_start, "end": cur_end, "kind": cur_kind})
            cur_kind, cur_start, cur_end = kind, start, end
    if cur_kind is not None:
        append({"start": cur_start, "end": cur_end, "kind": cur_kind})
    return spans
