"""PDF-layout payload parsing: XY-cut reading order over positioned spans.

Deterministic replacement for the reference's per-image OCR+structuring
step (``mistralocr_app.py:272-503``): instead of a remote vision model,
we parse a JSON payload of positioned text spans

    {"pages": [{"w": 612, "h": 792,
                "spans": [{"x":..,"y":..,"w":..,"h":..,"text":..}, ...]}]}

into reading-order Markdown text:

1. **Column detection (the X cut)**: project spans onto the x axis and
   find a vertical gutter — an x interval of width >= COLUMN_GAP not
   covered by any span, with a non-trivial number of spans on each
   side.  At most one cut (1-2 columns), matching the fixture contract.
2. **Reading order**: columns left-to-right; within a column, sort spans
   by (y, x).
3. **Line/paragraph assembly (the Y cut)**: spans whose y differ by
   <= LINE_TOL merge into one line (joined by a single space, in x
   order); consecutive lines with a y gap > PARA_GAP are separated by a
   blank line (paragraph break).
4. Pages join with a blank line.

Raises ``ValueError`` on malformed JSON / missing fields — the Ray stage
converts that into ``status="error"`` rows (error-as-value, matching
``mistralocr_app.py:396-400`` semantics).
"""

from __future__ import annotations

import json
from operator import itemgetter

COLUMN_GAP = 18.0   # min gutter width (pt) to declare a second column
LINE_TOL = 3.0      # max |dy| for spans to share a line
PARA_GAP = 18.0     # min y gap between lines to start a new paragraph
MIN_COLUMN_SPANS = 2

# Spans are converted ONCE per page from dicts to (x, y, text, span)
# tuples (the dict lookups + float() conversions repeated per sort key
# dominated the kernel profile); sort keys are itemgetters restricted
# to exactly the fields the original keyed on, so equal-key spans keep
# their stable order and the text field never participates in a
# comparison. ``w`` stays a lazy dict access — the original only reads
# it on pages large enough to column-split, and a sub-4-span page with
# missing/odd ``w`` must keep rendering. Differential-tested against
# the straightforward implementation (TestLayoutParity).
_BY_YX = itemgetter(1, 0)
_BY_X = itemgetter(0)


def _split_columns(pts: list[tuple]) -> list[list[tuple]]:
    """Return (x, y, text, span) tuples grouped into 1 or 2 columns
    (left-to-right)."""
    if len(pts) < 2 * MIN_COLUMN_SPANS:
        return [pts]
    # Coverage intervals on x, merged; the widest uncovered gap is the gutter.
    iv = sorted((p[0], p[0] + float(p[3]["w"])) for p in pts)
    merged: list[list[float]] = [list(iv[0])]
    for a, b in iv[1:]:
        if a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    best_cut, best_gap = None, COLUMN_GAP
    for (a0, b0), (a1, b1) in zip(merged, merged[1:]):
        gap = a1 - b0
        if gap >= best_gap:
            best_gap, best_cut = gap, (b0 + a1) / 2.0
    if best_cut is None:
        return [pts]
    left = [p for p in pts if p[0] + float(p[3]["w"]) / 2.0 < best_cut]
    right = [p for p in pts if p[0] + float(p[3]["w"]) / 2.0 >= best_cut]
    if len(left) < MIN_COLUMN_SPANS or len(right) < MIN_COLUMN_SPANS:
        return [pts]
    return [left, right]


def _column_text(pts: list[tuple]) -> str:
    pts = sorted(pts, key=_BY_YX)
    lines: list[tuple[float, list[tuple]]] = []
    for p in pts:
        y = p[1]
        if lines and abs(y - lines[-1][0]) <= LINE_TOL:
            lines[-1][1].append(p)
        else:
            lines.append((y, [p]))
    out: list[str] = []
    prev_y: float | None = None
    for y, line_pts in lines:
        line_pts.sort(key=_BY_X)
        text = " ".join(str(p[2]).strip() for p in line_pts).strip()
        if not text:
            continue
        if prev_y is not None and (y - prev_y) > PARA_GAP:
            out.append("")
        out.append(text)
        prev_y = y
    return "\n".join(out)


def layout_to_markdown(payload: str) -> str:
    """Parse a layout-JSON payload into reading-order text.

    Raises ValueError on malformed input (caller maps to status='error').
    """
    try:
        doc = json.loads(payload)
    except (json.JSONDecodeError, TypeError) as e:
        raise ValueError(f"malformed layout JSON: {e}") from e
    if not isinstance(doc, dict) or "pages" not in doc:
        raise ValueError("layout JSON missing 'pages'")
    pages_out: list[str] = []
    for page in doc["pages"]:
        spans = page.get("spans", [])
        if not isinstance(spans, list):
            raise ValueError("'spans' must be a list")
        pts = [(float(s["x"]), float(s["y"]), s["text"], s)
               for s in spans if s.get("text")]
        cols = _split_columns(pts)
        col_texts = [t for t in (_column_text(c) for c in cols) if t]
        if col_texts:
            pages_out.append("\n\n".join(col_texts))
    return "\n\n".join(pages_out)
