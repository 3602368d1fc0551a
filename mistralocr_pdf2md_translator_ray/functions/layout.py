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

COLUMN_GAP = 18.0   # min gutter width (pt) to declare a second column
LINE_TOL = 3.0      # max |dy| for spans to share a line
PARA_GAP = 18.0     # min y gap between lines to start a new paragraph
MIN_COLUMN_SPANS = 2


def _split_columns(spans: list[dict]) -> list[list[dict]]:
    """Return spans grouped into 1 or 2 columns (left-to-right)."""
    if len(spans) < 2 * MIN_COLUMN_SPANS:
        return [spans]
    # Coverage intervals on x, merged; the widest uncovered gap is the gutter.
    iv = sorted((float(s["x"]), float(s["x"]) + float(s["w"])) for s in spans)
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
        return [spans]
    left = [s for s in spans if float(s["x"]) + float(s["w"]) / 2.0 < best_cut]
    right = [s for s in spans if float(s["x"]) + float(s["w"]) / 2.0 >= best_cut]
    if len(left) < MIN_COLUMN_SPANS or len(right) < MIN_COLUMN_SPANS:
        return [spans]
    return [left, right]


def _column_text(spans: list[dict]) -> str:
    spans = sorted(spans, key=lambda s: (float(s["y"]), float(s["x"])))
    lines: list[tuple[float, list[dict]]] = []
    for s in spans:
        y = float(s["y"])
        if lines and abs(y - lines[-1][0]) <= LINE_TOL:
            lines[-1][1].append(s)
        else:
            lines.append((y, [s]))
    out: list[str] = []
    prev_y: float | None = None
    for y, line_spans in lines:
        line_spans.sort(key=lambda s: float(s["x"]))
        text = " ".join(str(s["text"]).strip() for s in line_spans).strip()
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
        cols = _split_columns([s for s in spans if s.get("text")])
        col_texts = [t for t in (_column_text(c) for c in cols) if t]
        if col_texts:
            pages_out.append("\n\n".join(col_texts))
    return "\n\n".join(pages_out)
