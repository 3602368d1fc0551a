"""Per-turn extraction dispatch + child-payload structuring.

``extract_turn`` is the single-row semantic of the flagship pipeline:
route by the ``tool`` column (the reference's model dispatch,
``mistralocr_app.py:284-501`` / ``:155-204``), extract, normalize.
Errors become values — ``(md, status, error)`` — never exceptions
(``mistralocr_app.py:216``, ``:396-400`` semantics).

``extract_child_payload`` is the ST5 analog: payload bytes -> a
StructuredOCR-shaped pretty JSON string with fixed outer keys
``{file_name, topics, languages, ocr_contents}``
(``mistralocr_app.py:54-58``).
"""

from __future__ import annotations

import json

from .html_extract import html_to_markdown
from .layout import layout_to_markdown
from .markdown import normalize_markdown
from .textstats import lang_id

# tool column values -> extractor branch
TOOL_HTML = "html"
TOOL_PDF_LAYOUT = "pdf_layout"
TOOL_MARKDOWN = "markdown"


def extract_turn(text: str, tool: str, extra=None) -> tuple[str, str, str]:
    """(text, tool) -> (raw_md, status, error) — extraction WITHOUT
    normalization (stage order parity with the reference: extract, then
    splice child results, then the text->text transform).

    ``extra`` is an optional {tool: fn} registry consulted first (the
    §2.10 extension surface; see stages/registry.py).

    status is 'ok' or 'error'; on error raw_md carries the reference's
    in-band marker followed by the original text
    (``mistralocr_app.py:216``).
    """
    text = text or ""
    try:
        if extra and tool in extra:
            md = extra[tool](text)
        elif tool == TOOL_HTML:
            md = html_to_markdown(text)
        elif tool == TOOL_PDF_LAYOUT:
            md = layout_to_markdown(text)
        else:  # markdown / "" / unknown -> passthrough
            md = text
        return md, "ok", ""
    except Exception as e:  # noqa: BLE001 — error-as-value discipline
        marker = f"--- ERROR: {type(e).__name__}: {e} ---"
        return marker + "\n\n" + text, "error", f"{type(e).__name__}: {e}"


def process_turn(text: str, tool: str, children: dict[str, str] | None = None,
                 extra=None) -> tuple[str, str, str]:
    """Full per-turn semantic: extract -> splice children -> normalize.

    Stage order mirrors the reference pipeline (doc OCR
    ``mistralocr_app.py:582-597`` -> OCR insertion ``:651-672`` ->
    translate ``:687-712``). Returns (md, status, error).
    """
    from .scalars import splice_children

    raw, status, err = extract_turn(text, tool, extra)
    if children:
        raw = splice_children(raw, children)
    return normalize_markdown(raw), status, err


def extract_child_payload(payload: bytes, payload_id: str, kind: str) -> tuple[str, str]:
    """Payload bytes -> (extracted pretty-JSON string, status).

    The payload is a deterministic JSON blob (FIXTURES.md F2). Output
    schema mirrors StructuredOCR: fixed outer keys, dynamic
    ``ocr_contents`` kept as parsed JSON; malformed payloads yield the
    reference's error-object value (``mistralocr_app.py:396-400``).
    """
    try:
        if isinstance(payload, memoryview):
            payload = payload.tobytes()
        raw = payload.decode("utf-8") if isinstance(payload, (bytes, bytearray)) else str(payload)
        contents = json.loads(raw)
        text_repr = json.dumps(contents, ensure_ascii=False) if not isinstance(contents, str) else contents
        out = {
            "file_name": payload_id,
            "topics": [kind] if kind else [],
            "languages": lang_id(text_repr),
            "ocr_contents": contents,
        }
        return json.dumps(out, indent=2, ensure_ascii=False), "ok"
    except Exception as e:  # noqa: BLE001
        err = {
            "error": f"invalid payload: {type(e).__name__}: {e}",
            "raw_output": repr(payload)[:256],
        }
        return json.dumps(err, indent=2, ensure_ascii=False), "error"
