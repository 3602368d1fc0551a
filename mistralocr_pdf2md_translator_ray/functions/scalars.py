"""Scalar string/JSON functions (SURVEY.md §2.8).

Pure functions reproducing the reference's scalar semantics:
- ``sanitize_id``        — ``stem.replace(" ", "_")`` (mistralocr_app.py:568-569)
- ``strip_json_fences``  — ```` ```json ```` fence stripping (mistralocr_app.py:384-390)
- ``pretty_json``        — ``json.dumps(indent=2, ensure_ascii=False)``
  with error-object fallback (mistralocr_app.py:394-400)
- ``splice_children``    — ``![id](id)`` -> placeholder + fenced child
  result (insert_ocr_below_images, mistralocr_app.py:92-99)
- ``join_pages``         — order-sensitive document concat with the
  ``\\n\\n---\\n\\n`` separator (mistralocr_app.py:716-717)
"""

from __future__ import annotations

import base64
import binascii
import json
import re

PAGE_SEPARATOR = "\n\n---\n\n"
PLACEHOLDER_RE = re.compile(r"!\[([A-Za-z0-9._-]+)\]\(\1\)")


def sanitize_id(stem: str) -> str:
    return stem.replace(" ", "_")


def strip_json_fences(s: str) -> str:
    s = s.strip()
    if s.startswith("```json"):
        s = s[len("```json"):]
    elif s.startswith("```"):
        s = s[3:]
    if s.endswith("```"):
        s = s[:-3]
    return s.strip()


def pretty_json(s: str) -> tuple[str, bool]:
    """Parse+pretty-print a JSON string; on failure return an error
    object *as a value* (never raises) — (result, ok)."""
    try:
        obj = json.loads(strip_json_fences(s))
        return json.dumps(obj, indent=2, ensure_ascii=False), True
    except (json.JSONDecodeError, TypeError) as e:
        err = {"error": f"invalid JSON: {e}", "raw_output": s if isinstance(s, str) else repr(s)}
        return json.dumps(err, indent=2, ensure_ascii=False), False


def decode_data_url(s) -> tuple[bytes, str, bool]:
    """Data-URL -> raw payload bytes (mistralocr_app.py:107, :255-267).

    Handles the reference's prefix variations: ``data:<mime>;base64,``
    head stripped on the first comma; a bare base64 string (no comma)
    decodes as-is. Returns ``(payload, mime, ok)`` — invalid base64 is
    an error VALUE (the reference catches-and-skips; nothing raises).
    """
    if not isinstance(s, str):
        return b"", "", False
    mime = ""
    if "," in s:
        head, b64 = s.split(",", 1)
        if head.startswith("data:"):
            mime = head[5:].split(";")[0]
    else:
        b64 = s
    try:
        # MIME line-wrapped payloads carry whitespace/newlines the
        # reference's lenient decode accepts — strip them, but keep
        # validate=True so genuinely corrupt bodies stay error rows
        return base64.b64decode("".join(b64.split()), validate=True), mime, True
    except (ValueError, binascii.Error):
        return b"", mime, False


def encode_data_url(payload: bytes, mime: str = "application/octet-stream") -> str:
    """Inverse of ``decode_data_url`` (round-trip property-tested)."""
    return f"data:{mime};base64,{base64.b64encode(payload).decode('ascii')}"


def inline_children(md: str, children: dict[str, str]) -> str:
    """M5 strict analog (``replace_images_in_markdown``,
    mistralocr_app.py:76-82): REPLACE each ``![id](id)`` placeholder's
    link target with the child's content (e.g. a data URL), keeping
    unmatched placeholders untouched."""

    def _sub(m: re.Match) -> str:
        pid = m.group(1)
        if pid not in children:
            return m.group(0)
        return f"![{pid}]({children[pid]})"

    return PLACEHOLDER_RE.sub(_sub, md or "")


def combined_preview(pages: list[str]) -> str:
    """``get_combined_markdown`` analog (mistralocr_app.py:84-90): the
    inline-content preview joins pages with a bare blank line — NOT the
    ``\\n\\n---\\n\\n`` separator used for final document output."""
    return "\n\n".join(pages)


def splice_children(md: str, children: dict[str, str]) -> str:
    """Insert each child's extracted JSON below its ``![id](id)``
    placeholder; unmatched placeholders stay untouched (left-outer
    semantics, mistralocr_app.py:92-99)."""
    def _sub(m: re.Match) -> str:
        pid = m.group(1)
        if pid not in children:
            return m.group(0)
        return (
            f"{m.group(0)}\n\n> \U0001F4C4 Extracted:\n\n```json\n{children[pid]}\n```"
        )

    return PLACEHOLDER_RE.sub(_sub, md or "")


def join_pages(pages: list[str]) -> str:
    """Order-sensitive document assembly (the A2 aggregate)."""
    return PAGE_SEPARATOR.join(pages)
