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


def find_placeholders(text: str) -> list[str]:
    """Ordered unique payload ids referenced as ``![id](id)`` in text."""
    seen: list[str] = []
    for m in PLACEHOLDER_RE.finditer(text or ""):
        if m.group(1) not in seen:
            seen.append(m.group(1))
    return seen


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
