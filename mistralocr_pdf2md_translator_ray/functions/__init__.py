"""Pure, deterministic extraction kernels.

These functions are the single source of truth for transform semantics:
the pytest golden oracle runs them in a single-process loop, and the Ray
stages run the *same* functions inside ``map_batches`` actors. Per-turn
byte equality between the two is therefore an invariant of the plumbing
(ordering, keying, error routing), which is exactly what the north rule
tests.
"""

from .html_extract import html_to_markdown
from .layout import layout_to_markdown
from .markdown import normalize_markdown
from .scalars import (
    sanitize_id,
    strip_json_fences,
    pretty_json,
    splice_children,
    join_pages,
    decode_data_url,
    encode_data_url,
    inline_children,
    combined_preview,
    PAGE_SEPARATOR,
)
from .textstats import (
    token_count,
    tokenize,
    lang_id,
    quality_score,
    fingerprint64,
)
from .extract import extract_turn, extract_child_payload, process_turn

__all__ = [
    "html_to_markdown",
    "layout_to_markdown",
    "normalize_markdown",
    "sanitize_id",
    "strip_json_fences",
    "pretty_json",
    "splice_children",
    "join_pages",
    "decode_data_url",
    "encode_data_url",
    "inline_children",
    "combined_preview",
    "PAGE_SEPARATOR",
    "token_count",
    "tokenize",
    "lang_id",
    "quality_score",
    "fingerprint64",
    "extract_turn",
    "extract_child_payload",
    "process_turn",
]
