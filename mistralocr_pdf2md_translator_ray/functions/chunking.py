"""Training-sequence preparation kernels: fixed-token-window document
chunking and greedy sequence packing.

Both are pure deterministic functions (the repo contract: the Ray
stages and the test oracle call the SAME kernel; tests also keep an
independent straightforward reference). Tokens are whitespace tokens —
``str.split()``, proven equivalent to ``\\S+`` counting over every
codepoint in the token_count suite.
"""

from __future__ import annotations

import numpy as np


def chunk_windows(n_tokens: int, max_tokens: int,
                  overlap: int) -> list[tuple[int, int]]:
    """Sliding [start, end) token windows: stride = max_tokens -
    overlap; consecutive windows overlap by exactly ``overlap`` tokens;
    the final window may be short but never empty; every token is
    covered. A doc that fits yields one window."""
    if max_tokens <= 0 or not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    if n_tokens <= 0:
        return []
    if n_tokens <= max_tokens:
        return [(0, n_tokens)]
    stride = max_tokens - overlap
    out = []
    start = 0
    while True:
        end = min(start + max_tokens, n_tokens)
        out.append((start, end))
        if end >= n_tokens:
            return out
        start += stride


def chunk_doc(text: str, max_tokens: int, overlap: int) -> list[str]:
    """Whitespace-token sliding-window chunks of one document, each
    re-joined with single spaces (training-prep normalization — original
    inter-token whitespace is not preserved)."""
    toks = text.split()
    return [" ".join(toks[s:e])
            for s, e in chunk_windows(len(toks), max_tokens, overlap)]


def pack_greedy(token_counts: np.ndarray, budget: int) -> np.ndarray:
    """Greedy first-fit-in-order sequence packing: docs are taken in
    the given order; a doc joins the current sequence if it fits the
    token budget, else starts a new one. A single doc larger than the
    budget gets its own sequence (never split here — chunk first if
    that matters). Returns one sequence id per doc (0-based,
    monotonically non-decreasing)."""
    counts = np.asarray(token_counts, dtype=np.int64)
    seq = np.empty(len(counts), dtype=np.int64)
    cur, fill = 0, 0
    for i, c in enumerate(counts):
        if fill > 0 and fill + c > budget:
            cur += 1
            fill = 0
        seq[i] = cur
        fill += int(c)
    return seq
