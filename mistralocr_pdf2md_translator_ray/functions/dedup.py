"""Dedup primitives: shingles, MinHash, SimHash, Jaccard.

All hashing is explicit and process-independent (numpy uint64 wrap
arithmetic + blake2b) — never Python's salted ``hash()``. Vectorized
per document; the Ray stages batch documents and emit sketch rows.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


@functools.lru_cache(maxsize=8)
def _rng_params(n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    # cached: minhash_signature calls this once PER DOCUMENT with the
    # same (n_perm, seed); regenerating the Generator dominated small
    # docs. The cached arrays are shared by every caller in the
    # process, so they are frozen — an in-place write raises instead of
    # silently corrupting every later signature.
    rng = np.random.default_rng(seed)
    # odd multipliers -> bijections of Z/2^64, so per-permutation min is
    # a valid MinHash
    a = rng.integers(1, 1 << 63, size=n, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    a.setflags(write=False)
    b.setflags(write=False)
    return a, b


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Unique 64-bit hashes of the k-byte shingles of utf-8(text)
    (vectorized polynomial rolling hash with uint64 wrap)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(data) < k:
        if len(data) == 0:
            return np.empty(0, dtype=np.uint64)
        data = np.pad(data, (0, k - len(data)), constant_values=32)
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    powers = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64))
    with np.errstate(over="ignore"):
        h = (windows * powers).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def word_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Unique 64-bit hashes of word n-grams (token-level shingles)."""
    from .textstats import tokenize

    toks = tokenize(text)
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks)) if toks else []
    out = set()
    for i in range(max(0, len(toks) - n + 1)):
        gram = " ".join(toks[i:i + n])
        out.add(int.from_bytes(
            hashlib.blake2b(gram.encode("utf-8"), digest_size=8).digest(), "little"))
    return np.array(sorted(out), dtype=np.uint64)


def minhash_signature(shingle_hashes: np.ndarray, n_perm: int = 128,
                      seed: int = 42) -> np.ndarray:
    """MinHash signature (n_perm uint64 values)."""
    a, b = _rng_params(n_perm, seed)
    if len(shingle_hashes) == 0:
        return np.full(n_perm, _MASK64, dtype=np.uint64)
    with np.errstate(over="ignore"):
        grid = shingle_hashes[:, None] * a[None, :] + b[None, :]
    return grid.min(axis=0)


def band_hashes(sig: np.ndarray, bands: int = 16) -> list[int]:
    """LSH banding: hash each contiguous band of the signature."""
    rows = len(sig) // bands
    out = []
    for i in range(bands):
        band = sig[i * rows:(i + 1) * rows].tobytes()
        out.append(int.from_bytes(
            hashlib.blake2b(band, digest_size=8).digest(), "little"))
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted unique hash arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over the token stream (count-weighted bit vote)."""
    from .textstats import tokenize

    toks = tokenize(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hs = np.array(
        [int.from_bytes(hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
                        "little") for t in uniq],
        dtype=np.uint64,
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    result = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            result |= np.uint64(1) << np.uint64(i)
    return int(result)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_bands(h: int, bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into `bands` chunks for exact-match
    blocking (Hamming distance <= bands-1 guarantees one equal chunk)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [(h >> (i * width)) & mask for i in range(bands)]
