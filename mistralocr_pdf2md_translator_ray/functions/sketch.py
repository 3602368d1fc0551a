"""Mergeable sketches: HyperLogLog approximate distinct count.

The scale pattern for distinct counting (guide: "emit one serialized
sketch per batch and merge them in a second, tiny stage"): each batch
produces a 4KiB register array; merging is an elementwise max, so the
shuffle moves sketches, never values. Standard HLL with the
Flajolet-Fouque-Gandouet-Meunier bias corrections; p=12 gives ~1.6%
relative error.
"""

from __future__ import annotations

import numpy as np

P = 12
M = 1 << P
_REST_BITS = 64 - P


def hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit scramble of int64/uint64 values
    (splitmix64 finalizer — process-independent, unlike hash())."""
    x = values.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def hll_partial(hashes: np.ndarray) -> np.ndarray:
    """Register array (uint8[M]) for one batch of 64-bit hashes."""
    reg = np.zeros(M, dtype=np.uint8)
    if len(hashes) == 0:
        return reg
    idx = (hashes >> np.uint64(_REST_BITS)).astype(np.int64)
    rest = hashes & np.uint64((1 << _REST_BITS) - 1)
    # bit_length via exact float64 log2 (rest < 2^52, exactly representable)
    bl = np.where(rest > 0,
                  np.floor(np.log2(rest.astype(np.float64))).astype(np.int64) + 1,
                  0)
    rank = (_REST_BITS - bl + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected cardinality estimate."""
    alpha = 0.7213 / (1.0 + 1.079 / M)
    inv = np.power(2.0, -reg.astype(np.float64))
    raw = alpha * M * M / inv.sum()
    zeros = int((reg == 0).sum())
    if raw <= 2.5 * M and zeros > 0:
        return M * np.log(M / zeros)  # linear counting small-range fix
    return raw


# ---------------------------------------------------------------------------
# Bloom filter: mergeable membership sketch for semi-join pushdown.
# Build over the SMALL side's keys (per-block bitmaps OR-merge), then
# prefilter the fact side per batch before the exact join — false
# positives only cost exact-join work, never correctness; false
# negatives cannot occur by construction.
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 21   # 2 MiB bitmap -> <1% FP at ~1M keys with k=7
BLOOM_K = 7


def _bloom_bit_positions(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) bit indices via double hashing h1 + i*h2."""
    h1 = hash64(keys)
    h2 = hash64(keys.astype(np.uint64) ^ np.uint64(0xA076_1D64_78BD_642F)) \
        | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(n_bits)).astype(np.int64)


def bloom_partial(keys: np.ndarray, n_bits: int = BLOOM_BITS,
                  k: int = BLOOM_K) -> np.ndarray:
    """int64 keys -> packed uint8 bitmap (n_bits/8 bytes)."""
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(keys) == 0:
        return bitmap
    pos = _bloom_bit_positions(np.asarray(keys, dtype=np.int64),
                               n_bits, k).ravel()
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a | b


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray,
                   n_bits: int = BLOOM_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership probe -> bool ndarray (no false negatives)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_bit_positions(np.asarray(keys, dtype=np.int64), n_bits, k)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


# ---------------------------------------------------------------------------
# Merging t-digest: mergeable approximate-quantile sketch. The exact
# distributed path (histogram narrowing, pipelines/library.py) costs a
# scan per round; a digest answers ANY quantile from one pass at
# bounded size. Centroids are (mean, weight) pairs; compression caps
# each centroid's weight share by the scale function
# k(q) = delta/(2*pi) * asin(2q-1), which keeps extreme quantiles
# sharp. Deterministic: no RNG anywhere — merging concatenates sorted
# centroid lists and re-compresses.
# ---------------------------------------------------------------------------

TDIGEST_DELTA = 200


def _k_scale(q: np.ndarray, delta: int) -> np.ndarray:
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def _compress(means: np.ndarray, weights: np.ndarray,
              delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (means, weights) -> merged centroid list obeying the
    k-scale size bound."""
    if len(means) == 0:
        return means, weights
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_before / total
        q2 = (w_before + cur_w + w) / total
        if _k_scale(np.array([q2]), delta)[0] - _k_scale(np.array([q0]), delta)[0] <= 1.0:
            # merge into the current centroid (weighted mean)
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m, dtype=np.float64), np.array(out_w, dtype=np.float64)


def tdigest_build(values: np.ndarray,
                  delta: int = TDIGEST_DELTA) -> tuple[np.ndarray, np.ndarray]:
    """Values -> digest (means, weights), fully vectorized: sorted
    values cluster at the k-scale's integer boundaries (q_i where
    k(q_i) is integral, i.e. q_i = (sin(2*pi*i/delta)+1)/2), so every
    centroid is exactly at its capacity — same guarantee as the greedy
    compressor without the per-value Python loop (the loop remains only
    in merge, over <= ~4*delta centroids)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = len(v)
    if n == 0:
        return v, v.copy()
    ks = np.arange(int(np.ceil(-delta / 4)), int(np.floor(delta / 4)) + 1)
    qb = (np.sin(2.0 * np.pi * ks / delta) + 1.0) / 2.0
    idx = np.unique(np.clip(np.round(qb * n).astype(np.int64), 0, n))
    idx = idx[(idx > 0) & (idx < n)]
    starts = np.concatenate([[0], idx])
    sums = np.add.reduceat(v, starts)
    counts = np.diff(np.concatenate([starts, [n]])).astype(np.float64)
    return sums / counts, counts


def tdigest_merge(a: tuple[np.ndarray, np.ndarray],
                  b: tuple[np.ndarray, np.ndarray],
                  delta: int = TDIGEST_DELTA) -> tuple[np.ndarray, np.ndarray]:
    means = np.concatenate([a[0], b[0]])
    weights = np.concatenate([a[1], b[1]])
    order = np.argsort(means, kind="mergesort")
    return _compress(means[order], weights[order], delta)


def tdigest_quantile(digest: tuple[np.ndarray, np.ndarray], q: float) -> float:
    """Quantile estimate by linear interpolation between centroid
    midpoints (standard t-digest interpolation)."""
    means, weights = digest
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    # cumulative weight at each centroid's MIDPOINT
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


# ---------------------------------------------------------------------------
# Misra-Gries mergeable heavy hitters (Agarwal et al., "Mergeable
# Summaries"): a bounded summary of m (key, count) pairs whose
# estimates UNDERCOUNT by at most the summary's accumulated error
# err_total, with err_total <= n/(m+1). Merging = sum shared keys,
# re-truncate to m by subtracting the (m+1)-th largest count. The
# shuffle moves m-sized summaries, never the key grid — the
# approximate rung of the heavy-hitter family (exact rung:
# top_users_by_events' per-bucket pushdown).
# ---------------------------------------------------------------------------

MG_M = 256


def mg_build(keys: np.ndarray, counts: np.ndarray,
             m: int = MG_M) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact per-batch (key, count) pairs -> MG summary
    (keys, counts, err). Keys must be int64; counts positive int64.
    If <= m distinct keys the summary is exact (err 0)."""
    keys = np.asarray(keys, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if len(keys) <= m:
        return keys, counts, 0
    order = np.argsort(-counts, kind="mergesort")
    dec = int(counts[order[m]])  # the (m+1)-th largest count
    keep = order[:m]
    new_counts = counts[keep] - dec
    mask = new_counts > 0
    return keys[keep][mask], new_counts[mask], dec


def mg_merge(a: tuple[np.ndarray, np.ndarray, int],
             b: tuple[np.ndarray, np.ndarray, int],
             m: int = MG_M) -> tuple[np.ndarray, np.ndarray, int]:
    """Merge two MG summaries: sum counts of shared keys, then
    re-truncate to m. err adds (each decrement is a further global
    undercount)."""
    ak, ac, ae = a
    bk, bc, be = b
    keys = np.concatenate([ak, bk])
    counts = np.concatenate([ac, bc])
    uk, inv = np.unique(keys, return_inverse=True)
    summed = np.zeros(len(uk), dtype=np.int64)
    np.add.at(summed, inv, counts)
    k2, c2, dec = mg_build(uk, summed, m)
    return k2, c2, ae + be + dec


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan): mergeable point-frequency
# estimator. d x w counter grid; each key increments one cell per row
# (double hashing), a query takes the MIN across rows. Estimates never
# undercount; overcount <= (e/w)*N with probability 1 - e^-d per key.
# Complements the family: HLL (distinct), t-digest (quantiles),
# Misra-Gries (heavy-hitter KEYS), Bloom (membership) — CMS answers
# "how often did THIS key occur" without ever shuffling the key grid.
# Merging is elementwise +, so the shuffle moves d*w*8-byte grids only.
# ---------------------------------------------------------------------------

CMS_W = 2048
CMS_D = 4


def _cms_positions(keys: np.ndarray, w: int, d: int) -> np.ndarray:
    """(len(keys), d) column indices via double hashing h1 + j*h2."""
    k = np.asarray(keys, dtype=np.int64)
    h1 = hash64(k)
    h2 = hash64(k.astype(np.uint64) ^ np.uint64(0xD6E8_FEB8_6659_FD93)) \
        | np.uint64(1)
    j = np.arange(d, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + j[None, :] * h2[:, None])
                % np.uint64(w)).astype(np.int64)


def cms_partial(keys: np.ndarray, counts: np.ndarray | None = None,
                w: int = CMS_W, d: int = CMS_D) -> np.ndarray:
    """int64 keys (+ optional positive counts) -> (d, w) int64 grid."""
    tbl = np.zeros((d, w), dtype=np.int64)
    if len(keys) == 0:
        return tbl
    pos = _cms_positions(keys, w, d)
    c = (np.ones(len(keys), dtype=np.int64) if counts is None
         else np.asarray(counts, dtype=np.int64))
    for j in range(d):
        np.add.at(tbl[j], pos[:, j], c)
    return tbl


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query(tbl: np.ndarray, keys: np.ndarray,
              w: int = CMS_W, d: int = CMS_D) -> np.ndarray:
    """Point-frequency estimates (int64, never below the true count)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    pos = _cms_positions(keys, w, d)
    ests = tbl[np.arange(d)[None, :], pos]  # (n, d)
    return ests.min(axis=1)
