"""Zero-copy-ish Arrow list<float> -> numpy matrix conversion.

Every similarity / embedding-dedup stage needs the batch's embedding
column as a dense (n, dim) float64 matrix. ``to_pylist()`` materializes
n Python lists of Python floats first (measured ~20x the cost of the
matmul it feeds at 128-dim); flattening the Arrow list buffer and
reshaping touches only the values buffer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_matrix(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Fixed-width list column -> (n, dim) float64 matrix.

    Assumes every list has the same length (an embedding column
    invariant); raises ValueError otherwise rather than silently
    misaligning rows.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if flat.size % n != 0:
        raise ValueError(
            f"ragged list column: {flat.size} values over {n} rows")
    dim = flat.size // n
    # a FixedSizeListArray is uniform by type; variable list columns
    # must prove uniform offsets for the reshape to be row-aligned
    if not pa.types.is_fixed_size_list(col.type):
        offsets = np.asarray(col.offsets)
        if not (np.diff(offsets) == dim).all():
            raise ValueError("list column has non-uniform lengths")
    return flat.reshape(n, dim)


def topk_prune(ids: np.ndarray, sims: np.ndarray, k: int):
    """Per-batch top-k prune with the oracle's FULL tie-break (score
    desc, id asc). A bare ``np.argpartition`` breaks score ties
    arbitrarily, so the pruned row set could diverge from the SQL
    ``ORDER BY score DESC, id`` cut when ties straddle the k boundary
    — every kNN scorer must prune through this one helper (CLAUDE.md)."""
    if len(ids) <= k:
        return ids, sims
    order = np.lexsort((ids, -sims))[:k]
    return ids[order], sims[order]


def normalize_rows(M: np.ndarray) -> np.ndarray:
    """Row-L2-normalize with zero-vector safety: an all-zero row (the
    deterministic embedder emits one for texts shorter than its n-gram
    width) stays all-zero instead of becoming a NaN row that poisons
    argmax assignment and top-k sorts downstream. The floor is
    dtype-aware — a fixed 1e-300 would underflow to 0.0 in float32 and
    silently reintroduce the 0/0 NaN."""
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    tiny = np.finfo(norms.dtype).tiny if norms.dtype.kind == "f" else 1e-300
    return M / np.maximum(norms, tiny)
