"""Vectorized bucket-id computation for shuffle prologues.

Every bucketed co-group / grouped-assembly stage prepends a
``bucket = hash(key) % B`` column. The round-1 implementation looped
``zlib.crc32`` over ``to_pylist()``; this module hashes the Arrow
column zero-copy through polars' 64-bit seeded hash (measured 4x
faster per million keys, and it skips the Arrow->Python conversion
entirely).

Stability contract: polars' seeded hash is deterministic across
PROCESSES within one library version — exactly what transient shuffle
bucketing needs (all workers of one job agree). It is NOT promised
stable across polars upgrades, so anything persisted across runs
(checkpoint ``part_id``, state/checkpoint.py) stays on crc32.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def bucket_ids(arr: "pa.Array | pa.ChunkedArray", num_buckets: int) -> pa.Array:
    """Arrow column -> int32 bucket ids in [0, num_buckets)."""
    import polars as pl

    h = pl.from_arrow(arr if isinstance(arr, (pa.Array, pa.ChunkedArray))
                      else pa.array(arr)).hash(seed=0)
    return pa.array((h % num_buckets).to_numpy().astype(np.int32))


def bucket_ids_np(values, num_buckets: int) -> np.ndarray:
    """pandas/numpy sequence -> int32 bucket ids (vectorized; for
    pandas-format UDFs that never touch Arrow)."""
    import polars as pl

    s = pl.Series(values) if not isinstance(values, np.ndarray) else pl.Series(values)
    return (s.hash(seed=0) % num_buckets).to_numpy().astype(np.int32)
