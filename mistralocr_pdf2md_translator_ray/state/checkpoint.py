"""Per-partition Parquet checkpoints with lineage + resume (SURVEY §4).

The reference checkpoints whole stages as pickle blobs and resumes on
file existence (``mistralocr_app.py:523-541``, ``:577-649``). The
distributed equivalent here:

- input rows hash-partition on a key (``part_id = crc32(key) % N`` —
  process-independent, never Python's salted hash)
- each partition's output lands in its own parquet directory
  ``<ckpt>/data/part_id=<k>/`` (resumable layout: a failed run leaves
  complete partitions usable)
- ``<ckpt>/_lineage.json`` records per-partition
  ``{row_count, content_hash, input_fragment}``; a partition is "done"
  iff its lineage entry exists (written only after a verified readback)
- resume = manifest anti-join: recompute ONLY partitions missing from
  the lineage manifest, touching nothing that's done

``content_hash`` is an order-insensitive 64-bit sum of per-row hashes,
so it is stable under block reordering and verifies what's actually on
disk (computed from a readback, not from the in-flight stream).
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import pyarrow as pa
import ray
import ray.data as rd

_LINEAGE = "_lineage.json"
_META = "_meta.json"


def _load_meta(ckpt_dir: str) -> dict | None:
    path = os.path.join(ckpt_dir, _META)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _save_meta(ckpt_dir: str, meta: dict) -> None:
    path = os.path.join(ckpt_dir, _META)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, path)


def part_id_for_key(key: str, n_partitions: int) -> int:
    return zlib.crc32(key.encode("utf-8")) % n_partitions


def add_part_id(ds: "rd.Dataset", key: str, n_partitions: int) -> "rd.Dataset":
    from ..functions.hashing import crc32_part_ids

    def fn(t: pa.Table) -> pa.Table:
        # crc32 once per unique key + vectorized gather; identical ids
        # to part_id_for_key (stability contract pins crc32)
        pids = pa.array(crc32_part_ids(t[key], n_partitions).astype("int32"),
                        pa.int32())
        return t.append_column("part_id", pids)

    return ds.map_batches(fn, batch_format="pyarrow")


def load_lineage(ckpt_dir: str) -> dict[int, dict]:
    path = os.path.join(ckpt_dir, _LINEAGE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


def _save_lineage(ckpt_dir: str, lineage: dict[int, dict]) -> None:
    path = os.path.join(ckpt_dir, _LINEAGE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({str(k): v for k, v in sorted(lineage.items())}, f, indent=1)
    os.replace(tmp, path)  # atomic: a crash never leaves partial lineage


@ray.remote
def _verify_partition(part_dir: str,
                      hash_cols: list[str]) -> tuple[int, int, str]:
    """Read a written partition back; return
    (row_count, content_hash, hash_fn_tag).

    Hashing is vectorized (functions/hashing.py content_hash_sum —
    the per-row blake2b loop was days of single-core-equivalent work at
    10^12 rows); the tag names the hash path that actually ran (the
    nested-type fallback is a different hash family) and is recorded in
    the lineage entry; ``part_id`` itself stays on crc32 (stability
    contract)."""
    import pyarrow.parquet as pq

    from ..functions.hashing import CONTENT_HASH_FN, content_hash_sum

    files = sorted(
        os.path.join(part_dir, f) for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    )
    count, acc, fn = 0, 0, CONTENT_HASH_FN
    seen_fns: set[str] = set()
    for f in files:
        t = pq.read_table(f, columns=hash_cols)
        count += t.num_rows
        h, fn = content_hash_sum(t, hash_cols)
        seen_fns.add(fn)
        acc = (acc + h) & 0xFFFFFFFFFFFFFFFF
    if len(seen_fns) > 1:
        # files of one partition took DIFFERENT hash paths (schema
        # drift mid-partition): a cross-family sum under a single tag
        # would defeat the never-compare-across-families guarantee —
        # fail loudly instead of recording a meaningless hash
        raise ValueError(
            f"mixed content-hash families in {part_dir}: {sorted(seen_fns)}")
    return count, acc, fn


def run_checkpointed(
    ds: "rd.Dataset",
    transform,
    ckpt_dir: str,
    key: str = "conv_id",
    n_partitions: int = 16,
    hash_cols: list[str] | None = None,
    input_fragment: str = "",
) -> "rd.Dataset":
    """Run ``transform(ds_partition_subset)`` for partitions missing
    from the lineage manifest, then return the full checkpointed output
    as a (lazy) Dataset over ``<ckpt>/data``.

    ``transform`` must preserve the ``part_id`` column it receives.
    Completed partitions are never recomputed or rewritten.
    """
    hash_cols = hash_cols or ["conv_id", "turn_idx", "md", "status"]
    data_dir = os.path.join(ckpt_dir, "data")
    os.makedirs(data_dir, exist_ok=True)

    lineage = load_lineage(ckpt_dir)

    # Resume validation (never trust stale state silently):
    # - a different partition count invalidates the whole hash layout
    #   (part_id = crc32 % N changed for every row) -> full recompute
    # - a per-partition entry recorded against a different input
    #   fragment is stale -> recompute just that partition
    meta = _load_meta(ckpt_dir)
    pruned = False
    if meta is not None and meta.get("n_partitions") != n_partitions:
        pruned = bool(lineage)
        lineage = {}
        # persist the cleared manifest BEFORE deleting data: a crash
        # between these steps must never leave on-disk lineage claiming
        # partitions whose data is gone
        _save_lineage(ckpt_dir, lineage)
        if os.path.isdir(data_dir):
            shutil.rmtree(data_dir)
            os.makedirs(data_dir, exist_ok=True)
    stale = [p for p, v in lineage.items()
             if v.get("input_fragment", "") != input_fragment]
    for p in stale:
        del lineage[p]
        pruned = True
    if pruned:
        # the pruned manifest must hit disk before the new meta does;
        # otherwise a crash during recompute leaves new meta + stale
        # lineage entries, and the next resume silently skips partitions
        # that were invalidated (returning a dataset missing their rows)
        _save_lineage(ckpt_dir, lineage)
    _save_meta(ckpt_dir, {"n_partitions": n_partitions, "key": key,
                          "input_fragment": input_fragment})

    missing = [p for p in range(n_partitions) if p not in lineage]

    if missing:
        import numpy as np

        missing_set = set(missing)
        want = np.fromiter(sorted(missing_set), dtype=np.int64,
                           count=len(missing_set))

        def only_missing(t: pa.Table) -> pa.Table:
            pids = t["part_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(np.isin(pids, want)))

        pending = add_part_id(ds, key, n_partitions).map_batches(
            only_missing, batch_format="pyarrow"
        )
        import inspect

        if "missing" in inspect.signature(transform).parameters:
            # transforms that can prune side inputs (e.g. the child
            # payload phase) get told which partitions are pending
            out = transform(pending, missing=missing_set)
        else:
            out = transform(pending)
        # clear any partial leftovers from a crashed previous attempt
        for p in missing:
            part_dir = os.path.join(data_dir, f"part_id={p}")
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
        out.write_parquet(data_dir, partition_cols=["part_id"])

        # verify-by-readback, then (atomically) extend the manifest
        verify = {}
        for p in missing:
            part_dir = os.path.join(data_dir, f"part_id={p}")
            if not os.path.isdir(part_dir):
                os.makedirs(part_dir, exist_ok=True)  # empty partition
            verify[p] = _verify_partition.remote(part_dir, hash_cols)

        for p, ref in verify.items():
            count, chash, hash_fn = ray.get(ref)
            lineage[p] = {
                "row_count": count,
                "content_hash": f"{chash:016x}",
                # the tag names the path that RAN (the nested-type
                # fallback is a different hash family than the
                # vectorized polars path)
                "hash_fn": hash_fn,
                "input_fragment": input_fragment,
            }
        _save_lineage(ckpt_dir, lineage)

    return rd.read_parquet(data_dir)
