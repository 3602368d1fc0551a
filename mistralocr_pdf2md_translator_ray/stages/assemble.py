"""Ordered document assembly (SURVEY.md A2/O2) with skew salting.

The reference joins pages with ``"\\n\\n---\\n\\n"`` in list order
(``mistralocr_app.py:716-717``). Distributed equivalent: co-locate each
conversation, sort *inside the group* by ``(turn_idx, ts)``, join.
Block order is never trusted.

Two scale levers:

- **Bucketing**: grouping runs on ``crc32(key) % B`` buckets, not raw
  conversation ids — one ``map_groups`` call per bucket with vectorized
  pandas inside, never one UDF call per conversation (millions of tiny
  groups would pay ~ms of per-group overhead each; see
  stages/joins.py).
- **Salting** (``salt_span``): one hot conversation can hold ~half of
  all turns (FIXTURES.md). Phase 1 groups by (conv, salt) where
  ``salt = turn_idx // span`` — contiguous ranges, so concatenating
  per-salt partials in salt order equals concatenating the whole sorted
  conversation (splice associativity: ``sep.join(parts)`` where each
  part is ``sep.join(chunk)`` == ``sep.join(all)``). Phase 2 reduces
  the much smaller partials per conversation.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

from ..functions.scalars import PAGE_SEPARATOR


def _bucket_col(keys: pa.ChunkedArray, B: int) -> pa.Array:
    return pa.array(
        [zlib.crc32(k.encode("utf-8")) % B for k in keys.to_pylist()], pa.int32()
    )


def _assemble_bucket(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    out = g.groupby("conv_id", sort=False).agg(
        n_turns=("md", "size"), doc_md=("md", PAGE_SEPARATOR.join)
    ).reset_index()
    out["n_turns"] = out["n_turns"].astype("int64")
    return out[["conv_id", "n_turns", "doc_md"]]


def _partial_bucket(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["conv_id", "salt", "turn_idx", "ts"], kind="mergesort")
    out = g.groupby(["conv_id", "salt"], sort=False).agg(
        n_turns=("md", "size"), doc_md=("md", PAGE_SEPARATOR.join)
    ).reset_index()
    out["n_turns"] = out["n_turns"].astype("int64")
    return out


def _final_bucket(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["conv_id", "salt"], kind="mergesort")
    out = g.groupby("conv_id", sort=False).agg(
        n_turns=("n_turns", "sum"), doc_md=("doc_md", PAGE_SEPARATOR.join)
    ).reset_index()
    out["n_turns"] = out["n_turns"].astype("int64")
    return out[["conv_id", "n_turns", "doc_md"]]


def assemble_conversations(per_turn_ds, salt_span: int | None = 256,
                           num_buckets: int = 64):
    """per-turn Dataset (conv_id, turn_idx, ts, md, ...) -> one row per
    conversation (conv_id, n_turns, doc_md)."""
    ds = per_turn_ds.select_columns(["conv_id", "turn_idx", "ts", "md"])

    if salt_span is None:
        def add_bucket(t: pa.Table) -> pa.Table:
            return t.append_column("b", _bucket_col(t["conv_id"], num_buckets))

        from .joins import coalesce_blocks

        return (
            ds.map_batches(add_bucket, batch_format="pyarrow")
            .repartition(coalesce_blocks())
            .groupby("b")
            .map_groups(_assemble_bucket, batch_format="pandas")
        )

    span = int(salt_span)

    def add_salt_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        salt = pc.divide(pc.cast(t["turn_idx"], pa.int64()), span)
        convs = t["conv_id"].to_pylist()
        b = pa.array(
            [zlib.crc32(f"{c}\x1f{s}".encode("utf-8")) % num_buckets
             for c, s in zip(convs, salt.to_pylist())],
            pa.int32(),
        )
        return t.append_column("salt", salt).append_column("b", b)

    from .joins import coalesce_blocks

    partials = (
        ds.map_batches(add_salt_bucket, batch_format="pyarrow")
        .repartition(coalesce_blocks())
        .groupby("b")
        .map_groups(_partial_bucket, batch_format="pandas")
    )

    def add_conv_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["b"] = [zlib.crc32(c.encode("utf-8")) % num_buckets
                   for c in df["conv_id"]]
        return df

    return (
        partials.map_batches(add_conv_bucket, batch_format="pandas")
        .groupby("b")
        .map_groups(_final_bucket, batch_format="pandas")
    )
