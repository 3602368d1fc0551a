"""Ordered document assembly (SURVEY.md A2/O2) with skew salting.

The reference joins pages with ``"\\n\\n---\\n\\n"`` in list order
(``mistralocr_app.py:716-717``). Distributed equivalent: group by
``conv_id``, sort *inside the group* by ``(turn_idx, ts)``, join. Block
order is never trusted.

Skew: one hot conversation can hold ~half of all turns (FIXTURES.md),
which would funnel half the table through a single ``map_groups`` task.
``assemble_conversations(salt_span=S)`` therefore runs a two-phase
salted assembly:

  phase 1: salt = turn_idx // S  (contiguous ranges, so concatenating
           per-salt partials in salt order == concatenating the whole
           sorted conversation — splice associativity)
           groupby(conv_id, salt) -> partial doc per range
  phase 2: groupby(conv_id) over the much smaller partials -> final doc

Separator algebra: ``sep.join(parts)`` where each part is
``sep.join(chunk)`` equals ``sep.join(all turns)`` exactly.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.scalars import PAGE_SEPARATOR


def _assemble_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["turn_idx", "ts"], kind="mergesort")
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": pd.array([len(g)], dtype="int64"),
            "doc_md": [PAGE_SEPARATOR.join(g["md"].tolist())],
        }
    )


def _assemble_partial(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["turn_idx", "ts"], kind="mergesort")
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "salt": pd.array([g["salt"].iloc[0]], dtype="int64"),
            "n_turns": pd.array([len(g)], dtype="int64"),
            "doc_md": [PAGE_SEPARATOR.join(g["md"].tolist())],
        }
    )


def _assemble_final(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("salt", kind="mergesort")
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": pd.array([int(g["n_turns"].sum())], dtype="int64"),
            "doc_md": [PAGE_SEPARATOR.join(g["doc_md"].tolist())],
        }
    )


def assemble_conversations(per_turn_ds, salt_span: int | None = 256):
    """per-turn Dataset (conv_id, turn_idx, ts, md, ...) -> one row per
    conversation (conv_id, n_turns, doc_md)."""
    ds = per_turn_ds.select_columns(["conv_id", "turn_idx", "ts", "md"])
    if salt_span is None:
        return ds.groupby("conv_id").map_groups(_assemble_group, batch_format="pandas")

    span = int(salt_span)

    def add_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        salt = pc.divide(pc.cast(batch["turn_idx"], pa.int64()), span)
        return batch.append_column("salt", salt)

    partials = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["conv_id", "salt"])
        .map_groups(_assemble_partial, batch_format="pandas")
    )
    return partials.groupby("conv_id").map_groups(_assemble_final, batch_format="pandas")
