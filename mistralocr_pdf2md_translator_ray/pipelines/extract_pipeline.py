"""Flagship pipeline: transcript turns -> clean per-turn Markdown.

Ray-Data-native restatement of the reference's six-stage dataflow
(``mistralocr_app.py:546-765``):

    read_parquet(transcripts)                         # S1
      -> map_batches(TurnExtractor, actor pool)       # M1 doc extraction
      [placeholder-bearing turns only]
      -> payloads -> map_batches(ChildExtractor)      # M3/ST5 child extraction
      -> groupby(conv,turn).map_groups(collect)       # A1 regroup
      -> co-group join with parents (left outer)      # J1 composite-key join
      -> map_batches(finalize: splice+normalize)      # M6 + M12
      [placeholder-free turns]
      -> map_batches(finalize: normalize)             # M12
      -> union                                        # per-turn output
      -> (optional) assemble_conversations            # A2 ordered concat

Scale notes: only the ~10-15% of turns that actually carry placeholders
enter the join shuffle; everything else streams straight through
stateless/actor map stages. The child table is pre-reduced to one row
per (conv_id, turn_idx) before the join so the exchanged volume is
bounded by distinct placeholder-bearing turns, not payload count.
"""

from __future__ import annotations

from typing import Optional

import ray.data

from ..stages.extract import (
    CHILD_SCHEMA,
    PARENT_SCHEMA,
    ChildExtractor,
    TurnExtractor,
    finalize_plain,
    finalize_with_children,
    merge_children_into_parents,
)
from ..stages.joins import cogroup
from ..stages.assemble import assemble_conversations

# Actor-pool sizing: autoscaling pools (min 1 so several pools coexist
# on small CPU budgets without starving each other); batch_size modest
# because turn text can be wide.
EXTRACT_POOL = dict(concurrency=(1, 8), batch_size=512, num_cpus=1)
CHILD_POOL = dict(concurrency=(1, 4), batch_size=1024, num_cpus=1)


def extract_turns(
    transcripts: "ray.data.Dataset",
    payloads: Optional["ray.data.Dataset"] = None,
    join_partitions: int = 16,  # kept for API stability; the co-group
    # join's partitioning is sized by Ray's sort-shuffle automatically
) -> "ray.data.Dataset":
    """Per-turn extraction; returns Dataset with columns
    (conv_id, turn_idx, role, tool, ts, md, n_tokens, status, error)."""
    if payloads is None:
        return transcripts.map_batches(
            TurnExtractor, batch_format="pyarrow", **EXTRACT_POOL
        ).map_batches(finalize_plain, batch_format="pyarrow")

    # Pre-split on the *input* text so each branch extracts its rows
    # exactly once (a lazy Dataset consumed by two branches would
    # re-execute the extraction per branch — 2x cost at scale; the
    # parquet re-scan per branch is the cheap recompute).
    def _route(batch, want: bool):
        import pyarrow.compute as pc

        mask = pc.match_substring(batch["text"], "![")
        return batch.filter(mask if want else pc.invert(mask))

    with_ph = transcripts.map_batches(
        lambda b: _route(b, True), batch_format="pyarrow"
    ).map_batches(TurnExtractor, batch_format="pyarrow", **EXTRACT_POOL)
    plain = transcripts.map_batches(
        lambda b: _route(b, False), batch_format="pyarrow"
    ).map_batches(TurnExtractor, batch_format="pyarrow", **EXTRACT_POOL)

    children = payloads.map_batches(
        ChildExtractor, batch_format="pyarrow", **CHILD_POOL
    )

    # Bucketed co-group join on (conv_id, turn_idx) — one shuffle with
    # ~num_buckets groups; the child aggregation (A1 regroup) and the
    # left-outer merge (J1) both run vectorized inside each bucket.
    # See stages/joins.py for why this beats per-group map_groups and
    # the actor-backed JoinOperator.
    joined = cogroup(
        with_ph,
        children,
        on=["conv_id", "turn_idx"],
        merge_fn=merge_children_into_parents,
        left_schema=PARENT_SCHEMA,
        right_schema=CHILD_SCHEMA,
        num_buckets=join_partitions * 4,
    )
    spliced = joined.map_batches(finalize_with_children, batch_format="pyarrow")
    plain_out = plain.map_batches(finalize_plain, batch_format="pyarrow")
    return spliced.union(plain_out)


def extract_documents(
    transcripts: "ray.data.Dataset",
    payloads: Optional["ray.data.Dataset"] = None,
    salt_span: int | None = 256,
) -> "ray.data.Dataset":
    """Whole-document output: one row per conversation
    (conv_id, n_turns, doc_md), turn order restored inside groups."""
    return assemble_conversations(extract_turns(transcripts, payloads), salt_span=salt_span)
