"""Ray Data stages for the flagship extraction pipeline.

Actor-pool callable classes (state — compiled parsers/regex tables —
built once per actor in ``__init__``, replacing the reference's
process-global API clients, ``mistralocr_app.py:775-800``) plus the
stateless finalize batch UDFs. All stages are Arrow-in/Arrow-out
(``batch_format="pyarrow"``); the per-string kernel work is inherently
scalar, but columns are materialized once per batch and rebuilt as
single Arrow arrays (no per-row Dataset ops).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.extract import extract_turn, extract_child_payload
from ..functions.markdown import normalize_markdown
from ..functions.scalars import splice_children
from ..functions.textstats import token_count


class TurnExtractor:
    """Per-turn extraction: route by ``tool`` and extract raw Markdown.

    Output adds ``raw_md:string status:string error:string`` to the
    input columns.
    """

    def __init__(self) -> None:
        # Per-actor state: bind the compiled kernels once (the module
        # import compiles every regex; holding refs here pins them).
        self._extract = extract_turn

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tools = batch["tool"].to_pylist()
        raw_mds, statuses, errors = [], [], []
        for text, tool in zip(texts, tools):
            raw, status, err = self._extract(text, tool)
            raw_mds.append(raw)
            statuses.append(status)
            errors.append(err)
        return (
            batch.append_column("raw_md", pa.array(raw_mds, pa.string()))
            .append_column("status", pa.array(statuses, pa.string()))
            .append_column("error", pa.array(errors, pa.string()))
        )


class ChildExtractor:
    """Per-payload structuring (ST5 analog): payload bytes ->
    ``extracted`` pretty-JSON + ``child_status``."""

    def __init__(self) -> None:
        self._extract = extract_child_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        pids = batch["payload_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        extracted, statuses = [], []
        for blob, pid, kind in zip(payloads, pids, kinds):
            s, st = self._extract(blob, pid, kind)
            extracted.append(s)
            statuses.append(st)
        return (
            batch.select(["conv_id", "turn_idx", "payload_id"])
            .append_column("extracted", pa.array(extracted, pa.string()))
            .append_column("child_status", pa.array(statuses, pa.string()))
        )


def collect_children_json(group) -> "pa.Table":
    """``map_groups`` reducer: one row per (conv_id, turn_idx) with the
    children as a deterministic JSON map (sorted by payload_id) — the
    Arrow-friendly stand-in for the reference's ``ocr_by_page`` nested
    dict (``mistralocr_app.py:513-519``)."""
    import pandas as pd

    g = group.sort_values("payload_id")
    children = dict(zip(g["payload_id"], g["extracted"]))
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "turn_idx": [g["turn_idx"].iloc[0]],
            "children_json": [json.dumps(children, ensure_ascii=False, sort_keys=True)],
        }
    )


_OUT_COLS = ["conv_id", "turn_idx", "role", "tool", "ts", "md", "n_tokens", "status", "error"]


def _finalize(batch: pa.Table, children_col: bool) -> pa.Table:
    raws = batch["raw_md"].to_pylist()
    ch = batch["children_json"].to_pylist() if children_col else [None] * len(raws)
    mds, ntoks = [], []
    for raw, cj in zip(raws, ch):
        if cj:
            raw = splice_children(raw, json.loads(cj))
        md = normalize_markdown(raw)
        mds.append(md)
        ntoks.append(token_count(md))
    out = batch.append_column("md", pa.array(mds, pa.string())).append_column(
        "n_tokens", pa.array(ntoks, pa.int64())
    )
    return out.select(_OUT_COLS)


def finalize_with_children(batch: pa.Table) -> pa.Table:
    """Splice child results below their placeholders (J1+M6), then
    normalize (M12 analog)."""
    return _finalize(batch, children_col=True)


def finalize_plain(batch: pa.Table) -> pa.Table:
    """Normalize-only path for turns with no placeholders."""
    return _finalize(batch, children_col=False)


# ---------------------------------------------------------------------------
# Task-based co-group join (J1): parent turns x aggregated children.
#
# Ray's native hash JoinOperator holds persistent aggregator actors; on
# small CPU budgets those can be starved by the map actor pools (resource
# livelock). The splice join instead uses the sort-based groupby shuffle
# (plain tasks): tag both sides, union, group on the composite key, and
# emit the parent row with its children_json attached. Left-outer
# semantics: parents with no child group keep children_json = null.
# ---------------------------------------------------------------------------

_PARENT_COLS = ["conv_id", "turn_idx", "role", "tool", "ts",
                "raw_md", "status", "error"]


def tag_parent_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table({
        **{c: batch[c] for c in _PARENT_COLS},
        "children_json": pa.nulls(n, pa.string()),
        "side": pa.array([0] * n, pa.int8()),
    })


def tag_child_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table({
        "conv_id": batch["conv_id"],
        "turn_idx": pa.compute.cast(batch["turn_idx"], pa.int32()),
        "role": pa.nulls(n, pa.string()),
        "tool": pa.nulls(n, pa.string()),
        "ts": pa.nulls(n, pa.timestamp("us")),
        "raw_md": pa.nulls(n, pa.string()),
        "status": pa.nulls(n, pa.string()),
        "error": pa.nulls(n, pa.string()),
        "children_json": batch["children_json"],
        "side": pa.array([1] * n, pa.int8()),
    })


def merge_parent_child(g) -> "pa.Table":
    """map_groups merger: 1 parent row (side=0) + optional 1 child row
    (side=1) -> parent row carrying children_json."""
    import pandas as pd

    child = g[g["side"] == 1]
    parent = g[g["side"] == 0].copy()
    if parent.empty:  # orphan children (payload rows with no parent turn)
        return parent.drop(columns=["side"])
    cj = child["children_json"].iloc[0] if len(child) else None
    parent["children_json"] = cj
    return parent.drop(columns=["side"])
