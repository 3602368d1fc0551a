"""Single-process pure-function oracle (SURVEY.md §5).

Runs the *same kernels* as the Ray pipeline in one explicit loop in
``(conv_id, turn_idx)`` order. The golden tests assert the Ray
pipeline's output is byte-equal per turn — so any divergence is a
plumbing bug (ordering, keying, error routing), which is exactly the
north-rule invariant.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from ..functions.extract import extract_child_payload, process_turn
from ..functions.markdown import md_spans
from ..functions.scalars import PAGE_SEPARATOR
from ..functions.textstats import token_count


def oracle_extract_turns(transcripts: pa.Table, payloads: pa.Table | None = None) -> pa.Table:
    """Expected per-turn output, sorted by (conv_id, turn_idx)."""
    children: dict[tuple[str, int], dict[str, str]] = defaultdict(dict)
    if payloads is not None:
        for row in payloads.to_pylist():
            extracted, _st = extract_child_payload(
                row["payload"], row["payload_id"], row["kind"]
            )
            children[(row["conv_id"], row["turn_idx"])][row["payload_id"]] = extracted

    rows = sorted(
        transcripts.to_pylist(), key=lambda r: (r["conv_id"], r["turn_idx"])
    )
    out = {k: [] for k in ("conv_id", "turn_idx", "role", "tool", "ts", "md",
                           "spans", "n_tokens", "status", "error")}
    for r in rows:
        md, status, err = process_turn(
            r["text"], r["tool"], children.get((r["conv_id"], r["turn_idx"]))
        )
        out["conv_id"].append(r["conv_id"])
        out["turn_idx"].append(r["turn_idx"])
        out["role"].append(r["role"])
        out["tool"].append(r["tool"])
        out["ts"].append(r["ts"])
        out["md"].append(md)
        out["spans"].append(md_spans(md))
        out["n_tokens"].append(token_count(md))
        out["status"].append(status)
        out["error"].append(err)
    from ..stages.extract import SPANS_TYPE

    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "role": pa.array(out["role"], pa.string()),
            "tool": pa.array(out["tool"], pa.string()),
            "ts": pa.array(out["ts"], pa.timestamp("us")),
            "md": pa.array(out["md"], pa.string()),
            "spans": pa.array(out["spans"], SPANS_TYPE),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "status": pa.array(out["status"], pa.string()),
            "error": pa.array(out["error"], pa.string()),
        }
    )


def oracle_assemble(per_turn: pa.Table) -> pa.Table:
    """Expected per-conversation assembly from oracle per-turn output."""
    by_conv: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for r in per_turn.to_pylist():
        by_conv[r["conv_id"]].append((r["turn_idx"], r["md"]))
    conv_ids = sorted(by_conv)
    docs, counts = [], []
    for c in conv_ids:
        turns = sorted(by_conv[c])
        docs.append(PAGE_SEPARATOR.join(md for _, md in turns))
        counts.append(len(turns))
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "n_turns": pa.array(counts, pa.int64()),
            "doc_md": pa.array(docs, pa.string()),
        }
    )
