"""Raw-binary ingest source (SURVEY S1, raw mode).

The reference reads one binary document per run
(``pdf_file.read_bytes()``, ``mistralocr_app.py:225-247``). The
distributed analog: ``ray.data.read_binary_files`` over a directory of
conversation files, each file holding one conversation as JSON lines
(one turn object per line), parsed into the canonical transcript schema
inside ``map_batches`` — file identity (sanitized stem,
``mistralocr_app.py:568-569``) becomes ``conv_id`` when a line omits
it.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data as rd

from ..functions.scalars import sanitize_id
from .transcripts import TRANSCRIPT_SCHEMA


def read_conversation_files(path: str) -> "rd.Dataset":
    """Directory of ``*.jsonl`` conversation files -> transcript Dataset
    (conv_id, turn_idx, role, text, tool, ts). Malformed lines become
    ``tool='error'`` rows carrying the raw line (error-as-value)."""
    ds = rd.read_binary_files(path, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in TRANSCRIPT_SCHEMA.names}
        for blob, p in zip(batch["bytes"].to_pylist(), batch["path"].to_pylist()):
            stem = sanitize_id(os.path.splitext(os.path.basename(p))[0])
            text = bytes(blob).decode("utf-8", errors="replace")
            for i, line in enumerate(l for l in text.splitlines() if l.strip()):
                try:
                    row = json.loads(line)
                    out["conv_id"].append(str(row.get("conv_id", stem)))
                    out["turn_idx"].append(int(row.get("turn_idx", i)))
                    out["role"].append(str(row.get("role", "user")))
                    out["text"].append(str(row.get("text", "")))
                    out["tool"].append(str(row.get("tool", "")))
                    out["ts"].append(int(row.get("ts", i)))
                except (json.JSONDecodeError, TypeError, ValueError):
                    out["conv_id"].append(stem)
                    out["turn_idx"].append(i)
                    out["role"].append("user")
                    out["text"].append(line)
                    out["tool"].append("error")
                    out["ts"].append(i)
        out["ts"] = pa.array(out["ts"], pa.timestamp("us"))
        return pa.table(out, schema=TRANSCRIPT_SCHEMA)

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=16)
