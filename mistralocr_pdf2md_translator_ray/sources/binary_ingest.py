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

from ..functions.scalars import decode_data_url, sanitize_id
from .transcripts import TRANSCRIPT_SCHEMA


def decode_data_url_column(ds: "rd.Dataset", url_col: str = "data_url") -> "rd.Dataset":
    """Data-URL payload ingest — the reference's actual wire format
    (``img.image_base64`` data URLs, ``mistralocr_app.py:107``,
    ``:255-267``): map a string data-URL column into ``payload:binary``
    + ``mime`` + ``decode_status`` columns. Invalid base64 becomes an
    ``error`` status row with empty payload (the reference
    catches-and-skips; nothing raises). Stateless batch transform —
    embarrassingly parallel, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        payloads, mimes, status = [], [], []
        for u in t[url_col].to_pylist():
            b, m, ok = decode_data_url(u)
            payloads.append(b)
            mimes.append(m)
            status.append("ok" if ok else "error")
        return (
            t.drop_columns([url_col])
            .append_column("payload", pa.array(payloads, pa.binary()))
            .append_column("mime", pa.array(mimes, pa.string()))
            .append_column("decode_status", pa.array(status, pa.string()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


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
