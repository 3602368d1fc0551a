"""Export sinks: Markdown documents + binary assets with link rewrite.

Reproduces the reference's output surface (SURVEY §2.1):

- S3 Markdown document sink (``mistralocr_app.py:719-747``): one
  ``<conv_id>.md`` per conversation under ``out_dir/md/``.
- S4 binary asset sink + M7 link rewrite
  (``save_images_and_replace_links``, ``mistralocr_app.py:101-122``):
  payload bytes land at ``assets/<conv_id>/<payload_id>.bin`` and the
  turn's ``![id](id)`` placeholders are rewritten to that relative
  path.

Both sinks are side-effecting ``map_batches`` stages (each task writes
its own rows — embarrassingly parallel, no shuffle); rerun-safety comes
from deterministic filenames (writes are idempotent overwrites).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import ray.data as rd

from ..functions.scalars import PLACEHOLDER_RE


def rewrite_links(md: str, conv_id: str, asset_root: str = "assets") -> str:
    """M7: ``![id](id)`` -> ``![id](assets/<conv>/<id>.bin)``."""

    def _sub(m: re.Match) -> str:
        pid = m.group(1)
        return f"![{pid}]({asset_root}/{conv_id}/{pid}.bin)"

    return PLACEHOLDER_RE.sub(_sub, md or "")


def export_markdown(docs: "rd.Dataset", out_dir: str,
                    rewrite_asset_links: bool = True) -> int:
    """Write one UTF-8 ``.md`` file per conversation row
    (columns: conv_id, doc_md). Returns the number of files written."""
    md_dir = os.path.join(out_dir, "md")
    os.makedirs(md_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        convs = t["conv_id"].to_pylist()
        mds = t["doc_md"].to_pylist()
        paths = []
        for conv, md in zip(convs, mds):
            if rewrite_asset_links:
                md = rewrite_links(md, conv)
            path = os.path.join(md_dir, f"{conv}.md")
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(md)
            os.replace(tmp, path)  # atomic, idempotent on rerun
            paths.append(path)
        return pa.table({"conv_id": t["conv_id"],
                         "path": pa.array(paths, pa.string())})

    manifest = docs.map_batches(write_batch, batch_format="pyarrow",
                                batch_size=256)
    return manifest.count()


def export_assets(payloads: "rd.Dataset", out_dir: str) -> int:
    """Write each payload's bytes to ``assets/<conv>/<payload_id>.bin``.
    Returns the number of assets written."""
    asset_dir = os.path.join(out_dir, "assets")
    os.makedirs(asset_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        convs = t["conv_id"].to_pylist()
        pids = t["payload_id"].to_pylist()
        blobs = t["payload"].to_pylist()
        paths = []
        for conv, pid, blob in zip(convs, pids, blobs):
            d = os.path.join(asset_dir, conv)
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{pid}.bin")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(blob) if blob is not None else b"")
            os.replace(tmp, path)
            paths.append(path)
        return pa.table({"conv_id": t["conv_id"],
                         "payload_id": t["payload_id"],
                         "path": pa.array(paths, pa.string())})

    manifest = payloads.map_batches(write_batch, batch_format="pyarrow",
                                    batch_size=256)
    return manifest.count()
