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
                    rewrite_asset_links: bool = True,
                    dual: bool = False) -> int:
    """Write one UTF-8 ``.md`` file per conversation row
    (columns: conv_id, doc_md). With ``dual`` the input's
    ``doc_md_original`` column also lands as ``<conv>_original.md``
    next to the primary file — the reference's paired
    ``{stem}_original.md`` / ``{stem}_translated.md`` outputs
    (mistralocr_app.py:714-747). Returns the number of primary files
    written."""
    md_dir = os.path.join(out_dir, "md")
    os.makedirs(md_dir, exist_ok=True)

    def _write(path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)  # atomic, idempotent on rerun

    def write_batch(t: pa.Table) -> pa.Table:
        convs = t["conv_id"].to_pylist()
        mds = t["doc_md"].to_pylist()
        origs = t["doc_md_original"].to_pylist() if dual else [None] * len(convs)
        paths = []
        for conv, md, orig in zip(convs, mds, origs):
            if rewrite_asset_links:
                md = rewrite_links(md, conv)
            path = os.path.join(md_dir, f"{conv}.md")
            _write(path, md)
            if orig is not None:
                if rewrite_asset_links:
                    orig = rewrite_links(orig, conv)
                _write(os.path.join(md_dir, f"{conv}_original.md"), orig)
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
