"""End-to-end training-data curation job: staged, resumable, composed.

The curation suite's ops compose the way a real 100-TB prep run does —
each stage STREAMS from the previous stage's parquet and writes its own
partitioned parquet + ``_SUCCESS`` marker, so a crashed run resumes at
the first incomplete stage (stage-granular checkpointing, the
multi-stage analog of state/checkpoint.py's partition-granular resume;
reference analog: the per-stage pickle checkpoints at
``mistralocr_app.py:577-580``).

    scrub   : PII redaction (redact_pii kernel), text rewritten
    dedup   : MinHash/LSH near-dup removal, survivors only
              (bucketed co-group semi-join — the kept-id set is
              corpus-scaled, so it never broadcasts)
    spans   : sub-document duplicate token-window removal
    order   : deterministic seeded global shuffle + greedy sequence
              packing manifest

Every stage reads/writes a ``documents.parquet`` layout so each is
individually re-runnable with the standalone query of the same name.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

_SUCCESS = "_SUCCESS"


def _stage_dir(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, name)


def _done(d: str) -> bool:
    return os.path.exists(os.path.join(d, _SUCCESS))


def _mark(d: str, meta: dict) -> None:
    with open(os.path.join(d, _SUCCESS), "w", encoding="utf-8") as f:
        json.dump(meta, f)


def _write_documents(ds: "rd.Dataset", d: str,
                     filename: str = "documents.parquet") -> int:
    """Distributed write of a parquet-directory layout (Ray writes one
    file per block — no driver funnel, resumable-output shape). Every
    downstream consumer reads it through rd.read_parquet or
    pq.read_table(filters=...), both of which take directories. Row
    count comes from the written footers, not a re-execution."""
    target = os.path.join(d, filename)
    # crash healing: a stage dir without _SUCCESS may hold a partial
    # previous write — clear it so stale files can't mix into this
    # write's footer count (same discipline as checkpoint partition
    # invalidation in state/checkpoint.py)
    if os.path.exists(target):
        import shutil

        shutil.rmtree(target)
    os.makedirs(target, exist_ok=True)
    ds.write_parquet(target)
    return sum(
        pq.ParquetFile(os.path.join(target, f)).metadata.num_rows
        for f in os.listdir(target) if f.endswith(".parquet"))


def curate_corpus(sf_dir: str, out_dir: str, span_tokens: int = 16,
                  seq_tokens: int = 512, seed: int = 0,
                  embed_dim: int | None = None) -> dict:
    """Run (or resume) the staged curation job; returns the manifest
    {stage: row_count}. Completed stages (``_SUCCESS`` present) are
    skipped without re-reading their inputs. ``embed_dim`` adds the
    optional text->embedding stage (stages/embed.py) producing the
    embeddings.parquet the ANN / embedding-near-dup family consumes."""
    from ..stages.dedup import dedup_minhash, dedup_spans
    from ..stages.joins import cogroup
    from ..stages.textstats import redact_documents
    from . import library as lib

    manifest: dict[str, int] = {}

    # ---- stage 1: PII scrub ------------------------------------------
    d1 = _stage_dir(out_dir, "scrub")
    if not _done(d1):
        red = redact_documents(sf_dir).map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"],
                "text": t["text_redacted"],
            }),
            batch_format="pyarrow")
        n = _write_documents(red, d1)
        _mark(d1, {"rows": n})
    manifest["scrub"] = json.load(
        open(os.path.join(d1, _SUCCESS), encoding="utf-8"))["rows"]

    # ---- stage 2: near-dup removal -----------------------------------
    d2 = _stage_dir(out_dir, "dedup")
    if not _done(d2):
        kept = dedup_minhash(d1)  # Dataset[doc_id] — corpus-scaled
        docs = rd.read_parquet(os.path.join(d1, "documents.parquet"))

        def semi(ldf, rdf):
            out = ldf.merge(rdf[["doc_id"]].drop_duplicates(), on="doc_id")
            return out[["doc_id", "text"]]

        survivors = cogroup(
            docs, kept, ["doc_id"], semi,
            left_schema=pa.schema([("doc_id", pa.int64()),
                                   ("text", pa.string())]),
            right_schema=pa.schema([("doc_id", pa.int64())]),
        )
        n = _write_documents(survivors, d2)
        _mark(d2, {"rows": n})
    manifest["dedup"] = json.load(
        open(os.path.join(d2, _SUCCESS), encoding="utf-8"))["rows"]

    # ---- stage 3: sub-document span dedup ----------------------------
    d3 = _stage_dir(out_dir, "spans")
    if not _done(d3):
        sp = dedup_spans(d2, span_tokens=span_tokens).map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"],
                "text": t["text_deduped"],
            }),
            batch_format="pyarrow")
        n = _write_documents(sp, d3)
        _mark(d3, {"rows": n})
    manifest["spans"] = json.load(
        open(os.path.join(d3, _SUCCESS), encoding="utf-8"))["rows"]

    # ---- stage 4: deterministic order + packing manifest -------------
    d4 = _stage_dir(out_dir, "order")
    if not _done(d4):
        shuffled = lib.shuffle_documents(d3, seed=seed)
        n = _write_documents(shuffled, d4)
        n_seq = _write_documents(
            lib.pack_documents(d3, seq_tokens=seq_tokens), d4,
            filename="packing.parquet")
        _mark(d4, {"rows": n, "sequences": n_seq})
    meta4 = json.load(open(os.path.join(d4, _SUCCESS), encoding="utf-8"))
    manifest["order"] = meta4["rows"]
    manifest["sequences"] = meta4.get("sequences", 0)

    # ---- stage 5 (optional): text -> embedding table ------------------
    if embed_dim is not None:
        from ..stages.embed import embed_documents

        d5 = _stage_dir(out_dir, "embed")
        if not _done(d5):
            n = _write_documents(
                embed_documents(d4, dim=embed_dim, seed=seed), d5,
                filename="embeddings.parquet")
            _mark(d5, {"rows": n})
        manifest["embed"] = json.load(
            open(os.path.join(d5, _SUCCESS), encoding="utf-8"))["rows"]
    return manifest
