"""End-to-end training-data curation job: staged, resumable, composed.

The curation suite's ops compose the way a real 100-TB prep run does —
each stage STREAMS from the previous stage's parquet and writes its own
partitioned parquet, checkpointed at PARTITION granularity through
``state/checkpoint.run_checkpointed``'s per-partition lineage (resume
after a mid-stage crash recomputes ONLY the partitions whose lineage
entry is missing — a run killed 90% through a stage redoes ~10%, not
the whole stage; reference analog: the per-stage pickle checkpoints at
``mistralocr_app.py:577-580``, upgraded from stage- to
partition-granular). A ``_SUCCESS`` marker still closes each finished
stage so completed stages are skipped without constructing any plan.

    scrub   : PII redaction (redact_pii kernel), text rewritten
              — row-local, so resume recomputes only missing
              partitions' ROWS end to end
    dedup   : MinHash/LSH near-dup removal, survivors only
              (bucketed co-group semi-join — the kept-id set is
              corpus-scaled, so it never broadcasts)
    spans   : sub-document duplicate token-window removal
    order   : deterministic seeded global shuffle + greedy sequence
              packing manifest

The dedup/spans/order stages have a GLOBAL compute (corpus-wide kept
set / span winners / shuffle sort) that resume must re-run — it is
deterministic, so re-running reproduces the same values — but their
WRITE is partition-pruned: finished partitions are never rewritten,
and the global pass's output is filtered to the missing part_ids
before it touches disk. Output physical order within the order stage
is by part_id; the stage's ordering contract is the ``shuffle_key``
column (a pure function of doc_id and seed), not file order.

Every stage reads/writes a ``documents.parquet`` layout (now a
hive-partitioned directory, ``documents.parquet/part_id=<k>/``) so
each is individually re-runnable with the standalone query of the same
name. Downstream invalidation is content-driven: each stage's
``input_fragment`` digests the upstream stage's lineage manifest, so
regenerating an upstream stage invalidates exactly the checkpoints
that read it.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..state.checkpoint import add_part_id, load_lineage, run_checkpointed

_SUCCESS = "_SUCCESS"
_N_PARTS = 16


def _stage_dir(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, name)


def _done(d: str) -> bool:
    return os.path.exists(os.path.join(d, _SUCCESS))


def _mark(d: str, meta: dict) -> None:
    with open(os.path.join(d, _SUCCESS), "w", encoding="utf-8") as f:
        json.dump(meta, f)


def _stage_fingerprint(stage_dir: str) -> str:
    """Content fingerprint of a completed upstream stage: a digest of
    its lineage manifest, which records per-partition content hashes of
    what is actually on disk (written post-readback). Deterministic for
    unchanged content, perturbed by any rewrite — the downstream
    ``input_fragment`` that makes cross-stage invalidation content-
    driven rather than existence-driven."""
    import hashlib

    with open(os.path.join(stage_dir, "_lineage.json"), "rb") as f:
        return hashlib.blake2b(f.read(), digest_size=8).hexdigest()


def _ckpt_stage(src: "rd.Dataset", transform, stage_dir: str,
                hash_cols: list[str], input_fragment: str,
                data_name: str = "documents.parquet") -> int:
    """Run one curate stage through per-partition lineage; returns the
    stage row count summed from the (verified-by-readback) lineage."""
    run_checkpointed(
        src, transform, stage_dir, key="doc_id", n_partitions=_N_PARTS,
        hash_cols=hash_cols, input_fragment=input_fragment,
        data_name=data_name)
    return sum(v["row_count"] for v in load_lineage(stage_dir).values())


def _filter_parts(ds: "rd.Dataset", missing: set[int]) -> "rd.Dataset":
    """Prune a globally-computed stage output to the partitions that
    still need writing (resume path of the non-row-local stages)."""
    want = np.fromiter(sorted(missing), dtype=np.int64, count=len(missing))

    def keep(t: pa.Table) -> pa.Table:
        pids = t["part_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(np.isin(pids, want)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _write_documents(ds: "rd.Dataset", d: str,
                     filename: str = "documents.parquet") -> int:
    """Distributed write of a parquet-directory layout (Ray writes one
    file per block — no driver funnel, resumable-output shape). Used
    for the small packing manifest; corpus-bytes outputs go through
    ``_ckpt_stage``. Row count comes from the written footers, not a
    re-execution."""
    target = os.path.join(d, filename)
    # crash healing: a stage dir without _SUCCESS may hold a partial
    # previous write — clear it so stale files can't mix into this
    # write's footer count
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
    skipped without re-reading their inputs; an INCOMPLETE stage
    resumes at partition granularity from its lineage manifest.
    ``embed_dim`` adds the optional text->embedding stage
    (stages/embed.py) producing the embeddings.parquet the ANN /
    embedding-near-dup family consumes."""
    from ..stages.dedup import dedup_minhash, dedup_spans
    from ..stages.joins import cogroup
    from ..stages.textstats import RedactActor
    from . import library as lib

    manifest: dict[str, int] = {}

    def _docs(d: str) -> "rd.Dataset":
        return rd.read_parquet(os.path.join(d, "documents.parquet"),
                               columns=["doc_id", "text"])

    # ---- stage 1: PII scrub (row-local -> true partition resume) -----
    d1 = _stage_dir(out_dir, "scrub")
    if not _done(d1):
        def scrub(pending: "rd.Dataset") -> "rd.Dataset":
            red = pending.map_batches(
                RedactActor, batch_format="pyarrow", batch_size=4096,
                concurrency=(1, 4), num_cpus=1,
            ).map_batches(
                lambda t: pa.table({"doc_id": t["doc_id"],
                                    "text": t["text_redacted"]}),
                batch_format="pyarrow")
            return add_part_id(red, "doc_id", _N_PARTS)

        src = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
        n = _ckpt_stage(src, scrub, d1, ["doc_id", "text"],
                        f"scrub:{os.path.abspath(sf_dir)}")
        _mark(d1, {"rows": n})
    manifest["scrub"] = json.load(
        open(os.path.join(d1, _SUCCESS), encoding="utf-8"))["rows"]

    # ---- stage 2: near-dup removal -----------------------------------
    d2 = _stage_dir(out_dir, "dedup")
    if not _done(d2):
        def dedup_stage(pending: "rd.Dataset") -> "rd.Dataset":
            # kept set is a GLOBAL deterministic compute over d1; the
            # semi-join against it runs on the pending subset only
            kept = dedup_minhash(d1)  # Dataset[doc_id] — corpus-scaled
            left = pending.map_batches(
                lambda t: t.select(["doc_id", "text"]),
                batch_format="pyarrow")

            def semi(ldf, rdf):
                out = ldf.merge(rdf[["doc_id"]].drop_duplicates(),
                                on="doc_id")
                return out[["doc_id", "text"]]

            survivors = cogroup(
                left, kept, ["doc_id"], semi,
                left_schema=pa.schema([("doc_id", pa.int64()),
                                       ("text", pa.string())]),
                right_schema=pa.schema([("doc_id", pa.int64())]),
            )
            return add_part_id(survivors, "doc_id", _N_PARTS)

        n = _ckpt_stage(src=_docs(d1), transform=dedup_stage,
                        stage_dir=d2, hash_cols=["doc_id", "text"],
                        input_fragment=f"dedup:{_stage_fingerprint(d1)}")
        _mark(d2, {"rows": n})
    manifest["dedup"] = json.load(
        open(os.path.join(d2, _SUCCESS), encoding="utf-8"))["rows"]

    # ---- stage 3: sub-document span dedup ----------------------------
    d3 = _stage_dir(out_dir, "spans")
    if not _done(d3):
        def spans_stage(pending: "rd.Dataset",
                        missing: set[int]) -> "rd.Dataset":
            # span winners are corpus-global: recompute the (determin-
            # istic) full pass, write only the missing partitions.
            # `pending` is unused — lazy, so its plan never executes.
            full = dedup_spans(d2, span_tokens=span_tokens).map_batches(
                lambda t: pa.table({"doc_id": t["doc_id"],
                                    "text": t["text_deduped"]}),
                batch_format="pyarrow")
            return _filter_parts(add_part_id(full, "doc_id", _N_PARTS),
                                 missing)

        n = _ckpt_stage(
            src=_docs(d2), transform=spans_stage, stage_dir=d3,
            hash_cols=["doc_id", "text"],
            input_fragment=f"spans:{span_tokens}:{_stage_fingerprint(d2)}")
        _mark(d3, {"rows": n})
    manifest["spans"] = json.load(
        open(os.path.join(d3, _SUCCESS), encoding="utf-8"))["rows"]

    # ---- stage 4: deterministic order + packing manifest -------------
    d4 = _stage_dir(out_dir, "order")
    if not _done(d4):
        def order_stage(pending: "rd.Dataset",
                        missing: set[int]) -> "rd.Dataset":
            # shuffle_key is a pure function of (doc_id, seed); the
            # global range sort re-runs on resume, the write is pruned
            full = lib.shuffle_documents(d3, seed=seed)
            return _filter_parts(add_part_id(full, "doc_id", _N_PARTS),
                                 missing)

        n = _ckpt_stage(
            src=_docs(d3), transform=order_stage, stage_dir=d4,
            hash_cols=["doc_id", "text", "shuffle_key"],
            input_fragment=f"order:{seed}:{_stage_fingerprint(d3)}")
        n_seq = _write_documents(
            lib.pack_documents(d3, seq_tokens=seq_tokens), d4,
            filename="packing.parquet")
        _mark(d4, {"rows": n, "sequences": n_seq})
    meta4 = json.load(open(os.path.join(d4, _SUCCESS), encoding="utf-8"))
    manifest["order"] = meta4["rows"]
    manifest["sequences"] = meta4.get("sequences", 0)

    # ---- stage 5 (optional): text -> embedding table ------------------
    if embed_dim is not None:
        from ..stages.embed import HashedNgramEmbedder

        d5 = _stage_dir(out_dir, "embed")
        if not _done(d5):
            def embed_stage(pending: "rd.Dataset") -> "rd.Dataset":
                emb = pending.map_batches(
                    HashedNgramEmbedder,
                    fn_constructor_kwargs={"dim": embed_dim, "seed": seed},
                    batch_format="pyarrow", batch_size=2048,
                    concurrency=(1, 8), num_cpus=1)
                # vec_id == doc_id by the embedder's contract, so the
                # re-derived part_id matches the input partitioning
                return add_part_id(emb, "vec_id", _N_PARTS)

            n = _ckpt_stage(
                src=_docs(d4), transform=embed_stage, stage_dir=d5,
                hash_cols=["vec_id", "embedding"],
                input_fragment=(f"embed:{embed_dim}:{seed}:"
                                f"{_stage_fingerprint(d4)}"),
                data_name="embeddings.parquet")
            _mark(d5, {"rows": n})
        manifest["embed"] = json.load(
            open(os.path.join(d5, _SUCCESS), encoding="utf-8"))["rows"]
    return manifest
