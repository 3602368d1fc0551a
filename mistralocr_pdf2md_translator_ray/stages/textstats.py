"""Text-analysis stage over a documents table (actor pool).

Language ID, quality scoring, token counting and fingerprinting in one
pass — the per-worker state (compiled regexes, stopword tables) lives in
the actor's ``__init__`` (the reference holds its clients the same way,
``mistralocr_app.py:775-800``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd


class TextStatsActor:
    def __init__(self) -> None:
        from ..functions.textstats import (
            fingerprint64,
            lang_id,
            quality_score,
            token_count,
            tokenize,
        )

        self._lang = lang_id
        self._quality = quality_score
        self._ntok = token_count
        self._fp = fingerprint64
        self._tok = tokenize

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs, quals, ntoks, fps = [], [], [], []
        for t in texts:
            toks = self._tok(t)  # tokenize ONCE; quality + fingerprint share
            langs.append(self._lang(t))
            quals.append(self._quality(t, toks))
            ntoks.append(self._ntok(t))
            fps.append(self._fp(t, toks))
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(langs, pa.string()),
            "quality": pa.array(quals, pa.float64()),
            "n_tokens": pa.array(ntoks, pa.int64()),
            "fingerprint": pa.array(fps, pa.int64()),
        })


def text_quality(sf_dir: str) -> "rd.Dataset":
    """documents -> (doc_id, lang_pred, quality, n_tokens, fingerprint).

    Heuristic composites (stopword lang-ID, quality score, blake2b
    fingerprint) with no SQL equivalent — rows-only driver check; the
    kernels are unit-tested. The SQL-verifiable size stats live in
    ``pipelines.library.doc_stats``."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        TextStatsActor,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )
