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


class RedactActor:
    """PII masking over a documents table (compiled regexes held per
    actor — ST1-ST3 shape, like the reference's per-process clients)."""

    def __init__(self) -> None:
        from ..functions.redact import redact_pii

        self._redact = redact_pii

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        reds, n_em, n_ip, n_ph = [], [], [], []
        for t in texts:
            r, e, i, p = self._redact(t)
            reds.append(r)
            n_em.append(e)
            n_ip.append(i)
            n_ph.append(p)
        return pa.table({
            "doc_id": batch["doc_id"],
            "text_redacted": pa.array(reds, pa.string()),
            "n_emails": pa.array(n_em, pa.int64()),
            "n_ips": pa.array(n_ip, pa.int64()),
            "n_phones": pa.array(n_ph, pa.int64()),
        })


class RepetitionActor:
    """Gopher-style duplicate/top n-gram character fractions."""

    def __init__(self) -> None:
        from ..functions.redact import repetition_metrics

        self._metrics = repetition_metrics

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        d2, d3, t2 = [], [], []
        for t in texts:
            a, b, c = self._metrics(t)
            d2.append(a)
            d3.append(b)
            t2.append(c)
        return pa.table({
            "doc_id": batch["doc_id"],
            "dup_2gram_frac": pa.array(d2, pa.float64()),
            "dup_3gram_frac": pa.array(d3, pa.float64()),
            "top_2gram_frac": pa.array(t2, pa.float64()),
        })


def redact_documents(sf_dir: str) -> "rd.Dataset":
    """documents -> (doc_id, text_redacted, n_emails, n_ips, n_phones).

    PII scrubbing pass (emails / IPv4 / phones) — regex masking with
    fixed precedence, per-span exactly-once counting. Non-SQL
    (DuckDB's regex dialect differs on lookarounds) -> rows-only driver
    check; the kernel parity + Ray-vs-reference equality live in
    ``tests/test_redact_repetition.py``."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        RedactActor,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )


def repetition_stats(sf_dir: str) -> "rd.Dataset":
    """documents -> duplicate/top n-gram character fractions (the
    Gopher repetition filters). Rows-only; kernel reference parity in
    ``tests/test_redact_repetition.py``."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        RepetitionActor,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )


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
