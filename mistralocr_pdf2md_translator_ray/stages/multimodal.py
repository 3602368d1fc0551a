"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sidecar metadata
(kind, dims). The decode step itself is STUBBED — no image/audio codecs
exist in this container — but the Ray-side plumbing is real and tested:
actor-pool signature, small batch sizes for wide binary rows, schema,
and output layout all match what a real decoder drops into.

To plug a real decoder: subclass ``PayloadFeatureActor`` and override
``_decode`` (it currently raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic blake2b-derived
pseudo-decode so the pipeline shape is testable end-to-end).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

FEATURE_DIM = 16


class PayloadFeatureActor:
    """binary payload -> fixed-dim feature vector + metadata.

    Actor-pool stage: feature extractor state (a real model, here just
    the projection seed) loads once per actor in ``__init__``.
    """

    def __init__(self, fake: bool = True) -> None:
        self._fake = fake
        rng = np.random.default_rng(99)
        self._proj = rng.standard_normal((32, FEATURE_DIM))

    def _decode(self, blob: bytes) -> np.ndarray:
        """STUB: real image/audio decode is unavailable in this
        environment. The deterministic fake hashes the payload into a
        32-byte vector; a real implementation returns pixel/sample
        arrays."""
        if not self._fake:
            raise NotImplementedError(
                "payload decode requires an image/audio codec; not available here"
            )
        digest = hashlib.blake2b(blob or b"", digest_size=32).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["payload"].to_pylist()
        feats, sizes, statuses = [], [], []
        for blob in blobs:
            try:
                decoded = self._decode(bytes(blob) if blob is not None else b"")
                feats.append(np.round(decoded @ self._proj, 6).tolist())
                sizes.append(len(blob) if blob is not None else 0)
                statuses.append("ok")
            except NotImplementedError as e:
                feats.append([0.0] * FEATURE_DIM)
                sizes.append(len(blob) if blob is not None else 0)
                statuses.append(f"error: {e}")
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "payload_id": batch["payload_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array(sizes, pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float64(), FEATURE_DIM)),
            "decode_status": pa.array(statuses, pa.string()),
        })


def payload_features(payloads: "rd.Dataset") -> "rd.Dataset":
    """Payload table -> feature table. Small batches: binary rows are
    wide, so batch bytes (not row count) bound worker heap."""
    return payloads.map_batches(
        PayloadFeatureActor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    )
