"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sidecar metadata
(kind, dims). Decode is AUTO-PROBED, three rungs:

1. a real codec if importable (Pillow for images, PyAV for video);
2. for PNG payloads, the stdlib-only codec in ``functions/png.py``
   (zlib inflate + unfilter) — REAL decode even in this codec-less
   container, matching the reference's base64-PNG handling
   (mistralocr_app.py:107,262-270);
3. the deterministic blake2b-derived fake for everything else.

The Ray-side plumbing (actor-pool signature, small batch sizes for wide
binary rows, schema, output layout) is identical on every rung.
``fake=True`` forces the fake; ``fake=False`` demands real decode
(PNG via stdlib counts; other formats without a codec become
error-as-value rows); ``fake=None`` (default) probes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.png import (
    PngError,
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
    to_gray,
)

FEATURE_DIM = 16


def probe_image_codec():
    """Optional-dependency probe: return the PIL.Image module when a
    real image codec is importable, else None. Actors built with
    ``fake=None`` (the default) use the real decoder iff one exists —
    in this container none does, so the deterministic fake runs; a
    deployment with Pillow installed gets real decode with NO config
    change."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


def probe_video_codec():
    """Same probe for a video demuxer (PyAV)."""
    try:
        import av  # noqa: PLC0415
        return av
    except ImportError:
        return None


class PayloadFeatureActor:
    """binary payload -> fixed-dim feature vector + metadata.

    Actor-pool stage: feature extractor state (a real model, here just
    the projection seed) loads once per actor in ``__init__``.
    """

    def __init__(self, fake: bool | None = None) -> None:
        # fake=None -> auto: real decode when a codec rung applies
        # (Pillow, or stdlib PNG for PNG payloads); fake=False demands
        # real decode (non-PNG without Pillow raises -> error-as-value)
        self._codec = None if fake is True else probe_image_codec()
        self._fake = (self._codec is None) if fake is None else fake
        self._mode = fake  # None=auto, True=force fake, False=demand real
        rng = np.random.default_rng(99)
        self._proj = rng.standard_normal((32, FEATURE_DIM))

    def _decode(self, blob: bytes) -> np.ndarray:
        """Decode -> 8x4 grayscale thumbnail -> 32 floats in [0,1].
        Rungs: Pillow; stdlib PNG (functions/png.py); deterministic
        blake2b fake. All three feed the same projection."""
        if self._mode is not True:
            if self._codec is not None:
                import io

                img = self._codec.open(io.BytesIO(blob)).convert("L").resize((8, 4))
                return np.asarray(img, dtype=np.float64).reshape(32) / 255.0
            if is_png(blob):
                # real decode on this container; PngError propagates to
                # the caller's error-as-value handler
                gray = to_gray(decode_png(blob))
                return resize_nearest(gray, 8, 4).reshape(32) / 255.0
            if self._mode is False:
                raise NotImplementedError(
                    "payload decode requires an image codec (Pillow) "
                    "for non-PNG payloads; not available here")
        digest = hashlib.blake2b(blob or b"", digest_size=32).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["payload"].to_pylist()
        feats, sizes, statuses = [], [], []
        for blob in blobs:
            sizes.append(len(blob) if blob is not None else 0)
            # try scopes the DECODE only: a corrupt payload is data
            # (error-as-value), but a projection shape bug must fail
            # loudly, not silently zero every row
            try:
                decoded = self._decode(bytes(blob) if blob is not None else b"")
            except (NotImplementedError, PngError, OSError, ValueError) as e:
                feats.append([0.0] * FEATURE_DIM)
                statuses.append(f"error: {e}")
                continue
            feats.append(np.round(decoded @ self._proj, 6).tolist())
            statuses.append("ok")
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


class ImageResizeActor:
    """binary image payload -> resized binary + dims metadata.

    Decode/encode are STUBBED like ``PayloadFeatureActor._decode`` (no
    codecs in this container): the deterministic fake derives the
    "resized" bytes from blake2b(payload, target dims) with size
    proportional to w*h, so downstream byte-size accounting is
    realistic. The plumbing a real codec drops into — actor pool,
    small batches for wide rows, error-as-value status — is real.
    """

    def __init__(self, width: int = 64, height: int = 64,
                 fake: bool | None = None) -> None:
        self._w, self._h = int(width), int(height)
        self._codec = None if fake is True else probe_image_codec()
        self._fake = (self._codec is None) if fake is None else fake
        self._mode = fake  # None=auto, True=force fake, False=demand real

    def _resize(self, blob: bytes) -> bytes:
        if self._mode is not True:
            if self._codec is not None:
                import io

                img = self._codec.open(io.BytesIO(blob)).resize((self._w, self._h))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()
            if is_png(blob):
                # stdlib rung: real decode -> nearest resample -> real
                # PNG bytes out (PngError -> error-as-value upstream)
                return encode_png(resize_nearest(decode_png(blob),
                                                 self._w, self._h))
            if self._mode is False:
                raise NotImplementedError(
                    "image resize requires an image codec (Pillow) "
                    "for non-PNG payloads; not available here")
        seed = hashlib.blake2b(
            blob + f"{self._w}x{self._h}".encode(), digest_size=32).digest()
        # deterministic pseudo-pixels, 1 byte per target pixel
        reps = (self._w * self._h) // len(seed) + 1
        return (seed * reps)[: self._w * self._h]

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["payload"].to_pylist()
        out_blobs, statuses = [], []
        for blob in blobs:
            try:
                out_blobs.append(self._resize(bytes(blob) if blob else b""))
                statuses.append("ok")
            except (NotImplementedError, PngError, OSError, ValueError) as e:
                out_blobs.append(b"")
                statuses.append(f"error: {e}")
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "payload_id": batch["payload_id"],
            "payload_resized": pa.array(out_blobs, pa.binary()),
            "width": pa.array([self._w] * len(blobs), pa.int32()),
            "height": pa.array([self._h] * len(blobs), pa.int32()),
            "resize_status": pa.array(statuses, pa.string()),
        })


def resize_payloads(payloads: "rd.Dataset", width: int = 64,
                    height: int = 64) -> "rd.Dataset":
    return payloads.map_batches(
        ImageResizeActor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
        fn_constructor_kwargs={"width": width, "height": height},
    )


class FrameSampleActor:
    """binary video payload -> one ROW PER SAMPLED FRAME (fan-out map).

    The fake "container" derives frame count from payload length
    (1 frame per KiB, min 1) and each frame's bytes from
    blake2b(payload, frame_idx); a real demuxer replaces ``_frames``.
    Output multiplies rows — the Ray shape is a map_batches whose
    output table is longer than its input, which streams fine (no
    flat_map per row)."""

    def __init__(self, every: int = 2, fake: bool | None = None) -> None:
        self._every = max(1, int(every))
        self._codec = None if fake is True else probe_video_codec()
        self._fake = (self._codec is None) if fake is None else fake

    def _frames(self, blob: bytes) -> list[tuple[int, bytes]]:
        if not self._fake:
            if self._codec is None:
                raise NotImplementedError(
                    "frame sampling requires a video demuxer (PyAV); "
                    "not available here")
            import io

            out = []
            with self._codec.open(io.BytesIO(blob)) as container:
                for idx, frame in enumerate(container.decode(video=0)):
                    if idx % self._every == 0:
                        out.append((idx, frame.to_ndarray().tobytes()))
            return out
        n_frames = max(1, len(blob) // 1024)
        out = []
        for idx in range(0, n_frames, self._every):
            out.append((idx, hashlib.blake2b(
                blob + idx.to_bytes(4, "little"), digest_size=32).digest()))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        turns = batch["turn_idx"].to_pylist()
        pids = batch["payload_id"].to_pylist()
        blobs = batch["payload"].to_pylist()
        o_conv, o_turn, o_pid, o_idx, o_frame, o_status = [], [], [], [], [], []
        for conv, turn, pid, blob in zip(convs, turns, pids, blobs):
            try:
                frames = self._frames(bytes(blob) if blob else b"")
                for idx, fr in frames:
                    o_conv.append(conv)
                    o_turn.append(turn)
                    o_pid.append(pid)
                    o_idx.append(idx)
                    o_frame.append(fr)
                    o_status.append("ok")
            except NotImplementedError as e:
                o_conv.append(conv)
                o_turn.append(turn)
                o_pid.append(pid)
                o_idx.append(-1)
                o_frame.append(b"")
                o_status.append(f"error: {e}")
        return pa.table({
            "conv_id": pa.array(o_conv, pa.string()),
            "turn_idx": pa.array(o_turn, pa.int32()),
            "payload_id": pa.array(o_pid, pa.string()),
            "frame_idx": pa.array(o_idx, pa.int32()),
            "frame": pa.array(o_frame, pa.binary()),
            "sample_status": pa.array(o_status, pa.string()),
        })


def sample_frames(payloads: "rd.Dataset", every: int = 2) -> "rd.Dataset":
    return payloads.map_batches(
        FrameSampleActor,
        batch_format="pyarrow",
        batch_size=64,  # row fan-out: output is ~frames/every x larger
        concurrency=(1, 4),
        num_cpus=1,
        fn_constructor_kwargs={"every": every},
    )


class PayloadDHashActor:
    """binary payload -> 64-bit perceptual dHash (+ stable vec_id).

    Same three decode rungs as PayloadFeatureActor (Pillow / stdlib PNG
    / deterministic blake2b fake). On the fake rung the "hash" is a
    blake2b digest of the bytes, so byte-identical payloads still
    collide exactly — near-dup detection degrades to exact-dup instead
    of silently inventing similarity. vec_id is blake2b-63bit over
    (conv_id, turn_idx, payload_id); collisions are ~n^2/2^63.
    """

    def __init__(self, fake: bool | None = None) -> None:
        self._codec = None if fake is True else probe_image_codec()
        self._mode = fake  # None=auto, True=force fake, False=demand real

    def _hash(self, blob: bytes) -> int:
        from ..functions.png import dhash64

        if self._mode is not True:
            if self._codec is not None:
                import io

                img = self._codec.open(io.BytesIO(blob)).convert("L")
                return dhash64(np.asarray(img, dtype=np.float64))
            if is_png(blob):
                return dhash64(to_gray(decode_png(blob)))
            if self._mode is False:
                raise NotImplementedError(
                    "payload dhash requires an image codec (Pillow) "
                    "for non-PNG payloads; not available here")
        d = hashlib.blake2b(blob or b"", digest_size=8).digest()
        return int.from_bytes(d, "big")

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        turns = batch["turn_idx"].to_pylist()
        pids = batch["payload_id"].to_pylist()
        vec_ids, hashes, statuses = [], [], []
        for cid, ti, pid, blob in zip(convs, turns, pids,
                                      batch["payload"].to_pylist()):
            key = f"{cid}|{ti}|{pid}".encode("utf-8")
            vec_ids.append(int.from_bytes(
                hashlib.blake2b(key, digest_size=8).digest(), "big") >> 1)
            try:
                h = self._hash(bytes(blob) if blob is not None else b"")
                statuses.append("ok")
            except (NotImplementedError, PngError, OSError, ValueError) as e:
                h = 0
                statuses.append(f"error: {e}")
            hashes.append(h)
        return pa.table({
            "vec_id": pa.array(vec_ids, pa.int64()),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "payload_id": batch["payload_id"],
            "dhash": pa.array(np.array(hashes, dtype=np.uint64)
                              .astype(np.int64), pa.int64()),
            "decode_status": pa.array(statuses, pa.string()),
        })


def payload_dhash(payloads: "rd.Dataset",
                  fake: bool | None = None) -> "rd.Dataset":
    """Payload table -> perceptual-hash table (actor pool, small
    batches: binary rows are wide)."""
    return payloads.map_batches(
        PayloadDHashActor,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    )


def neardup_images(payloads: "rd.Dataset", max_hamming: int = 4,
                   fake: bool | None = None) -> "rd.Dataset":
    """Perceptual near-duplicate image removal: dHash + band blocking.

    Same derived-band contract as dedup_simhash (bands = max_hamming+1,
    pigeonhole: Hamming <= max_hamming guarantees >= 1 identical band),
    inline Hamming verification inside each band bucket (the sketch IS
    the signature, nothing re-reads payload bytes), adaptive
    clustering/removal via the shared dedup machinery, and a final
    co-group maps kept vec_ids back to payload keys. Error rows (hash
    0) are excluded from banding so they can never cluster together.
    Returns kept (conv_id, turn_idx, payload_id, dhash, decode_status)
    — decode_status distinguishes kept-because-undecodable rows (hash
    forced to 0, always kept) from a genuinely uniform image whose real
    dHash is also 0."""
    from ..functions.dedup import simhash_bands
    from .dedup import (
        _hamming_component_pairs,
        _keep_after_pairs,
        _pairs_dataset,
    )
    from .joins import cogroup

    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n_bands = max_hamming + 1
    # hashes are small (fixed-width columns, no payload bytes) and feed
    # three consumers (bands, keep-filter, final join) — materialize
    hashed = payload_dhash(payloads, fake=fake).materialize()

    def bands(t: pa.Table) -> pa.Table:
        ids, keys, hs = [], [], []
        ok = [s == "ok" for s in t["decode_status"].to_pylist()]
        for keep, vid, h in zip(ok, t["vec_id"].to_pylist(),
                                t["dhash"].to_pylist()):
            if not keep:
                continue
            hu = int(np.int64(h).astype(np.uint64))
            for i, band in enumerate(simhash_bands(hu, bands=n_bands)):
                ids.append(vid)
                keys.append(f"{i}:{band:x}")
                hs.append(h)
        return pa.table({
            "band_key": pa.array(keys, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(hs, pa.int64()),
        })

    buckets = hashed.map_batches(bands, batch_format="pyarrow",
                                 batch_size=4096)

    def hamming_pairs(sub: pd.DataFrame):
        # star + representative edges: components identical to the
        # naive all-pairs at O(n + |U|^2) per bucket — a mirrored image
        # repeated a million times yields one star, not n^2/2 pairs
        yield from _hamming_component_pairs(sub, max_hamming)

    verified, _n_raw = _pairs_dataset(buckets, hamming_pairs)
    ids_only = hashed.map_batches(
        lambda t: pa.table({"doc_id": t["vec_id"]}),
        batch_format="pyarrow")
    kept = _keep_after_pairs(ids_only, verified)

    def back(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        m = rdf.merge(ldf[["doc_id"]].drop_duplicates(),
                      on="doc_id", how="inner")
        return m[["conv_id", "turn_idx", "payload_id", "dhash",
                  "decode_status"]].astype(
            {"turn_idx": "int32", "dhash": "int64"})

    def as_doc_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["vec_id"],
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "payload_id": t["payload_id"],
            "dhash": t["dhash"],
            "decode_status": t["decode_status"],
        })

    # Both sides declare the FULL shared schema with explicit dummies
    # (the tfidf-salted-join rule): a null-filled int64 column in the
    # co-group's pandas union coerces through float64, which is LOSSY
    # above 2^53 — most 64-bit dhash values. Caught by the query
    # schema-pin test (turn_idx/dhash read back as double).
    _full = pa.schema([("doc_id", pa.int64()), ("conv_id", pa.string()),
                       ("turn_idx", pa.int32()),
                       ("payload_id", pa.string()),
                       ("dhash", pa.int64()),
                       ("decode_status", pa.string())])

    def pad_kept(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "conv_id": pa.array([""] * n, pa.string()),
            "turn_idx": pa.array(np.full(n, -1, np.int32), pa.int32()),
            "payload_id": pa.array([""] * n, pa.string()),
            "dhash": pa.array(np.zeros(n, np.int64), pa.int64()),
            "decode_status": pa.array([""] * n, pa.string()),
        })

    return cogroup(
        kept.map_batches(pad_kept, batch_format="pyarrow"),
        hashed.map_batches(as_doc_rows, batch_format="pyarrow"),
        on=["doc_id"],
        merge_fn=back,
        left_schema=_full,
        right_schema=_full,
    )
