"""Stdlib PNG codec (functions/png.py) + the multimodal stdlib-decode
rung: real PNG decode in this codec-less container.

Covers: encode/decode round-trips (gray/RGB/RGBA), all five scanline
filter types via a forward-filtering helper, palette images, nearest
resample, luma, malformed-PNG error taxonomy, and the actor rungs
(PNG payload -> real decode; non-PNG -> fake; corrupt PNG ->
error-as-value)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from mistralocr_pdf2md_translator_ray.functions.png import (
    PNG_MAGIC,
    PngError,
    _paeth,
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
    to_gray,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _build_png(w, h, color_type, raw, *, depth=8, interlace=0, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _forward_filter(img: np.ndarray, ftypes) -> bytes:
    """Apply per-scanline PNG filtering (the encoder side of what
    _unfilter reverses) with a chosen filter type per line."""
    a = img[:, :, None] if img.ndim == 2 else img
    a = a.astype(np.int16)
    h, w, ch = a.shape
    flat = a.reshape(h, w * ch)
    out = bytearray()
    prev = np.zeros(w * ch, np.int16)

    def shifted(v):
        s = np.zeros_like(v)
        s[ch:] = v[:-ch]
        return s

    for y, ft in zip(range(h), ftypes):
        cur = flat[y]
        left = shifted(cur)
        if ft == 0:
            f = cur
        elif ft == 1:
            f = (cur - left) % 256
        elif ft == 2:
            f = (cur - prev) % 256
        elif ft == 3:
            f = (cur - ((left + prev) >> 1)) % 256
        else:
            f = (cur - _paeth(left, prev, shifted(prev))) % 256
        out.append(ft)
        out.extend(f.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


class TestPngCodec:
    @pytest.mark.parametrize("shape",
                             [(5, 7), (4, 3, 3), (2, 2, 4), (1, 1),
                              (3, 4, 2)])
    def test_roundtrip(self, shape):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        blob = encode_png(img)
        assert is_png(blob)
        np.testing.assert_array_equal(decode_png(blob), img)

    @pytest.mark.parametrize("channels", [1, 3, 4])
    def test_all_filter_types_decode(self, channels):
        rng = np.random.default_rng(7)
        shape = (10, 6) if channels == 1 else (10, 6, channels)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        # one line of each filter type, then wrap around
        ftypes = [y % 5 for y in range(10)]
        raw = _forward_filter(img, ftypes)
        ct = {1: 0, 3: 2, 4: 6}[channels]
        blob = _build_png(6, 10, ct, raw)
        np.testing.assert_array_equal(decode_png(blob), img)

    def test_gray_alpha_decode(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(4, 5, 2), dtype=np.uint8)
        raw = _forward_filter(img, [4, 3, 2, 1])
        blob = _build_png(5, 4, 4, raw)
        np.testing.assert_array_equal(decode_png(blob), img)

    def test_palette_decode(self):
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
        raw = _forward_filter(idx, [0, 0])
        blob = _build_png(3, 2, 3, raw, plte=pal.tobytes())
        out = decode_png(blob)
        np.testing.assert_array_equal(out, pal[idx])

    def test_multiple_idat_chunks(self):
        img = np.arange(24, dtype=np.uint8).reshape(4, 6)
        raw = zlib.compress(_forward_filter(img, [0, 0, 0, 0]))
        ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 0, 0, 0, 0)
        blob = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", raw[:5]) + _chunk(b"IDAT", raw[5:])
                + _chunk(b"IEND", b""))
        np.testing.assert_array_equal(decode_png(blob), img)

    def test_error_taxonomy(self):
        img = np.zeros((2, 2), np.uint8)
        good = encode_png(img)
        with pytest.raises(PngError, match="signature"):
            decode_png(b"nope" * 4)
        with pytest.raises(PngError, match="crc|trunc|IEND"):
            decode_png(good[:-6])  # truncated inside the IEND chunk
        bad_crc = bytearray(good)
        bad_crc[40] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(PngError):
            decode_png(bytes(bad_crc))
        raw = _forward_filter(img, [0, 0])
        with pytest.raises(PngError, match="bit depth"):
            decode_png(_build_png(2, 2, 0, raw, depth=16))
        with pytest.raises(PngError, match="interlaced"):
            decode_png(_build_png(2, 2, 0, raw, interlace=1))
        with pytest.raises(PngError, match="filter type"):
            decode_png(_build_png(2, 2, 0, b"\x09\x00\x00\x09\x00\x00"))
        with pytest.raises(PngError, match="IDAT length"):
            decode_png(_build_png(3, 2, 0, raw))  # width lies
        with pytest.raises(PngError, match="inflate"):
            blob = (PNG_MAGIC
                    + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
                    + _chunk(b"IDAT", b"not zlib") + _chunk(b"IEND", b""))
            decode_png(blob)
        with pytest.raises(PngError, match="out of range"):
            decode_png(_build_png(2, 2, 3, _forward_filter(
                np.full((2, 2), 9, np.uint8), [0, 0]), plte=b"\x00\x00\x00"))

    def test_decompression_bomb_guards(self):
        # IHDR claiming absurd dimensions is rejected BEFORE any
        # inflate allocation (the expected raw size breaks the cap)
        ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0)
        blob = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(b"\x00"))
                + _chunk(b"IEND", b""))
        with pytest.raises(PngError, match="exceeds cap"):
            decode_png(blob)
        # small declared dims but an IDAT stream inflating far past
        # them: the bounded inflate stops at the expected size instead
        # of allocating whatever the stream holds (zlib bombs reach
        # ~1000:1), and reports the oversize as a PngError
        raw = _forward_filter(np.zeros((2, 2), np.uint8), [0, 0])
        bomb = zlib.compress(raw + b"\x00" * 1_000_000)
        blob = (PNG_MAGIC
                + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
                + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
        with pytest.raises(PngError, match="inflates past"):
            decode_png(blob)

    def test_resize_nearest_and_luma(self):
        img = np.array([[0, 10], [20, 30]], np.uint8)
        up = resize_nearest(img, 4, 4)
        assert up.shape == (4, 4)
        np.testing.assert_array_equal(up[0], [0, 0, 10, 10])
        np.testing.assert_array_equal(up[3], [20, 20, 30, 30])
        down = resize_nearest(up, 2, 2)
        np.testing.assert_array_equal(down, img)
        rgb = np.zeros((1, 1, 3), np.uint8)
        rgb[0, 0] = (100, 200, 50)
        expected = 100 * 0.299 + 200 * 0.587 + 50 * 0.114
        assert abs(to_gray(rgb)[0, 0] - expected) < 1e-9

    def test_pil_parity_when_available(self):
        """Deployment cross-check (skips here): our decode == Pillow's."""
        PIL_Image = pytest.importorskip("PIL.Image")
        import io

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
        blob = encode_png(img)
        ref = np.asarray(PIL_Image.open(io.BytesIO(blob)).convert("RGB"))
        np.testing.assert_array_equal(decode_png(blob), ref)


class TestStdlibDecodeRung:
    """The multimodal actors' third probe rung: PNG payloads get REAL
    decode in this container; non-PNG stays on the deterministic fake;
    corrupt PNG becomes an error-as-value row."""

    def _batch(self, blobs):
        n = len(blobs)
        return pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "payload_id": pa.array([f"p{i}" for i in range(n)], pa.string()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(blobs, pa.binary()),
        })

    def test_feature_actor_real_png_path(self):
        from mistralocr_pdf2md_translator_ray.stages.multimodal import (
            FEATURE_DIM,
            PayloadFeatureActor,
        )

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        png = encode_png(img)
        # fake=None auto-probes onto the stdlib rung; fake=False demands
        # real decode and the PNG satisfies it — both must agree
        for mode in (None, False):
            actor = PayloadFeatureActor(fake=mode)
            out = actor(self._batch([png]))
            assert out["decode_status"][0].as_py() == "ok"
            feat = np.array(out["feature"][0].as_py())
            assert feat.shape == (FEATURE_DIM,)
            expected = (resize_nearest(to_gray(img), 8, 4).reshape(32)
                        / 255.0) @ actor._proj
            np.testing.assert_allclose(feat, np.round(expected, 6))
        # the hash-fake of the same bytes must NOT equal the real decode
        fake_out = PayloadFeatureActor(fake=True)(self._batch([png]))
        assert list(fake_out["feature"][0].as_py()) != list(feat)

    def test_feature_actor_corrupt_png_is_error_value(self):
        from mistralocr_pdf2md_translator_ray.stages.multimodal import (
            PayloadFeatureActor,
        )

        corrupt = PNG_MAGIC + b"\x00\x00\x00\x0dIHDRgarbage"
        out = PayloadFeatureActor()(self._batch([corrupt]))
        assert out["decode_status"][0].as_py().startswith("error:")

    def test_resize_actor_emits_real_png(self):
        from mistralocr_pdf2md_translator_ray.stages.multimodal import (
            ImageResizeActor,
        )

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
        out = ImageResizeActor(width=6, height=8)(self._batch([encode_png(img)]))
        assert out["resize_status"][0].as_py() == "ok"
        resized = decode_png(bytes(out["payload_resized"][0].as_py()))
        np.testing.assert_array_equal(resized, resize_nearest(img, 6, 8))

    def test_resize_actor_gray_alpha_roundtrip(self):
        # color type 4 (gray+alpha): decode_png supports it, so the
        # stdlib rung must resize it, not error-as-value (ADVICE r4)
        from mistralocr_pdf2md_translator_ray.stages.multimodal import (
            ImageResizeActor,
            probe_image_codec,
        )

        if probe_image_codec() is not None:
            pytest.skip("Pillow present: resize bypasses the stdlib rung")
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(10, 12, 2), dtype=np.uint8)
        out = ImageResizeActor(width=5, height=4)(self._batch([encode_png(img)]))
        assert out["resize_status"][0].as_py() == "ok"
        resized = decode_png(bytes(out["payload_resized"][0].as_py()))
        np.testing.assert_array_equal(resized, resize_nearest(img, 5, 4))

    def test_non_png_payload_keeps_fake_or_errors(self):
        from mistralocr_pdf2md_translator_ray.stages.multimodal import (
            ImageResizeActor,
            PayloadFeatureActor,
            probe_image_codec,
        )

        if probe_image_codec() is not None:
            pytest.skip("Pillow present: non-PNG decodes for real")
        blob = b'{"not": "an image"}'
        auto = PayloadFeatureActor()(self._batch([blob]))
        assert auto["decode_status"][0].as_py() == "ok"  # fake path
        strict = PayloadFeatureActor(fake=False)(self._batch([blob]))
        assert strict["decode_status"][0].as_py().startswith("error:")
        strict_r = ImageResizeActor(fake=False)(self._batch([blob]))
        assert strict_r["resize_status"][0].as_py().startswith("error:")
