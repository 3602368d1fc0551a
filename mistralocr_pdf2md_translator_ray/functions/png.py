"""Minimal stdlib-only PNG codec: zlib inflate + per-scanline unfilter.

Third rung of the multimodal decode probe (stages/multimodal.py): in a
container without Pillow, PNG payloads still get REAL decode — parity
with the reference's base64-PNG handling (mistralocr_app.py:107,
262-270) — while non-PNG payloads keep the deterministic fake.

Decoder: non-interlaced, 8-bit samples; color types gray(0), RGB(2),
palette(3), gray+alpha(4), RGBA(6). Anything else raises ``PngError``
(callers convert to error-as-value rows). Encoder: 8-bit gray / RGB /
RGBA, filter 0 per scanline — enough to round-trip and to emit real
PNG bytes from the resize stage.

Pure functions over numpy arrays; no per-pixel Python except where the
PNG filter itself is a sequential recurrence (Sub/Average/Paeth carry a
left-neighbor dependency, looped per scanline over pixels-as-vectors of
channels, i.e. O(width) per line, vectorized across channels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Cap on the UNFILTERED image size (height * (width*channels + 1)).
#: zlib reaches ~1000:1 ratios, so a few-MB crafted IDAT could inflate
#: to gigabytes and OOM-kill the actor before any length check ran —
#: violating the decode stages' error-as-value contract. 256 MiB raw
#: (~9000x9000 RGB) is far above any payload this engine feeds per row.
MAX_RAW_BYTES = 1 << 28


class PngError(ValueError):
    """Malformed or unsupported PNG (caller maps to status='error')."""


def is_png(blob: bytes) -> bool:
    return bool(blob) and blob[:8] == PNG_MAGIC


def _chunks(blob: bytes):
    pos = 8
    n = len(blob)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk")
        crc_end = pos + 8 + length + 4
        if crc_end > n:
            raise PngError("truncated chunk crc")
        (crc,) = struct.unpack(">I", blob[pos + 8 + length:crc_end])
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise PngError(f"bad crc in {ctype!r}")
        yield ctype, data
        pos = crc_end
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    # int16 arithmetic: a,b,c are uint8-valued
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering -> (height, width*bpp) uint8."""
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise PngError("bad IDAT length")
    lines = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    ftypes = lines[:, 0]
    data = lines[:, 1:].astype(np.int16)  # headroom for filter math
    out = np.zeros((height, stride), np.int16)
    prev = np.zeros(stride, np.int16)
    for y in range(height):
        ft = ftypes[y]
        cur = data[y]
        if ft == 0:
            line = cur
        elif ft == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ft in (1, 3, 4):
            # left-neighbor recurrence: loop pixels, vectorize channels
            line = np.zeros(stride, np.int16)
            px = cur.reshape(width, bpp)
            ln = line.reshape(width, bpp)
            pv = prev.reshape(width, bpp)
            left = np.zeros(bpp, np.int16)
            upleft = np.zeros(bpp, np.int16)
            for x in range(width):
                up = pv[x]
                if ft == 1:  # Sub
                    ln[x] = (px[x] + left) & 0xFF
                elif ft == 3:  # Average
                    ln[x] = (px[x] + ((left + up) >> 1)) & 0xFF
                else:  # Paeth
                    ln[x] = (px[x] + _paeth(left, up, upleft)) & 0xFF
                left = ln[x]
                upleft = up
        else:
            raise PngError(f"unknown filter type {ft}")
        out[y] = line
        prev = line
    return out.astype(np.uint8)


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for gray or (h, w, c) otherwise."""
    if not is_png(blob):
        raise PngError("not a PNG (bad signature)")
    width = height = None
    color_type = -1
    palette: np.ndarray | None = None
    idat: list[bytes] = []
    for ctype, data in _chunks(blob):
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data))
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise PngError("bad PLTE length")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if width is None or not idat:
        raise PngError("missing IHDR or IDAT")
    if width == 0 or height == 0:
        raise PngError("zero-dimension image")
    bpp = _CHANNELS[color_type]
    expected = height * (width * bpp + 1)
    if expected > MAX_RAW_BYTES:
        raise PngError(f"raw image size {expected} exceeds cap {MAX_RAW_BYTES}")
    # Bounded inflate: never allocate more than the IHDR-derived size,
    # whatever the compressed stream claims (decompression-bomb guard).
    d = zlib.decompressobj()
    try:
        raw = d.decompress(b"".join(idat), expected)
        if d.unconsumed_tail and d.decompress(d.unconsumed_tail, 1):
            raise PngError("IDAT inflates past expected image size")
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    arr = _unfilter(raw, width, height, bpp)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        idx = arr.reshape(height, width)
        if int(idx.max(initial=0)) >= len(palette):
            raise PngError("palette index out of range")
        return palette[idx]  # (h, w, 3)
    if bpp == 1:
        return arr.reshape(height, width)
    return arr.reshape(height, width, bpp)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) gray / (h, w, 2) gray+alpha / (h, w, 3) RGB /
    (h, w, 4) RGBA -> PNG bytes (filter 0 per scanline). Covers every
    shape decode_png can produce, so decode->transform->encode
    round-trips any decoder-supported PNG."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, ch = 0, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        h, w, ch = a.shape
        color_type = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise PngError(f"unsupported array shape {a.shape}")
    if h == 0 or w == 0:
        raise PngError("zero-dimension image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = a.reshape(h, w * ch)
    raw = np.zeros((h, w * ch + 1), np.uint8)
    raw[:, 1:] = body
    idat = zlib.compress(raw.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def to_gray(arr: np.ndarray) -> np.ndarray:
    """uint8 image -> float64 (h, w) luma in [0, 255].

    ITU-R 601-2 weights (the same formula PIL's convert("L") uses), so
    the stdlib rung and the Pillow rung agree up to rounding."""
    if arr.ndim == 2:
        return arr.astype(np.float64)
    ch = arr.shape[2]
    if ch == 2:  # gray + alpha: luma is the gray channel
        return arr[:, :, 0].astype(np.float64)
    rgb = arr[:, :, :3].astype(np.float64)
    return rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width); center sampling
    (src = floor((dst + 0.5) * scale)), deterministic."""
    h, w = arr.shape[:2]
    ys = np.minimum((((np.arange(height) + 0.5) * h / height)).astype(np.int64),
                    h - 1)
    xs = np.minimum((((np.arange(width) + 0.5) * w / width)).astype(np.int64),
                    w - 1)
    return arr[ys][:, xs]


def dhash64(gray: np.ndarray) -> int:
    """64-bit difference hash (dHash): resample the luma plane to 9x8,
    one bit per horizontal neighbor pair (left < right). Invariant to
    uniform brightness shifts and any change outside the sampled grid;
    small local edits flip few bits, so Hamming distance is a
    perceptual near-dup metric (the standard pHash-family baseline).
    Returns an unsigned value in [0, 2^64)."""
    g = resize_nearest(gray, 9, 8).astype(np.float64)
    bits = (g[:, :-1] < g[:, 1:]).ravel()
    return int.from_bytes(np.packbits(bits).tobytes(), "big")
