"""Deterministic image codec + payload invariants (E7).

The environment has no Pillow/libjpeg, so the engine ships its own trivially
lossless codec ("rawz": zlib-compressed raw grayscale) — decode(encode(x)) is
bit-exact, giving PSNR = inf >= 40 dB, and the Spark-side plumbing (binary
column, Arrow batch decode, per-row invariants) is identical to what a real
JPEG/PNG decode UDF would use. A real-codec decode hook is stubbed behind
``decode_external`` with NotImplementedError, clearly marked.

Layout (little-endian):  b"RZ01" | uint16 w | uint16 h | uint8 channels |
                         zlib(raw pixels, uint8, row-major)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"RZ01"
_HDR = struct.Struct("<4sHHB")


def encode_rawz(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 array -> rawz bytes."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        c = 1
    else:
        h, w, c = a.shape
    return _HDR.pack(MAGIC, w, h, c) + zlib.compress(a.tobytes(), level=1)


def decode_rawz(buf: bytes) -> np.ndarray:
    magic, w, h, c = _HDR.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError("not a rawz payload")
    raw = zlib.decompress(bytes(buf[_HDR.size:]))
    a = np.frombuffer(raw, dtype=np.uint8)
    return a.reshape((h, w) if c == 1 else (h, w, c))


def decode_external(buf: bytes, fmt: str) -> np.ndarray:
    """STUB: real-codec decode (jpeg/png/webp). The container has no image
    libraries; route through this hook when they exist."""
    raise NotImplementedError(
        f"no external image codec available in this environment (fmt={fmt}); "
        "only 'rawz' decodes here"
    )


def decode(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "rawz":
        return decode_rawz(buf)
    return decode_external(buf, fmt)


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic grayscale image for row index i."""
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 7 + i * 13) % 251).astype(np.uint8)
