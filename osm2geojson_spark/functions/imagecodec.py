"""Deterministic image codecs + payload invariants (E7).

Two lossless codecs, both pure stdlib (no Pillow/libjpeg in this container):

* "rawz" — the engine's trivial container (zlib-compressed raw pixels):
  b"RZ01" | uint16 w | uint16 h | uint8 channels | zlib(raw, row-major).
* "png"  — REAL PNG (signature, IHDR/IDAT/IEND + CRC32, the five scanline
  filter types) implemented on stdlib zlib; 8-bit gray / gray+alpha / RGB /
  RGBA / palette, non-interlaced. decode(encode(x)) is bit-exact for both,
  so PSNR = inf >= 40 dB.

The Spark-side plumbing (binary column, Arrow batch decode, per-row
invariants) is identical to what a libjpeg-backed UDF would use; lossy
codecs (jpeg/webp) remain stubbed behind ``decode_external``.
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


# ------------------------------------------------------------------- PNG
#
# Pure-stdlib PNG codec (SURVEY §2.3 E7's "raw/zlib-PNG via stdlib zlib"):
# the wire format is real PNG — signature, IHDR/IDAT/IEND chunks, CRC32,
# zlib-compressed scanlines with the five standard filter types
# (None/Sub/Up/Average/Paeth, RFC 2083 §6). Supported: 8-bit depth, color
# types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
# non-interlaced. Adam7 interlace and 16-bit depth raise ValueError.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(row: np.ndarray, prev: np.ndarray, bpp: int) -> tuple[int, bytes]:
    """Pick the cheapest of filters 0/1/2 (minimum-sum-of-absolutes
    heuristic) and return (filter_type, filtered_bytes)."""
    r = row.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp] if bpp else 0
    cands = {
        0: r,
        1: (r - left) & 0xFF,
        2: (r - prev.astype(np.int16)) & 0xFF,
    }
    best = min(
        cands, key=lambda t: int(np.minimum(cands[t] & 0xFF, 256 - (cands[t] & 0xFF)).sum())
    )
    return best, cands[best].astype(np.uint8).tobytes()


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) gray, (h, w, 2) gray+alpha, (h, w, 3) RGB or (h, w, 4) RGBA
    uint8 array -> PNG bytes (8-bit, per-row adaptive 0/1/2 filtering)."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        h, w, c = a.shape[0], a.shape[1], 1
        ctype = 0
    else:
        h, w, c = a.shape
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = a.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    lines = []
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        ft, data = _filter_row(flat[y], prev, c)
        lines.append(bytes([ft]) + data)
        prev = flat[y]
    idat = zlib.compress(b"".join(lines), level=6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering -> (h, stride) uint8 matrix.

    Filters 0/2 are whole-row vectorized; 1 (Sub) is a per-channel modular
    prefix sum; 3/4 carry a true sequential dependence along x (each byte
    needs the already-reconstructed left neighbor), so they run as an int
    loop — our own encoder emits only 0/1/2, this path decodes foreign
    files."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        if ft == 0:
            rec = row
        elif ft == 1:
            rec = row.reshape(-1, bpp).cumsum(axis=0).reshape(-1) & 0xFF
        elif ft == 2:
            rec = (row + prev) & 0xFF
        elif ft == 3:
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) or (h, w, c) uint8 array."""
    if bytes(buf[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    ctype = None
    idat = []
    palette = None
    n = len(buf)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = bytes(buf[pos + 4 : pos + 8])
        data = bytes(buf[pos + 8 : pos + 8 + length])
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if interlace:
                raise ValueError("Adam7 interlacing not supported")
            if comp or filt:
                raise ValueError("bad PNG compression/filter method")
        elif tag == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    c = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    mat = _unfilter(raw, h, stride, c)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        return palette[mat.reshape(h, w)]
    return mat.reshape((h, w) if c == 1 else (h, w, c))


def decode_external(buf: bytes, fmt: str) -> np.ndarray:
    """STUB: lossy-codec decode (jpeg/webp). The container has no image
    libraries; route through this hook when they exist. PNG no longer goes
    through here — the stdlib codec above handles it."""
    raise NotImplementedError(
        f"no external image codec available in this environment (fmt={fmt}); "
        "'rawz' and 'png' decode here"
    )


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "rawz":
        return encode_rawz(pixels)
    if fmt == "png":
        return encode_png(pixels)
    raise NotImplementedError(f"no encoder for fmt={fmt}")


def decode(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "rawz":
        return decode_rawz(buf)
    if fmt == "png":
        return decode_png(buf)
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
