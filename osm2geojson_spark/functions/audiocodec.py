"""Audio payload codec — lossless 'pcmz' (zlib-compressed little-endian
int16 PCM), the audio twin of imagecodec's 'rawz'.

Same design stance as the image layer (SURVEY §2.3 E7): media travels as
opaque binary columns with typed metadata; the container has no external
audio libraries, so compressed wire formats (mp3/aac/flac/opus) are
stubbed behind ``decode_external`` with real plumbing around them, while
the lossless path is fully implemented — pure numpy + zlib, nothing to
mock. Mirrors reference issue: the reference engine (aspectumapp/
osm2geojson) has no media layer at all; this exists for the multimodal
training-pipeline brief.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"PCZ1"


def encode_pcm16(samples: np.ndarray, rate_hz: int = 16000) -> bytes:
    """int16 mono samples -> lossless pcmz bytes."""
    s = np.ascontiguousarray(samples.astype("<i2"))
    head = _MAGIC + struct.pack("<II", len(s), rate_hz)
    return head + zlib.compress(s.tobytes(), 6)


def decode_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """pcmz bytes -> (int16 samples, rate_hz)."""
    if buf[:4] != _MAGIC:
        raise ValueError("not a pcmz payload")
    n, rate = struct.unpack("<II", buf[4:12])
    raw = zlib.decompress(buf[12:])
    s = np.frombuffer(raw, dtype="<i2")
    if len(s) != n:
        raise ValueError("pcmz length mismatch")
    return s.astype(np.int16), int(rate)


def decode(buf: bytes, fmt: str) -> tuple[np.ndarray, int]:
    if fmt == "pcmz":
        return decode_pcm16(bytes(buf))
    return decode_external(buf, fmt)


def decode_external(buf: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """Compressed audio formats need a codec library this container does
    not ship. The Spark-side plumbing (schema, batching, stats kernels)
    is format-agnostic — plug a real decoder in here."""
    raise NotImplementedError(
        f"audio format {fmt!r} requires an external codec (none available "
        "offline); supported here: 'pcmz'"
    )


def synth_samples(i: int, n: int) -> np.ndarray:
    """Deterministic synthetic int16 waveform for row index i (the audio
    analogue of imagecodec.synth_pixels): full-range pseudo-noise both
    engines can replay in closed form."""
    t = np.arange(n, dtype=np.int64)
    return (((t * 7919 + i * 104729) % 65536) - 32768).astype(np.int16)
