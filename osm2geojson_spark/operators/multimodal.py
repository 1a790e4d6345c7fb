"""Multimodal (image/audio/video) column operators.

Media travels as opaque ``binary`` columns with typed metadata (w, h, fmt) —
exactly the input_hint payload shape. All processing is Arrow-batched
``mapInPandas``: schema, partitioning, UDF signature and batch shaping are
production-real; only external codecs are stubbed (this container has no
image/audio libraries — see functions/imagecodec.decode_external), while the
'rawz' lossless codec path is fully implemented and tested.

Operators:
* decode_stats     — decode + per-image stats (mean/std/min/max)
* resize_images    — nearest-neighbor resize, re-encoded (rawz)
* histogram_features — 16-bin intensity histogram as array<double>
* dhash_features   — perceptual difference hash (64-bit), the image-dedup key
* frame_sample     — stub for video frame sampling (schema + plumbing only)

Arrow batch sizing note: callers tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` so bytes-batches stay
~64-128MB (SURVEY §4.2 #4).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import imagecodec


def decode_stats(images: DataFrame) -> DataFrame:
    """(image_id, w, h, px_sum, px_mean, px_std, px_min, px_max, decode_ok).

    ``px_sum``/``px_min``/``px_max`` are exact integers — the oracle-safe
    columns (no float rounding-mode ambiguity across engines)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = imagecodec.decode(bytes(r.bytes), r.fmt).astype(np.float64)
                    rows.append(
                        (
                            r.image_id,
                            int(r.w),
                            int(r.h),
                            int(px.sum()),
                            round(float(px.mean()), 6),
                            round(float(px.std()), 6),
                            int(px.min()),
                            int(px.max()),
                            True,
                        )
                    )
                except NotImplementedError:
                    rows.append(
                        (r.image_id, int(r.w), int(r.h), None, None, None, None, None, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "px_sum", "px_mean", "px_std",
                    "px_min", "px_max", "decode_ok",
                ],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn,
        schema=(
            "image_id string, w int, h int, px_sum long, px_mean double,"
            " px_std double, px_min long, px_max long, decode_ok boolean"
        ),
    )


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize; output re-encoded rawz."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for r in pdf.itertuples(index=False):
                px = imagecodec.decode(bytes(r.bytes), r.fmt)
                ys = (np.arange(out_h) * px.shape[0] // out_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(out_w) * px.shape[1] // out_w).clip(0, px.shape[1] - 1)
                ids.append(r.image_id)
                blobs.append(imagecodec.encode_rawz(px[np.ix_(ys, xs)]))
            yield pd.DataFrame(
                {"image_id": ids, "bytes": blobs, "w": out_w, "h": out_h, "fmt": "rawz"}
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        fn, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def histogram_features(images: DataFrame, bins: int = 16) -> DataFrame:
    """(image_id, hist array<double>) — normalized intensity histogram, the
    feature-extraction stage a training pipeline would feed to an encoder."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, bins + 1)
        for pdf in it:
            ids, hists = [], []
            for r in pdf.itertuples(index=False):
                px = imagecodec.decode(bytes(r.bytes), r.fmt)
                h, _ = np.histogram(px, bins=edges)
                hists.append((h / max(1, px.size)).round(6).tolist())
                ids.append(r.image_id)
            yield pd.DataFrame({"image_id": ids, "hist": hists})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        fn, schema="image_id string, hist array<double>"
    )


def dhash_features(images: DataFrame, hash_w: int = 8, hash_h: int = 8) -> DataFrame:
    """(image_id, dhash) — difference hash: nearest-neighbor sample to a
    (hash_h, hash_w+1) grid, take the horizontal gradient sign, pack the
    hash_w*hash_h bits row-major into an int64 (bit k = row*hash_w + col;
    bit 63 wraps to the sign, two's complement). Perceptually identical
    images collide; a hamming-ball join on the hash gives near-dup candidate
    pairs without comparing pixels. The sampling index map is the same
    floor(t*src/dst) map as resize_images, so dhash(resize(img)) ==
    dhash(img) for integer downscales."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.uint64(1) << np.arange(hash_w * hash_h, dtype=np.uint64)
        for pdf in it:
            ids, hashes = [], []
            for r in pdf.itertuples(index=False):
                px = imagecodec.decode(bytes(r.bytes), r.fmt)
                ys = (np.arange(hash_h) * px.shape[0] // hash_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(hash_w + 1) * px.shape[1] // (hash_w + 1)).clip(
                    0, px.shape[1] - 1
                )
                g = px[np.ix_(ys, xs)]
                bits = (g[:, 1:] > g[:, :-1]).ravel()
                val = np.bitwise_or.reduce(np.where(bits, weights, np.uint64(0)))
                hashes.append(int(np.uint64(val).astype(np.int64)))
                ids.append(r.image_id)
            yield pd.DataFrame({"image_id": ids, "dhash": pd.array(hashes, dtype="int64")})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        fn, schema="image_id string, dhash long"
    )


def frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling. The plumbing (schema, batch iteration) is
    real; the codec hook raises NotImplementedError in this container."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for r in pdf.itertuples(index=False):
                imagecodec.decode_external(bytes(r.bytes), getattr(r, "fmt", "h264"))
            yield pd.DataFrame({"video_id": [], "frame_idx": [], "bytes": []})

    return videos.mapInPandas(fn, schema="video_id string, frame_idx int, bytes binary")
