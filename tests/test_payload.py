"""Image payload invariants (E7) + multimodal plumbing + lineage/resume (E6)."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.functions import imagecodec
from osm2geojson_spark.operators.multimodal import (
    decode_stats,
    histogram_features,
    resize_images,
)
from osm2geojson_spark.plans.manifest import ParquetManifest, ResumableJob
from osm2geojson_spark.sources.synthetic import phash_lat, phash_lon, synthetic_images


def test_codec_roundtrip_bit_exact():
    px = imagecodec.synth_pixels(42, 64, 32)
    back = imagecodec.decode_rawz(imagecodec.encode_rawz(px))
    assert np.array_equal(px, back)
    assert imagecodec.psnr_db(px, back) == math.inf  # >= 40 dB requirement


def test_external_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        imagecodec.decode(b"\xff\xd8\xff", "jpeg")


def test_payload_table_invariants(spark):
    """input_hint schema + per-row invariant: decoded-pixel exactness
    (PSNR=inf >= 40 dB) and caption equality."""
    df = synthetic_images(spark, 30)
    assert [f.name for f in df.schema.fields][:7] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]
    for r in df.collect():
        i = int(r["image_id"].replace("img", ""))
        px = imagecodec.decode(bytes(r["bytes"]), r["fmt"])
        assert px.shape == (r["h"], r["w"])
        ref = imagecodec.synth_pixels(i, r["w"], r["h"])
        assert imagecodec.psnr_db(px, ref) == math.inf
        assert r["caption"] == f"caption for img{i}"


def test_phash_decodes_to_point_in_bbox(spark):
    bbox = (10.0, 20.0, 12.0, 22.0)
    df = synthetic_images(spark, 200, bbox=bbox, with_bytes=False)
    pts = df.select(
        phash_lon(F.col("phash")).alias("lon"), phash_lat(F.col("phash")).alias("lat")
    ).collect()
    eps = 2e-7  # quantization bin half-width (360 / 2^31)
    for r in pts:
        assert 10.0 - eps <= r["lon"] <= 12.0 + eps
        assert 20.0 - eps <= r["lat"] <= 22.0 + eps


def test_decode_stats_and_histogram(spark):
    imgs = synthetic_images(spark, 12)
    stats = decode_stats(imgs).collect()
    assert all(r["decode_ok"] for r in stats)
    r0 = next(r for r in stats if r["image_id"] == "img000000000000")
    px = imagecodec.synth_pixels(0, r0["w"], r0["h"]).astype(float)
    assert abs(r0["px_mean"] - round(float(px.mean()), 6)) < 1e-9
    hists = histogram_features(imgs).collect()
    for r in hists:
        assert len(r["hist"]) == 16
        assert abs(sum(r["hist"]) - 1.0) < 0.01


def test_resize(spark):
    imgs = synthetic_images(spark, 6)
    out = resize_images(imgs, 8, 8).collect()
    for r in out:
        px = imagecodec.decode_rawz(bytes(r["bytes"]))
        assert px.shape == (8, 8)


def test_resume_equivalence(spark, tmp_path):
    """E6: kill-and-restart == identical manifest/data (resume skips
    committed batches; metrics recorded per partition batch)."""
    root = str(tmp_path / "m1")
    man = ParquetManifest(root)
    job = ResumableJob(man)

    def make(bid: str):
        lo = int(bid) * 100
        return spark.range(lo, lo + 100).select(F.col("id"), (F.col("id") * 2).alias("v"))

    r1 = job.run(["0", "1"], make)
    assert r1["ran"] == ["0", "1"]
    # "restart": same work list plus new batch -> only the new one runs
    r2 = ResumableJob(ParquetManifest(root)).run(["0", "1", "2"], make)
    assert r2["skipped"] == ["0", "1"] and r2["ran"] == ["2"]
    total = spark.read.parquet(os.path.join(root, "data", "batch=*")).count()
    assert total == 300
    metrics = man.read_metrics()
    assert len(metrics) == 3
    assert all(m["rows_out"] == 100 and m["bytes_out"] > 0 for m in metrics)
