"""Point rasterization — per-pixel counts vs a NumPy histogram2d-style
brute force, pack_tiles consistency with the sparse relation, boundary
clamping, and weighted sums."""

from __future__ import annotations

import numpy as np

from osm2geojson_spark.operators.rasterize import (
    heatmap_tile_stats,
    pack_tiles,
    rasterize_points,
)


def _pts(seed, n=400):
    rng = np.random.default_rng(seed)
    return [
        (
            float(rng.uniform(-180, 180)),
            float(rng.uniform(-90, 90)),
            int(rng.integers(1, 10)),
        )
        for _ in range(n)
    ]


def _brute(pts, res, tile_px):
    n = (1 << res) * tile_px
    out = {}
    for lon, lat, w in pts:
        gx = min(max(int(np.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
        gy = min(max(int(np.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
        key = (gx // tile_px, gy // tile_px, gx % tile_px, gy % tile_px)
        c, ws = out.get(key, (0, 0))
        out[key] = (c + 1, ws + w)
    return out


def test_rasterize_matches_brute(spark):
    pts = _pts(3)
    df = spark.createDataFrame(pts, "lon double, lat double, w long")
    got = {
        (r["tile_x"], r["tile_y"], r["px"], r["py"]): (r["cnt"], r["wsum"])
        for r in rasterize_points(df, res=2, tile_px=8, weight_col="w").collect()
    }
    assert got == _brute(pts, 2, 8)


def test_rasterize_boundary_clamp(spark):
    # +180 / +90 / -180 / -90 land in edge pixels, never out of range
    df = spark.createDataFrame(
        [(180.0, 90.0), (-180.0, -90.0), (179.9999, -90.0)],
        "lon double, lat double",
    )
    rows = rasterize_points(df, res=1, tile_px=4).collect()
    n_tiles, npx = 2, 4
    for r in rows:
        assert 0 <= r["tile_x"] < n_tiles and 0 <= r["tile_y"] < n_tiles
        assert 0 <= r["px"] < npx and 0 <= r["py"] < npx
    assert sum(r["cnt"] for r in rows) == 3
    top = [r for r in rows if r["tile_x"] == 1 and r["tile_y"] == 1]
    assert any(r["px"] == 3 and r["py"] == 3 for r in top)


def test_stats_and_pack_consistent(spark):
    pts = _pts(5, n=600)
    df = spark.createDataFrame(pts, "lon double, lat double, w long")
    pc = rasterize_points(df, res=2, tile_px=8)
    stats = {
        (r["tile_x"], r["tile_y"]): (r["n_points"], r["n_px"], r["max_cnt"])
        for r in heatmap_tile_stats(pc, tile_px=8).collect()
    }
    packed = {
        (r["tile_x"], r["tile_y"]): np.asarray(r["pixels"]).reshape(8, 8)
        for r in pack_tiles(pc, tile_px=8).collect()
    }
    assert set(stats) == set(packed)
    for key, arr in packed.items():
        n_points, n_px, max_cnt = stats[key]
        assert arr.sum() == n_points
        assert (arr > 0).sum() == n_px
        assert arr.max() == max_cnt
    assert sum(s[0] for s in stats.values()) == len(pts)
