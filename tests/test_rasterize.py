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


def test_decayed_heatmap_weights_and_gates(spark):
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.rasterize import decayed_heatmap

    T = 1_700_000_000
    bin_s, max_age = 3600, 15
    # cell A (lon 0.5): ages 0 (exactly t_end), 1, 2 -> 2^15 + 2^14 + 2^13
    # cell B (lon 10.5): single event at the oldest admissible age -> 1
    # dropped: 1us in the future; one bin past the window
    rows = [
        (0.5, T * 1_000_000),
        (0.5, (T - bin_s) * 1_000_000 - 1),       # age 1 (1us into bin 1)
        (0.5, (T - 2 * bin_s) * 1_000_000),       # age 2 boundary -> age 2
        (10.5, (T - max_age * bin_s) * 1_000_000),  # age 15 -> weight 1
        (20.5, T * 1_000_000 + 1),                # future: dropped
        (20.5, (T - (max_age + 1) * bin_s) * 1_000_000),  # too old: dropped
    ]
    df = spark.createDataFrame(rows, "lon double, t_us long").select(
        "lon", F.lit(0.5).alias("lat"), F.expr("timestamp_micros(t_us)").alias("ts")
    )
    out = decayed_heatmap(df, res=6, t_end_s=T, bin_s=bin_s, max_age_bins=max_age)
    got = {
        r["cell_id"]: (r["heat"], r["n_events"], r["newest_age"])
        for r in out.collect()
    }
    from osm2geojson_spark.operators import cells

    def cid(lon):
        return spark.range(1).select(
            cells.cell_id(F.lit(lon), F.lit(0.5), 6).alias("c")
        ).collect()[0]["c"]

    assert got == {
        cid(0.5): ((1 << 15) + (1 << 14) + (1 << 13), 3, 0),
        cid(10.5): (1, 1, 15),
    }


def test_decayed_heatmap_age_boundary_is_floor(spark):
    """An event EXACTLY on a bin boundary belongs to the older bin index
    computed by floor((t_end - ts)/bin) — and an event 1us in the future
    must not sneak into age 0 via truncating division."""
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.rasterize import decayed_heatmap

    T, bin_s = 1_700_000_000, 60
    rows = [(0.5, T * 1_000_000 - 1), (0.5, T * 1_000_000 + 999_999)]
    df = spark.createDataFrame(rows, "lon double, t_us long").select(
        "lon", F.lit(0.5).alias("lat"), F.expr("timestamp_micros(t_us)").alias("ts")
    )
    out = decayed_heatmap(df, res=6, t_end_s=T, bin_s=bin_s, max_age_bins=3).collect()
    assert len(out) == 1
    assert (out[0]["heat"], out[0]["n_events"], out[0]["newest_age"]) == (8, 1, 0)
