"""Point rasterization — datashader-style heatmap tiles from point sets.

The inverse of multimodal.polygonize/vectorize (raster -> vector): bin
10^12 points into fixed tiles of tile_px x tile_px pixels on the engine's
equirectangular cell grid (operators/cells.py — the tile IS the cell at
``res``), producing either a sparse per-pixel count relation or packed
per-tile pixel arrays ready for the image layer (imagecodec PNG encode,
tile_pyramid rollups).

Everything up to the packed array is pure column arithmetic: one floor
per axis maps a point to its global pixel, integer div/mod split it into
(tile, in-tile pixel), and ONE map-side-combinable groupBy produces the
counts — a scan-shaped plan whose only shuffle carries (tile, px, py)
triples, never coordinates. Counts are exact integers, so the relation
is order-independent and oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import pandas as pd

from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from . import cells


def _axis_pixel(coord: Column, lo: float, span: float, n_px: int) -> Column:
    """Global pixel index along one axis, clamped into [0, n_px-1] so the
    +180/+90 boundary lands in the last pixel row instead of overflowing."""
    raw = F.floor((coord - F.lit(lo)) / F.lit(span) * F.lit(float(n_px)))
    return F.greatest(F.lit(0), F.least(F.lit(n_px - 1), raw)).cast("long")


def axis_pixel_sql(coord: str, lo: float, span: float, n_px: int) -> str:
    """DuckDB twin of _axis_pixel."""
    raw = f"floor((({coord}) - {lo}) / {span} * {float(n_px)})"
    return f"CAST(greatest(0, least({n_px - 1}, {raw})) AS BIGINT)"


def pixel_columns(
    lon: Column, lat: Column, res: int, tile_px: int
) -> tuple[Column, Column, Column, Column]:
    """(tile_x, tile_y, px, py) columns for a point on the res-level tile
    grid with tile_px-pixel tiles — the shared pixel algebra for the batch
    rasterizer and the streaming heatmap (identical binning by
    construction)."""
    n = (1 << res) * tile_px
    gx = _axis_pixel(lon, -180.0, 360.0, n)
    gy = _axis_pixel(lat, -90.0, 180.0, n)
    return (
        F.floor(gx / F.lit(tile_px)).cast("long"),
        F.floor(gy / F.lit(tile_px)).cast("long"),
        gx % F.lit(tile_px),
        gy % F.lit(tile_px),
    )


def rasterize_points(
    points: DataFrame,
    res: int,
    tile_px: int = 16,
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: str | None = None,
) -> DataFrame:
    """Sparse per-pixel histogram: (tile_x, tile_y, px, py, cnt[, wsum])
    — one row per NON-EMPTY pixel of the res-level tile grid, cnt the
    exact point count (and wsum the exact integer weight sum if
    ``weight_col`` is given).

    The tile grid matches cells.py (2^res x 2^res tiles covering the
    world bbox); each tile is tile_px x tile_px pixels. Sparse output is
    the scale-correct representation: a 10^12-point corpus touches a
    vanishing fraction of the 2^(2*res)*tile_px^2 pixel universe, and
    downstream dense consumers pack on demand (``pack_tiles``)."""
    tx, ty, px, py = pixel_columns(
        F.col(lon_col), F.col(lat_col), res, tile_px
    )
    binned = points.select(
        tx.alias("tile_x"),
        ty.alias("tile_y"),
        px.alias("px"),
        py.alias("py"),
        *(
            [F.col(weight_col).cast("long").alias("_w")]
            if weight_col
            else []
        ),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("cnt")]
    if weight_col:
        aggs.append(F.sum("_w").cast("long").alias("wsum"))
    return binned.groupBy("tile_x", "tile_y", "px", "py").agg(*aggs)


def heatmap_tile_stats(pixel_counts: DataFrame, tile_px: int = 16) -> DataFrame:
    """Per-tile rollup of a rasterize_points relation: (tile_x, tile_y,
    n_points, n_px, max_cnt, checksum) — checksum = sum((px*tile_px+py+1)
    * cnt) pins every pixel's position AND count in one exact int64, so
    an oracle hash covers the full raster without shipping arrays."""
    pos = (F.col("px") * F.lit(tile_px) + F.col("py") + F.lit(1)).cast("long")
    return pixel_counts.groupBy("tile_x", "tile_y").agg(
        F.sum("cnt").cast("long").alias("n_points"),
        F.count(F.lit(1)).cast("long").alias("n_px"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.sum(pos * F.col("cnt")).cast("long").alias("checksum"),
    )


def pack_tiles(
    pixel_counts: DataFrame, tile_px: int = 16, log_scale: bool = False
) -> DataFrame:
    """Dense per-tile pixel arrays: (tile_x, tile_y, pixels) with
    ``pixels`` a row-major array<long> of length tile_px*tile_px — the
    hand-off format to the image layer (uint8-clip + imagecodec.png for
    servable heatmap tiles; multimodal.tile_pyramid for coarser zooms).

    Grouped applyInPandas, one Arrow batch per tile: the dense array
    materializes only per non-empty tile, never as a global raster."""
    schema = StructType(
        [
            StructField("tile_x", LongType()),
            StructField("tile_y", LongType()),
            StructField("pixels", ArrayType(LongType())),
        ]
    )
    npx = tile_px

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out = np.zeros(npx * npx, dtype=np.int64)
        idx = pdf["px"].to_numpy(np.int64) * npx + pdf["py"].to_numpy(np.int64)
        np.add.at(out, idx, pdf["cnt"].to_numpy(np.int64))
        if log_scale:
            out = np.log1p(out).astype(np.int64)
        return pd.DataFrame(
            {
                "tile_x": [int(pdf["tile_x"].iloc[0])],
                "tile_y": [int(pdf["tile_y"].iloc[0])],
                "pixels": [out.tolist()],
            }
        )

    return pixel_counts.groupBy("tile_x", "tile_y").applyInPandas(kernel, schema)


def decayed_heatmap(
    events: DataFrame,
    res: int,
    t_end_s: int,
    bin_s: int,
    max_age_bins: int = 15,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
) -> DataFrame:
    """TIME-DECAYED HEATMAP — per-cell recency-weighted event heat: each
    event contributes 2^(max_age_bins - age) where age = floor((t_end -
    ts) / bin_s), i.e. exponential decay with half-life ``bin_s``,
    renormalized so the OLDEST admissible bin has weight 1 and the newest
    has 2^max_age_bins. The "what's hot right now" surface every live map
    / trending-places layer computes; power-of-two weights keep the whole
    statistic exact int64 (float decay powers would hash differently per
    summation order), and dividing the published heat by 2^max_age_bins
    recovers the conventional [0, 1]-decay scale losslessly.

    Events newer than ``t_end_s`` (age < 0) or older than the window
    (age > ``max_age_bins``) are dropped. Returns (cell_id, heat,
    n_events, newest_age) with newest_age the smallest contributing age
    bin — heat is bounded by n_events * 2^max_age_bins (< 2^63 for any
    real corpus with max_age_bins <= ~40).

    Scale: scan -> filter -> combiner-friendly rollup keyed by cell —
    cell_histogram-shaped, no windows, no join. In streaming this is the
    batch twin of a sliding-window aggregation: the decay re-weights on
    read (t_end advances), so the stored state is just (cell, age-bin)
    partial sums."""
    t_end_us = t_end_s * 1_000_000
    bin_us = bin_s * 1_000_000
    # exact FLOOR division via pmod: with truncating div an event 1us in
    # the FUTURE would land in age 0 and survive the age >= 0 gate
    dt = f"({t_end_us} - unix_micros(CAST({ts_col} AS TIMESTAMP)))"
    age = F.expr(f"({dt} - pmod({dt}, {bin_us})) div {bin_us}")
    w = F.expr(f"shiftleft(1L, CAST({max_age_bins} - _age AS INT))")
    return (
        events.select(
            cells.cell_id(F.col(lon_col), F.col(lat_col), res).alias("cell_id"),
            age.alias("_age"),
        )
        .filter((F.col("_age") >= 0) & (F.col("_age") <= max_age_bins))
        .select("cell_id", "_age", w.alias("_w"))
        .groupBy("cell_id")
        .agg(
            F.sum("_w").cast("long").alias("heat"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("_age").cast("long").alias("newest_age"),
        )
    )
