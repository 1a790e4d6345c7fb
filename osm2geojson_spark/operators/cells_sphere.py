"""Spherical cube-face cell index (S2-style) — polar-distortion-free cells.

The flat E1 grid (operators/cells.py) is an equirectangular 2^r x 2^r grid:
ideal for oracle-exact integer math, but its cells shrink by cos(lat) and
degenerate at the poles (kNN there must escalate to brute force). This
module adds the standard spherical alternative — the S2-STYLE cube-face
construction (public algorithm; not bit-compatible with Google S2's id
layout, which is not required here):

1. (lon, lat) -> unit sphere xyz;
2. face = axis with the largest |component| (6 faces);
3. gnomonic projection onto the face plane: (u, v) in [-1, 1]^2;
4. the S2 quadratic area-equalizing transform uv -> st in [0, 1]^2
   (s = sqrt(1+3u)... in its piecewise-rational form below), which bounds
   the max/min cell-area ratio at ~2.1 over the WHOLE sphere — vs unbounded
   for the equirectangular grid;
5. (i, j) = floor(st * 2^r); id = face<<56 | res<<50 | i<<25 | j.

Encode/parent/parts are Spark column expressions (JVM, whole-stage
codegen — the scan/join hot path) with an ANSI-SQL twin for the DuckDB
oracle. The composite ops (cell center, k_ring) chain the projection both
ways, which as Column trees explodes multiplicatively (every reference
inlines its subtree) — they run as vectorized NumPy over Arrow batches
instead, like hilbert_key in cells.py. Neighbors cross faces WITHOUT edge
tables: a neighbor offset that leaves the face is resolved by unprojecting
the out-of-range (face, s, t) back through the gnomonic frame to a sphere
point — the formula remains valid for |u| > 1, landing on the adjacent
face — and re-encoding. That keeps k_ring correct across edges AND
corners.

The flat grid stays the engine default (its integer math is oracle-exact
and antimeridian-wrapped); use these cells for polar-heavy corpora and
uniform-area rollups. Both indexes share the same operator surfaces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

RES_MIN, RES_MAX = 0, 25
DEFAULT_RES = 9

_J_BITS = 25
_I_SHIFT = _J_BITS
_R_SHIFT = 2 * _J_BITS
_F_SHIFT = 2 * _J_BITS + 6


def _xyz(lon: Column, lat: Column) -> tuple[Column, Column, Column]:
    rl, rp = F.radians(lon), F.radians(lat)
    return (
        F.cos(rp) * F.cos(rl),
        F.cos(rp) * F.sin(rl),
        F.sin(rp),
    )


def _face_frame(
    x: Column, y: Column, z: Column
) -> tuple[Column, Column, Column]:
    """(face, u, v) from sphere xyz.

    face: 0:+x 1:+y 2:+z 3:-x 4:-y 5:-z (largest-|component| axis; ties
    break in that order — same rule in the SQL twin).

    Frame per face (u, v) = the two non-axis coordinates divided by the
    SIGNED axis on positive faces and negated on negative ones — which for
    every face equals numerator / |axis|, so u and v never need the face
    id inside them (Catalyst column expressions inline every reference;
    keeping ``face`` out of u/v is what keeps the tree small):
    f0(+x): (y, z)/|x|   f3(-x): (y, z)/|x|
    f1(+y): (x, z)/|y|   f4(-y): (x, z)/|y|
    f2(+z): (x, y)/|z|   f5(-z): (x, y)/|z|
    — the exact inverse of ``_unproject_lonlat``'s point table."""
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    xdom = (ax >= ay) & (ax >= az)
    ydom = (~xdom) & (ay >= az)
    face = (
        F.when(xdom, F.when(x >= 0, 0).otherwise(3))
        .when(ydom, F.when(y >= 0, 1).otherwise(4))
        .otherwise(F.when(z >= 0, 2).otherwise(5))
    )
    d = F.when(xdom, ax).when(ydom, ay).otherwise(az)
    u = F.when(xdom, y).when(ydom, x).otherwise(x) / d
    v = F.when(xdom, z).when(ydom, z).otherwise(y) / d
    return face, u, v


def _st_from_uv(u: Column) -> Column:
    """S2 quadratic transform: u in [-1,1] -> s in [0,1], area-equalizing."""
    return F.when(u >= 0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * u)).otherwise(
        F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * u)
    )


def sphere_cell_id(lon: Column, lat: Column, res: int = DEFAULT_RES) -> Column:
    """Point -> spherical cell id at resolution ``res`` (pure column math)."""
    n = 1 << res
    x, y, z = _xyz(lon, lat)
    f, u, v = _face_frame(x, y, z)
    s, t = _st_from_uv(u), _st_from_uv(v)
    i = F.greatest(F.lit(0), F.least(F.lit(n - 1), F.floor(s * n))).cast("long")
    j = F.greatest(F.lit(0), F.least(F.lit(n - 1), F.floor(t * n))).cast("long")
    return (
        f.cast("long") * F.lit(1 << _F_SHIFT)
        + F.lit(res).cast("long") * F.lit(1 << _R_SHIFT)
        + i * F.lit(1 << _I_SHIFT)
        + j
    )


def sphere_cell_parts(cell: Column) -> tuple[Column, Column, Column]:
    """(face, i, j) of a cell id."""
    f = F.shiftright(cell, _F_SHIFT)
    i = F.shiftright(cell, _I_SHIFT) % F.lit(1 << _J_BITS)
    j = cell % F.lit(1 << _J_BITS)
    return f, i, j


def sphere_parent(cell: Column, child_res: int, parent_res: int) -> Column:
    assert parent_res <= child_res
    shift = child_res - parent_res
    f, i, j = sphere_cell_parts(cell)
    return (
        f * F.lit(1 << _F_SHIFT)
        + F.lit(parent_res).cast("long") * F.lit(1 << _R_SHIFT)
        + F.shiftright(i, shift) * F.lit(1 << _I_SHIFT)
        + F.shiftright(j, shift)
    )


# ---------------------------------------------------------------- numpy twins
#
# The composite operations (cell -> center, k-ring across faces) CHAIN the
# projection both ways; as Column expressions every reference inlines its
# whole subtree and the composition explodes multiplicatively (the same
# reason hilbert_key in cells.py is an Arrow UDF). Encode/parent above stay
# pure column math — they are the scan/join hot path; center and k_ring run
# as vectorized NumPy over Arrow batches.


def _np_st_from_uv(u: np.ndarray) -> np.ndarray:
    return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _np_uv_from_st(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0
    )


def _np_encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    n = 1 << res
    rl, rp = np.radians(lon), np.radians(lat)
    x = np.cos(rp) * np.cos(rl)
    y = np.cos(rp) * np.sin(rl)
    z = np.sin(rp)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    xdom = (ax >= ay) & (ax >= az)
    ydom = (~xdom) & (ay >= az)
    zdom = ~(xdom | ydom)
    face = np.select(
        [xdom & (x >= 0), xdom, ydom & (y >= 0), ydom, zdom & (z >= 0)],
        [0, 3, 1, 4, 2],
        5,
    ).astype(np.int64)
    d = np.select([xdom, ydom], [ax, ay], az)
    u = np.select([xdom], [y], x) / d
    v = np.select([xdom | ydom], [z], y) / d
    i = np.clip(np.floor(_np_st_from_uv(u) * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(_np_st_from_uv(v) * n), 0, n - 1).astype(np.int64)
    return (
        face * np.int64(1 << _F_SHIFT)
        + np.int64(res) * np.int64(1 << _R_SHIFT)
        + i * np.int64(1 << _I_SHIFT)
        + j
    )


def _np_unproject(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """(face, u, v) -> (lon, lat) degrees; valid beyond |u|,|v| = 1 (the
    gnomonic ray lands on the adjacent face after normalization)."""
    one = np.ones_like(u)
    x = np.select([face == 0, face == 3], [one, -one], u)
    y = np.select([face == 0, face == 3, face == 1, face == 4], [u, u, one, -one], v)
    z = np.select([face == 2, face == 5], [one, -one], v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


def _np_center(cells: np.ndarray, res: int):
    n = float(1 << res)
    f = cells >> _F_SHIFT
    i = (cells >> _I_SHIFT) & ((1 << _J_BITS) - 1)
    j = cells & ((1 << _J_BITS) - 1)
    u = _np_uv_from_st((i.astype(np.float64) + 0.5) / n)
    v = _np_uv_from_st((j.astype(np.float64) + 0.5) / n)
    return _np_unproject(f, u, v)


def sphere_cell_center(cell: Column, res: int) -> tuple[Column, Column]:
    """(lon, lat) Columns of the cell center (vectorized Arrow UDF)."""
    out_t = T.StructType(
        [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
    )

    @pandas_udf(out_t)
    def _center(cells_s):
        c = cells_s.to_numpy(dtype=np.int64)
        lon, lat = _np_center(c, res)
        return pd.DataFrame({"lon": lon, "lat": lat})

    st = _center(cell)
    return st.getField("lon"), st.getField("lat")


def sphere_k_ring(cell: Column, res: int, k: int = 1) -> Column:
    """array<long> of cells within Chebyshev distance k in the st-grid,
    CORRECT ACROSS FACE EDGES AND CORNERS: each offset's would-be center is
    unprojected through the gnomonic frame (valid beyond the face) and
    re-encoded, then duplicates removed. Vectorized across the Arrow batch:
    one (batch x (2k+1)^2) NumPy pass."""
    n = float(1 << res)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _ring(cells_s):
        c = cells_s.to_numpy(dtype=np.int64)
        f = c >> _F_SHIFT
        i = (c >> _I_SHIFT) & ((1 << _J_BITS) - 1)
        j = c & ((1 << _J_BITS) - 1)
        cols = []
        for di in range(-k, k + 1):
            for dj in range(-k, k + 1):
                s = (i.astype(np.float64) + di + 0.5) / n
                t = (j.astype(np.float64) + dj + 0.5) / n
                lon, lat = _np_unproject(f, _np_uv_from_st(s), _np_uv_from_st(t))
                cols.append(_np_encode(lon, lat, res))
        mat = np.stack(cols, axis=1)  # (batch, (2k+1)^2)
        return pd.Series([np.unique(row) for row in mat])

    return _ring(cell)


def sphere_cell_id_sql(lon_expr: str, lat_expr: str, res: int = DEFAULT_RES) -> str:
    """The identical encoding as an ANSI-SQL snippet (DuckDB oracle twin)."""
    n = 1 << res
    x = f"(cos(radians({lat_expr})) * cos(radians({lon_expr})))"
    y = f"(cos(radians({lat_expr})) * sin(radians({lon_expr})))"
    z = f"sin(radians({lat_expr}))"
    face = (
        f"(CASE WHEN abs({x}) >= abs({y}) AND abs({x}) >= abs({z}) THEN "
        f"(CASE WHEN {x} >= 0 THEN 0 ELSE 3 END) "
        f"WHEN abs({y}) >= abs({z}) THEN (CASE WHEN {y} >= 0 THEN 1 ELSE 4 END) "
        f"ELSE (CASE WHEN {z} >= 0 THEN 2 ELSE 5 END) END)"
    )
    xdom = f"(abs({x}) >= abs({y}) AND abs({x}) >= abs({z}))"
    ydom = f"(NOT {xdom} AND abs({y}) >= abs({z}))"
    d = f"(CASE WHEN {xdom} THEN abs({x}) WHEN {ydom} THEN abs({y}) ELSE abs({z}) END)"
    u = f"((CASE WHEN {xdom} THEN {y} WHEN {ydom} THEN {x} ELSE {x} END) / {d})"
    v = f"((CASE WHEN {xdom} THEN {z} WHEN {ydom} THEN {z} ELSE {y} END) / {d})"

    def st(uu):
        return (
            f"(CASE WHEN {uu} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * ({uu})) "
            f"ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * ({uu})) END)"
        )

    i = f"greatest(0, least({n - 1}, CAST(floor({st(u)} * {n}) AS BIGINT)))"
    j = f"greatest(0, least({n - 1}, CAST(floor({st(v)} * {n}) AS BIGINT)))"
    return (
        f"(CAST({face} AS BIGINT) * {1 << _F_SHIFT} + "
        f"CAST({res} AS BIGINT) * {1 << _R_SHIFT} + "
        f"({i}) * {1 << _I_SHIFT} + ({j}))"
    )
