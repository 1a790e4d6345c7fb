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
    # np.where evaluates both branches; |u| > 1/3 makes the unselected
    # branch's sqrt argument negative — expected, silence it
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


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
        # whole-matrix sorted-axis dedup (no per-row numpy calls): sort each
        # row, keep first-of-run entries, then slice the flattened survivors
        mat.sort(axis=1)
        keep = np.ones(mat.shape, dtype=bool)
        keep[:, 1:] = mat[:, 1:] != mat[:, :-1]
        flat = mat[keep]
        bounds = np.concatenate(([0], np.cumsum(keep.sum(axis=1))))
        return pd.Series(
            [flat[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
        )

    return _ring(cell)


# ------------------------------------------------------------------ covering
#
# Polygon/bbox -> covering cell set on the SPHERE grid (the round-2 gap: the
# flat grid had covering_cells, the sphere grid only points/k-ring). The
# covering must be a PROVABLE superset of every cell that intersects the
# query region — a missed cell is a wrong join answer, not a slow one — so
# everything below is built on one conservative primitive:
#
#   cell_lonlat_boxes(f, res, i, j) — lon/lat box(es) that provably contain
#   the cell. Cell edges are great-circle arcs (u=const / v=const are planes
#   through the origin), so the boundary is sampled along each edge and
#   padded by HALF THE LARGEST INTER-SAMPLE ARC: every boundary point lies
#   within max_gap/2 of some sample, and a pole-free region's lat/lon
#   extrema lie on its boundary (lat/lon have no interior critical points
#   away from the poles). Pole-containing and antimeridian-wrapping cells
#   are flagged `clean=False` — callers that reason in planar lon/lat space
#   (PIP classification) must route those to the exact-refine path.

_EDGE_SAMPLES = 17


def sphere_pack_py(f: int, res: int, i: int, j: int) -> int:
    return (f << _F_SHIFT) + (res << _R_SHIFT) + (i << _I_SHIFT) + j


def sphere_parts_py(cell: int) -> tuple[int, int, int, int]:
    """(face, res, i, j)."""
    return (
        cell >> _F_SHIFT,
        (cell >> _R_SHIFT) & 0x3F,
        (cell >> _I_SHIFT) & ((1 << _J_BITS) - 1),
        cell & ((1 << _J_BITS) - 1),
    )


def sphere_cell_id_py(lon: float, lat: float, res: int) -> int:
    """Scalar encode (driver-side twin of sphere_cell_id)."""
    return int(_np_encode(np.asarray([lon]), np.asarray([lat]), res)[0])


def cell_lonlat_boxes(f: int, res: int, i: int, j: int):
    """Conservative lon/lat bounding box(es) of a sphere cell.

    Returns ``(boxes, clean)``: ``boxes`` is a list of
    (lon0, lat0, lon1, lat1) whose union provably contains the cell;
    ``clean`` is False when the cell touches a pole or wraps the
    antimeridian (its planar lon/lat representation is disconnected /
    degenerate, so planar containment reasoning is invalid for it)."""
    n = float(1 << res)
    g = np.linspace(i / n, (i + 1) / n, _EDGE_SAMPLES)
    h = np.linspace(j / n, (j + 1) / n, _EDGE_SAMPLES)
    lo_i, hi_i = np.full(_EDGE_SAMPLES, i / n), np.full(_EDGE_SAMPLES, (i + 1) / n)
    lo_j, hi_j = np.full(_EDGE_SAMPLES, j / n), np.full(_EDGE_SAMPLES, (j + 1) / n)
    # 4 edges, each sampled in order (gap measurement needs edge-consecutive)
    s = np.concatenate([g, g, lo_i, hi_i])
    t = np.concatenate([lo_j, hi_j, h, h])
    u, v = _np_uv_from_st(s), _np_uv_from_st(t)
    fa = np.full(s.shape, f, dtype=np.int64)
    one = np.ones_like(u)
    x = np.select([fa == 0, fa == 3], [one, -one], u)
    y = np.select([fa == 0, fa == 3, fa == 1, fa == 4], [u, u, one, -one], v)
    z = np.select([fa == 2, fa == 5], [one, -one], v)
    nrm = np.sqrt(x * x + y * y + z * z)
    x, y, z = x / nrm, y / nrm, z / nrm
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))

    # half the max consecutive-sample arc per edge = provable boundary pad
    e = _EDGE_SAMPLES
    max_cos = 1.0
    for k in range(4):
        sl = slice(k * e, (k + 1) * e)
        dots = x[sl][:-1] * x[sl][1:] + y[sl][:-1] * y[sl][1:] + z[sl][:-1] * z[sl][1:]
        max_cos = min(max_cos, float(dots.min()))
    pad = 0.5 * float(np.degrees(np.arccos(np.clip(max_cos, -1.0, 1.0)))) + 1e-12

    # pole containment: only the z faces can contain a pole — uv (0,0)
    if f in (2, 5):
        u0, u1 = _np_uv_from_st(np.array([i / n, (i + 1) / n]))
        v0, v1 = _np_uv_from_st(np.array([j / n, (j + 1) / n]))
        if u0 <= 0.0 <= u1 and v0 <= 0.0 <= v1:
            lat0 = float(lat.min()) - pad
            if f == 2:
                return [(-180.0, max(-90.0, lat0), 180.0, 90.0)], False
            lat1 = float(lat.max()) + pad
            return [(-180.0, -90.0, 180.0, min(90.0, lat1))], False

    lat0 = max(-90.0, float(lat.min()) - pad)
    lat1 = min(90.0, float(lat.max()) + pad)
    max_abs_lat = max(abs(lat0), abs(lat1))
    if max_abs_lat >= 89.9:
        # close enough to a pole that the lon pad diverges — full lon range
        return [(-180.0, lat0, 180.0, lat1)], False
    pad_lon = pad / np.cos(np.radians(max_abs_lat))

    if float(lon.max()) - float(lon.min()) > 180.0:
        # wraps the antimeridian: split into the two planar pieces
        neg, pos = lon[lon < 0.0], lon[lon >= 0.0]
        return (
            [
                (-180.0, lat0, min(180.0, float(neg.max()) + pad_lon), lat1),
                (max(-180.0, float(pos.min()) - pad_lon), lat0, 180.0, lat1),
            ],
            False,
        )
    lon0 = max(-180.0, float(lon.min()) - pad_lon)
    lon1 = min(180.0, float(lon.max()) + pad_lon)
    return [(lon0, lat0, lon1, lat1)], True


def _boxes_overlap(a, b) -> bool:
    return a[0] <= b[2] and a[2] >= b[0] and a[1] <= b[3] and a[3] >= b[1]


def _box_inside(a, b) -> bool:
    return a[0] >= b[0] and a[2] <= b[2] and a[1] >= b[1] and a[3] <= b[3]


def _descendant_ids(f: int, res: int, r: int, i: int, j: int) -> list[int]:
    dr = res - r
    ii = (np.arange(i << dr, (i + 1) << dr, dtype=np.int64))[:, None]
    jj = (np.arange(j << dr, (j + 1) << dr, dtype=np.int64))[None, :]
    ids = (
        np.int64(f << _F_SHIFT)
        + np.int64(res << _R_SHIFT)
        + ii * np.int64(1 << _I_SHIFT)
        + jj
    )
    return ids.ravel().tolist()


# cell_lonlat_boxes is a pure function of (f, r, i, j) and the covering
# descent revisits the same upper-tree nodes for EVERY query (all descents
# start at the 6 faces), so the boxes are memoized for shallow levels. The
# cap bounds the cache by construction — levels 0..6 hold at most
# 6*(4^7-1)/3 = 32,766 nodes of a few hundred bytes each (~8 MB worst
# case per worker) — deeper nodes are query-specific and stay uncached
# (the unbounded-cache OOM lesson of the r2 adjacency-mask advice).
_BOX_CACHE_MAX_RES = 6
_BOX_CACHE: dict[tuple[int, int, int, int], tuple] = {}


def _boxes_cached(f: int, r: int, i: int, j: int):
    if r > _BOX_CACHE_MAX_RES:
        return cell_lonlat_boxes(f, r, i, j)
    key = (f, r, i, j)
    got = _BOX_CACHE.get(key)
    if got is None:
        got = cell_lonlat_boxes(f, r, i, j)
        _BOX_CACHE[key] = got
    return got


def sphere_covering_cells_py(
    minx: float, miny: float, maxx: float, maxy: float, res: int
) -> list[int]:
    """All sphere cells at ``res`` that (conservatively) intersect the
    lon/lat bbox — hierarchical descent from the 6 faces, pruning subtrees
    whose conservative boxes miss the query and bulk-emitting subtrees whose
    conservative boxes lie fully inside it. ``minx > maxx`` follows the
    RFC 7946 antimeridian-crossing convention (mirrors the flat
    covering_cells)."""
    if minx > maxx:
        qboxes = [(-180.0, miny, maxx, maxy), (minx, miny, 180.0, maxy)]
    else:
        qboxes = [(minx, miny, maxx, maxy)]
    out: list[int] = []
    stack = [(f, 0, 0, 0) for f in range(6)]
    while stack:
        f, r, i, j = stack.pop()
        boxes, _ = _boxes_cached(f, r, i, j)
        if not any(_boxes_overlap(b, q) for b in boxes for q in qboxes):
            continue
        if r == res:
            out.append(sphere_pack_py(f, res, i, j))
            continue
        if all(any(_box_inside(b, q) for q in qboxes) for b in boxes):
            out.extend(_descendant_ids(f, res, r, i, j))
            continue
        r2 = r + 1
        stack.extend(
            (f, r2, 2 * i + di, 2 * j + dj) for di in (0, 1) for dj in (0, 1)
        )
    return out


# Full-level box tables for the DIRECT covering path: at shallow
# resolutions the whole level's conservative boxes fit in a small array
# (res 6 = 24,576 cells, ~1 MB), so a slow-path query is ONE vectorized
# bbox-overlap sweep instead of a per-query quadtree descent (which costs
# ms-per-row in Python). Built lazily on the DRIVER (module-cached, so the
# scalar cell_lonlat_boxes cost is paid once per process) and shipped to
# workers inside the UDF closure. Same boxes, same inclusive overlap test
# as the descent, so the covering stays a provable superset; the exact set
# can only be ⊇ the descent's (no ancestor-box pruning).
_LEVEL_DIRECT_MAX = 6
_LEVEL_TABLE: dict[int, tuple[np.ndarray, ...]] = {}


def _level_box_table(res: int):
    got = _LEVEL_TABLE.get(res)
    if got is None:
        n = 1 << res
        ids, xs0, ys0, xs1, ys1 = [], [], [], [], []
        for f in range(6):
            for i in range(n):
                for j in range(n):
                    boxes, _ = _boxes_cached(f, res, i, j)
                    cid = sphere_pack_py(f, res, i, j)
                    for x0, y0, x1, y1 in boxes:
                        ids.append(cid)
                        xs0.append(x0)
                        ys0.append(y0)
                        xs1.append(x1)
                        ys1.append(y1)
        got = (
            np.asarray(ids, np.int64),
            np.asarray(xs0),
            np.asarray(ys0),
            np.asarray(xs1),
            np.asarray(ys1),
        )
        _LEVEL_TABLE[res] = got
    return got


def _direct_cover(table, qx0: float, qy0: float, qx1: float, qy1: float):
    ids, bx0, by0, bx1, by1 = table
    ym = (by0 <= qy1) & (by1 >= qy0)
    if qx0 > qx1:  # antimeridian query: [-180, qx1] u [qx0, 180]
        m = ym & ((bx0 <= qx1) | (bx1 >= qx0))
    else:
        m = ym & (bx0 <= qx1) & (bx1 >= qx0)
    return np.unique(ids[m])


def sphere_covering_cells_udf(
    minx: Column, miny: Column, maxx: Column, maxy: Column, res: int
) -> Column:
    """array<long> covering per row (the distributed polygon/footprint-side
    shard path). A vectorized single-face fast path handles the common tiny
    footprint: if all 4 bbox corners land strictly inside one EQUATORIAL
    face, the box provably stays on that face (the face's |lat| boundary is
    minimized at the box's lon extremes, so corners-inside implies
    edges-inside). u = tan(dlon) is monotone in lon, but t = st(v) with
    v = tan(lat)/cos(dlon) is NOT monotone per axis: for a box entirely
    north/south of the equator whose lon span contains the face's central
    meridian, the |v| minimum lies mid-edge (at that meridian), not at a
    corner — so the sample set is the 4 corners PLUS the two points where
    the meridian (clamped into [x0,x1]) meets the top/bottom edges, which
    restores a valid covering range. Everything else (polar faces,
    face-straddling, antimeridian) takes the exact hierarchical routine
    per row."""
    table = _level_box_table(res) if res <= _LEVEL_DIRECT_MAX else None

    @pandas_udf(T.ArrayType(T.LongType()))
    def _cov(b_minx, b_miny, b_maxx, b_maxy):
        return pd.Series(
            _covering_cells_np(
                b_minx.to_numpy(dtype=np.float64),
                b_miny.to_numpy(dtype=np.float64),
                b_maxx.to_numpy(dtype=np.float64),
                b_maxy.to_numpy(dtype=np.float64),
                res,
                table,
            )
        )

    return _cov(minx, miny, maxx, maxy)


def _covering_cells_np(x0, y0, x1, y1, res: int, table) -> list:
    """Vectorized covering over row arrays — the body of
    ``sphere_covering_cells_udf``, module-level so the fast-path
    completeness property is testable without a SparkSession."""
    n = 1 << res
    m = len(x0)
    out = [None] * m

    def _face_uv(lons, lats):
        rl, rp = np.radians(lons), np.radians(lats)
        X = np.cos(rp) * np.cos(rl)
        Y = np.cos(rp) * np.sin(rl)
        Z = np.sin(rp)
        aX, aY, aZ = np.abs(X), np.abs(Y), np.abs(Z)
        xdom = (aX >= aY) & (aX >= aZ)
        ydom = (~xdom) & (aY >= aZ)
        zdom = ~(xdom | ydom)
        face = np.select(
            [xdom & (X >= 0), xdom, ydom & (Y >= 0), ydom, zdom & (Z >= 0)],
            [0, 3, 1, 4, 2],
            5,
        ).astype(np.int64)
        d = np.select([xdom, ydom], [aX, aY], aZ)
        U = np.select([xdom], [Y], X) / d
        V = np.select([xdom | ydom], [Z], Y) / d
        return face, U, V

    # sample points: 4 corners + 2 central-meridian mid-edge points
    face, U, V = _face_uv(
        np.stack([x0, x1, x0, x1]), np.stack([y0, y0, y1, y1])
    )
    f0 = face[0]
    cm = np.select(
        [f0 == 0, f0 == 1, f0 == 4],
        [0.0, 90.0, -90.0],
        np.where(x0 >= 0.0, 180.0, -180.0),  # face 3; polar rows unused
    )
    cmx = np.clip(cm, x0, x1)
    eface, eU, eV = _face_uv(np.stack([cmx, cmx]), np.stack([y0, y1]))
    face = np.concatenate([face, eface])
    U = np.concatenate([U, eU])
    V = np.concatenate([V, eV])
    same_face = (face == face[0]).all(axis=0)
    equatorial = np.isin(face[0], (0, 1, 3, 4))
    interior = (np.abs(U) <= 1.0 - 1e-9).all(axis=0) & (
        np.abs(V) <= 1.0 - 1e-9
    ).all(axis=0)
    ordered = x0 <= x1  # antimeridian convention rows -> slow path
    # span <= 90 keeps a face-3 box inside ONE connected lon piece of
    # the face region (it is [-180,-135] u [135,180] — a box whose
    # corners all land on face 3 but spans the near side would
    # otherwise sneak through faces 0/1/4)
    fast = same_face & equatorial & interior & ordered & ((x1 - x0) <= 90.0)
    S, Tt = _np_st_from_uv(U), _np_st_from_uv(V)
    i0 = np.clip(np.floor((S.min(axis=0) - 1e-9) * n), 0, n - 1).astype(np.int64)
    i1 = np.clip(np.floor((S.max(axis=0) + 1e-9) * n), 0, n - 1).astype(np.int64)
    j0 = np.clip(np.floor((Tt.min(axis=0) - 1e-9) * n), 0, n - 1).astype(np.int64)
    j1 = np.clip(np.floor((Tt.max(axis=0) + 1e-9) * n), 0, n - 1).astype(np.int64)
    for r in range(m):
        if fast[r]:
            out[r] = _descendant_ids_range(
                int(face[0, r]), res, int(i0[r]), int(i1[r]), int(j0[r]), int(j1[r])
            )
        elif table is not None:
            out[r] = _direct_cover(
                table, float(x0[r]), float(y0[r]), float(x1[r]), float(y1[r])
            )
        else:
            out[r] = sphere_covering_cells_py(
                float(x0[r]), float(y0[r]), float(x1[r]), float(y1[r]), res
            )
    return out



def _descendant_ids_range(
    f: int, res: int, i0: int, i1: int, j0: int, j1: int
) -> list[int]:
    ii = np.arange(i0, i1 + 1, dtype=np.int64)[:, None]
    jj = np.arange(j0, j1 + 1, dtype=np.int64)[None, :]
    ids = (
        np.int64(f << _F_SHIFT)
        + np.int64(res << _R_SHIFT)
        + ii * np.int64(1 << _I_SHIFT)
        + jj
    )
    return ids.ravel().tolist()


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


def sphere_cell_res_py(cell: int) -> int:
    return (cell >> _R_SHIFT) & ((1 << (_F_SHIFT - _R_SHIFT)) - 1)


def sphere_compact_cells_py(
    rows: list[tuple[int, int]], res: int
) -> list[tuple[int, int]]:
    """``cells.compact_cells_py`` on the SPHERE grid: 4 sibling cells
    (same face, (i >> 1, j >> 1) parent) carried by the same polygon
    collapse to their parent, bottom-up to fixpoint. Input rows are
    (cell_id, poly_id) at ``res``; output is a mixed-res antichain per
    polygon over the same leaves — consumers probe ``sphere_cell_id`` at
    each resolution present (see point_in_polygon_join)."""
    cur: set[tuple[int, int]] = {(int(c), int(p)) for c, p in rows}
    for r in range(res, 0, -1):
        level = [(c, p) for c, p in cur if sphere_cell_res_py(c) == r]
        rest = cur - set(level)
        promoted: dict[tuple[int, int], int] = {}
        for c, p in level:
            f, _, i, j = sphere_parts_py(c)
            key = (sphere_pack_py(f, r - 1, i >> 1, j >> 1), p)
            promoted[key] = promoted.get(key, 0) + 1
        keep: set[tuple[int, int]] = set()
        for (pc, p), n in promoted.items():
            if n == 4:
                rest.add((pc, p))
            else:
                f, _, pi, pj = sphere_parts_py(pc)
                for di in (0, 1):
                    for dj in (0, 1):
                        cand = (
                            sphere_pack_py(f, r, (pi << 1) + di, (pj << 1) + dj),
                            p,
                        )
                        if cand in cur:
                            keep.add(cand)
        cur = rest | keep
        if not any(sphere_cell_res_py(c) == r - 1 for c, _ in cur):
            break
    return sorted(cur)
