"""Sphere-grid covering + shard classification (driver-side, no Spark).

The covering must be a PROVABLE superset of the cells intersecting the
query region — these tests hammer exactly the cases the conservative
machinery exists for: polar caps, antimeridian wraps (both a cell wrapping
and the RFC 7946 minx>maxx query convention), and face-edge straddles.
"""

from __future__ import annotations

import numpy as np

from osm2geojson_spark.functions import geom
from osm2geojson_spark.functions import kernels as K
from osm2geojson_spark.operators import cells_sphere as SPH
from osm2geojson_spark.operators.spatial_join import sphere_classified_shards


def _boxpoly(x0, y0, x1, y1):
    return geom.polygon(
        [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]
    )


def test_cell_boxes_contain_dense_cell_samples():
    """cell_lonlat_boxes must contain every point of the cell — checked by
    encoding a dense grid of sphere points and verifying each point lands
    inside its own cell's boxes."""
    rng = np.random.default_rng(11)
    for res in (2, 4):
        lons = rng.uniform(-180, 180, 4000)
        lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 4000)))  # area-uniform
        ids = SPH._np_encode(lons, lats, res)
        for k in range(0, 4000, 7):
            f, r, i, j = SPH.sphere_parts_py(int(ids[k]))
            boxes, _ = SPH.cell_lonlat_boxes(f, res, i, j)
            lo, la = lons[k], lats[k]
            assert any(
                b[0] <= lo <= b[2] and b[1] <= la <= b[3] for b in boxes
            ), (res, f, i, j, lo, la)


def test_polar_cells_flagged_unclean():
    # the cell at each pole must be clean=False with full lon range
    for lat, face in ((89.99, 2), (-89.99, 5)):
        cid = SPH.sphere_cell_id_py(13.0, lat, 3)
        f, _, i, j = SPH.sphere_parts_py(cid)
        assert f == face
        boxes, clean = SPH.cell_lonlat_boxes(f, 3, i, j)
        assert not clean
        assert boxes[0][0] == -180.0 and boxes[0][2] == 180.0


def test_covering_completeness_random_boxes():
    rng = np.random.default_rng(42)
    for _ in range(25):
        cx, cy = rng.uniform(-180, 180), rng.uniform(-89, 89)
        w, h = rng.uniform(0.5, 40), rng.uniform(0.5, 30)
        minx, maxx = max(-180, cx - w / 2), min(180, cx + w / 2)
        miny, maxy = max(-90, cy - h / 2), min(90, cy + h / 2)
        res = int(rng.integers(2, 7))
        cov = set(SPH.sphere_covering_cells_py(minx, miny, maxx, maxy, res))
        lons = rng.uniform(minx, maxx, 400)
        lats = rng.uniform(miny, maxy, 400)
        ids = SPH._np_encode(lons, lats, res)
        assert set(ids.tolist()) <= cov


def test_covering_completeness_polar_and_antimeridian():
    rng = np.random.default_rng(5)
    for (minx, miny, maxx, maxy) in [
        (-180, 80, 180, 90),
        (-180, -90, 180, -85),
        (10, 85, 20, 89.5),
    ]:
        for res in (3, 5):
            cov = set(SPH.sphere_covering_cells_py(minx, miny, maxx, maxy, res))
            lons = rng.uniform(minx, maxx, 1500)
            lats = rng.uniform(miny, maxy, 1500)
            assert set(SPH._np_encode(lons, lats, res).tolist()) <= cov
    # RFC 7946 minx > maxx wrap
    cov = set(SPH.sphere_covering_cells_py(170, -10, -170, 10, 4))
    lons = np.concatenate([rng.uniform(170, 180, 400), rng.uniform(-180, -170, 400)])
    lats = rng.uniform(-10, 10, 800)
    assert set(SPH._np_encode(lons, lats, 4).tolist()) <= cov


def test_covering_prunes_far_cells():
    """The covering is conservative but must not degenerate to the whole
    sphere: a 10-degree box at res 5 covers a small fraction of the 6*2^10
    cells."""
    cov = SPH.sphere_covering_cells_py(0, 0, 10, 10, 5)
    assert 0 < len(cov) < 200  # 6 * 32 * 32 = 6144 total cells at res 5


def test_classified_shards_match_bruteforce_pip():
    """inside-cells must contain ONLY inside points; every inside point must
    be in an inside or boundary cell — on polar, high-lat and near-global
    polygons."""
    rng = np.random.default_rng(7)
    polys = [
        (1, _boxpoly(-10, -5, 25, 20)),
        (2, _boxpoly(100, 60, 170, 88)),
        (3, _boxpoly(-179.5, -30, 179.5, 30)),
        (4, _boxpoly(5, 80, 60, 89.9)),
    ]
    for res in (3, 5):
        inside, boundary, _ = sphere_classified_shards(polys, res)
        ins: dict[int, set] = {}
        for c, p in inside:
            ins.setdefault(p, set()).add(c)
        bnd: dict[int, set] = {}
        for c, p in boundary:
            bnd.setdefault(p, set()).add(c)
        for pid, g in polys:
            rings = geom.all_rings(g)
            x0, y0, x1, y1 = geom.bbox(g)
            lons = rng.uniform(x0, x1, 1200)
            lats = rng.uniform(y0, y1, 1200)
            pts = np.column_stack([lons, lats])
            in_poly = np.zeros(len(pts), bool)
            for ring, is_hole in rings:
                hit = K.points_in_ring(pts, ring)
                in_poly = (in_poly & ~hit) if is_hole else (in_poly | hit)
            ids = SPH._np_encode(lons, lats, res)
            for k in range(len(pts)):
                c = int(ids[k])
                if in_poly[k]:
                    assert c in ins.get(pid, ()) or c in bnd.get(pid, ())
                else:
                    assert c not in ins.get(pid, ())


def test_direct_level_cover_is_superset_of_descent():
    """The full-level box-table path (sphere_covering_cells_udf's slow-path
    replacement at res <= _LEVEL_DIRECT_MAX) must cover at least every cell
    the hierarchical descent covers — same boxes, same inclusive overlap
    test, no ancestor pruning — and must not degenerate toward the whole
    level."""
    import numpy as np

    table = SPH._level_box_table(5)
    rng = np.random.default_rng(1)
    n_total = 6 * (1 << 5) ** 2
    for k in range(60):
        if k % 3 == 0:  # antimeridian-wrapped query
            y0 = float(rng.uniform(-80, 60))
            q = (
                float(rng.uniform(150, 179)), y0,
                float(rng.uniform(-179, -150)), y0 + float(rng.uniform(1, 20)),
            )
        else:
            x0 = float(rng.uniform(-180, 170))
            y0 = float(rng.uniform(-89, 80))
            q = (x0, y0, x0 + float(rng.uniform(0.5, 40)), y0 + float(rng.uniform(0.5, 15)))
        desc = set(SPH.sphere_covering_cells_py(*q, 5))
        direct = set(SPH._direct_cover(table, *q).tolist())
        assert desc <= direct, (k, q)
        assert len(direct) < n_total / 4, (k, q, len(direct))


def test_fast_path_covering_completeness():
    """The UDF's single-face fast path (corner st-range) must be complete —
    specifically for boxes entirely north/south of the equator whose lon
    span contains the face's central meridian, where t = st(tan(lat)/
    cos(dlon)) has its extreme mid-edge, not at a corner (round-3 ADVICE,
    high). Mirrors test_covering_completeness_random_boxes but drives the
    vectorized _covering_cells_np with table=None so the fast branch is the
    one that answers."""
    # the exact ADVICE repro: box (-10,20,10,30) at res 9 must contain the
    # cell of in-box point (0, 20.0001)
    cov = set(
        SPH._covering_cells_np(
            np.array([-10.0]), np.array([20.0]),
            np.array([10.0]), np.array([30.0]), 9, None,
        )[0]
    )
    assert set(SPH.sphere_covering_cells_py(-10, 20, 10, 30, 9)) <= cov
    cid = int(SPH._np_encode(np.array([0.0]), np.array([20.0001]), 9)[0])
    assert cid in cov

    rng = np.random.default_rng(123)
    for _ in range(120):
        c = float(rng.choice([0.0, 90.0, -90.0, 180.0, -180.0]))
        w, h = rng.uniform(1, 35), rng.uniform(1, 25)
        cx, cy = c + rng.uniform(-10, 10), rng.uniform(-55, 55)
        x0, x1 = cx - w / 2, cx + w / 2
        y0, y1 = max(-60.0, cy - h / 2), min(60.0, cy + h / 2)
        if x0 < -180 or x1 > 180:
            continue
        res = int(rng.integers(3, 10))
        cov = set(
            SPH._covering_cells_np(
                np.array([x0]), np.array([y0]),
                np.array([x1]), np.array([y1]), res, None,
            )[0]
        )
        # point-completeness is the property (the fast path is an EXACT
        # st-range, so it may be tighter than the conservative descent —
        # a ⊇-descent assertion would be wrong); hammer the box edges too,
        # where the mid-edge t-extreme bug lived
        lons = np.concatenate(
            [rng.uniform(x0, x1, 300), rng.uniform(x0, x1, 100),
             rng.uniform(x0, x1, 100)]
        )
        lats = np.concatenate(
            [rng.uniform(y0, y1, 300), np.full(100, y0), np.full(100, y1)]
        )
        assert set(SPH._np_encode(lons, lats, res).tolist()) <= cov
