"""Unit tests for the NumPy geometry kernels (no Spark)."""

from __future__ import annotations

import numpy as np

from osm2geojson_spark.functions import geom
from osm2geojson_spark.functions import kernels as K


def test_gpb_roundtrip():
    p = geom.point(1.5, -2.5)
    assert geom.decode(p) == (geom.GTYPE_POINT, (1.5, -2.5))

    ls = geom.linestring([[0, 0], [1, 1], [2, 0]])
    t, pts = geom.decode(ls)
    assert t == geom.GTYPE_LINESTRING
    assert np.allclose(pts, [[0, 0], [1, 1], [2, 0]])

    ring = [[0, 0], [1, 0], [1, 1], [0, 0]]
    hole = [[0.2, 0.1], [0.8, 0.1], [0.8, 0.2], [0.2, 0.1]]
    mp = geom.multipolygon([[ring, hole], [ring]])
    t, polys = geom.decode(mp)
    assert t == geom.GTYPE_MULTIPOLYGON
    assert len(polys) == 2 and len(polys[0]) == 2
    gj = geom.to_geojson_geometry(mp)
    assert gj["type"] == "MultiPolygon"
    assert gj["coordinates"][0][0][1] == [1.0, 0.0]


def test_signed_area_and_orient():
    ccw = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    assert K.signed_area(ccw) > 0
    cw = ccw[::-1]
    assert K.signed_area(cw) < 0
    fixed = K.orient_ring(cw, ccw=True)
    assert K.signed_area(fixed) > 0
    # closed-ring reversal preserves the start point (shapely orient behavior)
    assert np.array_equal(fixed[0], cw[0])


def test_linemerge_chain_in_order():
    a = np.array([[0, 0], [1, 0]], dtype=float)
    b = np.array([[1, 0], [2, 0]], dtype=float)
    c = np.array([[2, 0], [3, 1]], dtype=float)
    out = K.linemerge([a, b, c])
    assert len(out) == 1
    assert np.allclose(out[0], [[0, 0], [1, 0], [2, 0], [3, 1]])


def test_linemerge_reversed_segment():
    a = np.array([[0, 0], [1, 0]], dtype=float)
    b = np.array([[2, 0], [1, 0]], dtype=float)  # drawn backwards
    out = K.linemerge([a, b])
    assert len(out) == 1
    assert np.allclose(out[0], [[0, 0], [1, 0], [2, 0]])


def test_linemerge_disjoint_stays_apart():
    a = np.array([[0, 0], [1, 0]], dtype=float)
    b = np.array([[5, 5], [6, 5]], dtype=float)
    out = K.linemerge([a, b])
    assert len(out) == 2


def test_linemerge_junction_not_merged_through():
    # three lines meeting at one point: degree-3 node must not be merged through
    a = np.array([[0, 0], [1, 1]], dtype=float)
    b = np.array([[1, 1], [2, 0]], dtype=float)
    c = np.array([[1, 1], [1, 2]], dtype=float)
    out = K.linemerge([a, b, c])
    assert len(out) == 3


def test_linemerge_closed_loop():
    a = np.array([[0, 0], [1, 0], [1, 1]], dtype=float)
    b = np.array([[1, 1], [0, 1], [0, 0]], dtype=float)
    out = K.linemerge([a, b])
    assert len(out) == 1
    assert np.array_equal(out[0][0], out[0][-1])
    assert len(out[0]) == 5


def test_points_in_ring():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    pts = np.array([[2, 2], [5, 5], [-1, 2], [3.9, 3.9]], dtype=float)
    res = K.points_in_ring(pts, ring)
    assert res.tolist() == [True, False, False, True]


def test_ring_contains_ring():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    inner = np.array([[2, 2], [3, 2], [3, 3], [2, 2]], dtype=float)
    assert K.ring_contains_ring(outer, inner)
    assert not K.ring_contains_ring(inner, outer)


def test_ring_simple():
    ok = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
    bowtie = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float)
    assert K.ring_is_simple(ok)
    assert not K.ring_is_simple(bowtie)


def test_difference_attaches_hole_with_overlay_normalization():
    # mirrors tests/data/relation.* — the golden that pinned the GEOS
    # overlay ring rotation rule
    outer = [np.array([[-1, -1], [1, -1], [1, 1], [-1, 1], [-1, -1]], dtype=float)]
    hole = [np.array([[0, -0.5], [0, 0.5], [0.5, 0], [0, -0.5]], dtype=float)]
    mp = K.multipolygon_difference([outer], [hole])
    mp = K.orient_multipolygon(mp)
    shell, h = mp[0][0], mp[0][1]
    assert shell.tolist() == [[-1, 1], [-1, -1], [1, -1], [1, 1], [-1, 1]]
    assert h.tolist() == [[0.5, 0], [0, -0.5], [0, 0.5], [0.5, 0]]


def test_haversine():
    # London -> Paris ~ 343.5 km
    d = K.haversine_m(-0.1276, 51.5072, 2.3522, 48.8566)
    assert 330_000 < float(d) < 360_000
    assert float(K.haversine_m(10, 20, 10, 20)) == 0.0


def test_ring_simple_sweep_agrees_with_bruteforce():
    """The sweep path (large rings) must agree with the all-pairs path on
    simple and self-intersecting rings of every size."""
    import numpy as np

    from osm2geojson_spark.functions.kernels import (
        _ring_is_simple_sweep,
        close_ring,
        ring_is_simple,
    )

    rng = np.random.RandomState(7)
    for n in (16, 200, 1000):
        # star-shaped ring (angle-sorted points around a center): simple
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(0.5, 1.0, n)
        simple = close_ring(np.column_stack([rad * np.cos(ang), rad * np.sin(ang)]))
        # shuffled points: self-intersecting with overwhelming probability
        perm = rng.permutation(n)
        tangled = close_ring(simple[:-1][perm])
        for ring, want in ((simple, True), (tangled, False)):
            brute = ring_is_simple(ring, sweep_threshold=10**9)
            sweep = _ring_is_simple_sweep(ring[:-1], ring[1:], len(ring) - 1)
            assert brute == sweep == want, (len(ring), want, brute, sweep)
    # bowtie: the canonical proper self-intersection
    bowtie = np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    assert not ring_is_simple(bowtie)
    assert not _ring_is_simple_sweep(bowtie[:-1], bowtie[1:], 4)


def test_bowtie_split_repair():
    """buffer(0) on a figure-eight: split at the crossing into two simple
    loops whose areas sum to the absolute shoelace parts."""
    import numpy as np

    from osm2geojson_spark.functions.kernels import (
        fix_invalid_multipolygon,
        polygon_is_valid,
        signed_area,
    )

    bowtie = np.array(
        [[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]]
    )
    repaired = fix_invalid_multipolygon([[bowtie]])
    assert len(repaired) == 2
    areas = sorted(abs(signed_area(p[0])) for p in repaired)
    assert all(polygon_is_valid(p) for p in repaired)
    assert abs(areas[0] - 1.0) < 1e-12 and abs(areas[1] - 1.0) < 1e-12  # two unit triangles

    # valid polygons pass through untouched (identity, not copies)
    square = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]])
    same = fix_invalid_multipolygon([[square, hole]])
    assert len(same) == 1 and same[0][0] is square and same[0][1] is hole


def test_multi_crossing_split_repair():
    """General buffer(0): a pentagram (five proper self-crossings) splits
    into six simple loops — the five points plus the central pentagon."""
    ang = np.pi / 2 + 2 * np.pi * (2 * np.arange(5)) / 5  # step-2 star order
    ring = K.close_ring(np.column_stack([np.cos(ang), np.sin(ang)]))
    assert not K.ring_is_simple(ring)
    pieces = K.split_self_intersections(ring)
    assert len(pieces) == 6
    for p in pieces:
        assert K.ring_is_simple(p)
        assert K.is_closed(p)
        assert K.signed_area(p) != 0.0
    # five congruent point-triangles and one central pentagon
    areas = sorted(abs(K.signed_area(p)) for p in pieces)
    assert np.allclose(areas[:5], areas[0])
    assert areas[5] > areas[0]


def test_random_tangled_rings_split_to_simple_loops():
    """Property: for random heavily self-intersecting rings, every repaired
    loop is simple, closed and has nonzero area; repair never crashes and
    single-crossing inputs agree with split_bowtie_ring."""
    rng = np.random.default_rng(11)
    for n in (6, 9, 14, 23):
        for _ in range(5):
            pts = rng.normal(size=(n, 2))
            ring = K.close_ring(pts)
            pieces = K.split_self_intersections(ring)
            for p in pieces:
                assert K.is_closed(p)
                assert K.ring_is_simple(p)
                assert K.signed_area(p) != 0.0
    # single-crossing agreement with the bowtie splitter (as cyclic sets)
    bowtie = np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]])
    a = K.split_self_intersections(bowtie)
    b = K.split_bowtie_ring(bowtie)
    assert len(a) == len(b) == 2

    def canon(lp):
        pts = [tuple(p) for p in lp[:-1]]
        k = pts.index(min(pts))
        fwd = tuple(pts[k:] + pts[:k])
        rpts = pts[::-1]
        k = rpts.index(min(rpts))
        rev = tuple(rpts[k:] + rpts[:k])
        return min(fwd, rev)  # orientation-insensitive cyclic form

    assert {canon(x) for x in a} == {canon(y) for y in b}


def test_small_ring_fast_path_matches_general():
    """The n<=4 scalar fast paths agree with the general batched check on
    random triangles/quads (incl. bowties) and with the sweep."""
    rng = np.random.default_rng(13)
    for npts in (3, 4):
        for _ in range(200):
            ring = K.close_ring(rng.normal(size=(npts, 2)))
            fast = K.ring_is_simple(ring)
            # force the general matrix path by re-implementing the call with
            # a 5+-vertex threshold bypass: compare against the sweep
            sweep = K._ring_is_simple_sweep(ring[:-1], ring[1:], npts)
            assert fast == sweep, ring


def test_fix_invalid_repairs_self_intersecting_holes():
    """A valid shell with a bowtie HOLE: the hole is noded and split into
    its two simple triangular loops, both kept as holes of the shell."""
    square = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
    bowtie_hole = np.array([[2.0, 2.0], [4.0, 4.0], [4.0, 2.0], [2.0, 4.0], [2.0, 2.0]])
    out = K.fix_invalid_multipolygon([[square, bowtie_hole]])
    assert len(out) == 1
    shell, *holes = out[0]
    assert shell is square
    assert len(holes) == 2
    for h in holes:
        assert K.ring_is_simple(h)
        assert K.ring_contains_ring(square, h)
    areas = sorted(abs(K.signed_area(h)) for h in holes)
    assert abs(areas[0] - 1.0) < 1e-12 and abs(areas[1] - 1.0) < 1e-12


# ------------------------------------------------------- DP simplification


def test_dp_simplify_keeps_spikes_drops_collinear():
    from osm2geojson_spark.functions.kernels import dp_simplify

    pts = np.array([[0, 0], [1, 0.001], [2, 0], [3, 2], [4, 0]], dtype=float)
    out = dp_simplify(pts, 0.01)
    assert out.tolist() == [[0, 0], [2, 0], [3, 2], [4, 0]]
    # idempotent at the same tolerance
    assert dp_simplify(out, 0.01).tolist() == out.tolist()
    # larger tolerance -> never more points
    assert len(dp_simplify(pts, 3.0)) <= len(out)


def test_dp_simplify_ring_never_degenerates():
    from osm2geojson_spark.functions.kernels import dp_simplify_ring

    tri = np.array([[0, 0], [1, 0], [0.5, 0.001], [0, 0]], dtype=float)
    out = dp_simplify_ring(tri, 0.01)  # would collapse -> must keep original
    assert out.tolist() == tri.tolist()
    sq = np.array(
        [[0, 0], [1, 0], [1, 1], [0.5, 1.0001], [0, 1], [0, 0]], dtype=float
    )
    out = dp_simplify_ring(sq, 0.01)
    assert out.tolist() == [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]
    assert (out[0] == out[-1]).all()


def test_alpha_shape_brute_and_properties(spark):
    """Scalar replay of the alpha complex (Python bigint circumradius
    gate over the brute Delaunay) plus the designed properties: at
    alpha -> inf the boundary equals the convex hull edge set; a
    two-blob group keeps the blobs as separate boundary loops at small
    alpha; every boundary vertex has even boundary degree."""
    from itertools import combinations

    import duckdb

    from osm2geojson_spark.operators.geometry import (
        alpha_shape_edges,
        alpha_shape_edges_sql,
    )

    # two well-separated 8-point blobs in one group
    rng_pts = []
    pid = 0
    for bx, by in ((0, 0), (900, 900)):
        for dx, dy in ((0, 0), (60, 10), (20, 70), (80, 80), (40, 40),
                       (75, 30), (10, 55), (65, 65)):
            rng_pts.append((0, pid, bx + dx, by + dy))
            pid += 1
    df = spark.createDataFrame(rng_pts, "grp long, pid long, x long, y long")

    def brute(alpha2):
        pts = {p: (x, y) for _, p, x, y in rng_pts}
        ids = sorted(pts)
        tris = []
        for a, b, c in combinations(ids, 3):
            ax, ay = pts[a]; bx, by = pts[b]; cx, cy = pts[c]
            orient = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            if orient == 0:
                continue
            empty = True
            for d in ids:
                dx, dy = pts[d]
                adx, ady = ax - dx, ay - dy
                bdx, bdy = bx - dx, by - dy
                cdx, cdy = cx - dx, cy - dy
                det = (adx * (bdy * (cdx * cdx + cdy * cdy)
                              - cdy * (bdx * bdx + bdy * bdy))
                       - ady * (bdx * (cdx * cdx + cdy * cdy)
                                - cdx * (bdx * bdx + bdy * bdy))
                       + (adx * adx + ady * ady)
                       * (bdx * cdy - cdx * bdy))
                if (det > 0) == (orient > 0) and det != 0:
                    empty = False
                    break
            if not empty:
                continue
            ab2 = (bx - ax) ** 2 + (by - ay) ** 2
            bc2 = (cx - bx) ** 2 + (cy - by) ** 2
            ca2 = (ax - cx) ** 2 + (ay - cy) ** 2
            if ab2 * bc2 * ca2 < 4 * alpha2 * orient * orient:
                tris.append((a, b, c))
        inc = {}
        for a, b, c in tris:
            for e in ((a, b), (b, c), (a, c)):
                inc[e] = inc.get(e, 0) + 1
        return inc

    for alpha2 in (8_000, 10**10):
        got = {
            (r["u"], r["v"]): (r["n_inc"], r["boundary"])
            for r in alpha_shape_edges(df, alpha2=alpha2).collect()
        }
        want = brute(alpha2)
        assert got == {e: (n, n == 1) for e, n in want.items()}, alpha2
        # even boundary degree at every vertex (boundary is closed loops)
        deg = {}
        for (u, v), (n, b) in got.items():
            if b:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        assert deg and all(d % 2 == 0 for d in deg.values()), alpha2

    # small alpha: no boundary edge bridges the two blobs
    got_small = {
        (r["u"], r["v"])
        for r in alpha_shape_edges(df, alpha2=8_000).collect()
        if r["boundary"]
    }
    assert got_small and all((u < 8) == (v < 8) for u, v in got_small)

    # twin parity
    duck = duckdb.connect()
    duck.execute("CREATE TABLE ash (grp BIGINT, pid BIGINT, x BIGINT, y BIGINT)")
    duck.executemany("INSERT INTO ash VALUES (?, ?, ?, ?)", rng_pts)
    twin = {
        (r[1], r[2]): (r[3], r[4])
        for r in duck.sql(
            alpha_shape_edges_sql("SELECT * FROM ash", alpha2=8_000)
        ).fetchall()
    }
    got8 = {
        (r["u"], r["v"]): (r["n_inc"], r["boundary"])
        for r in alpha_shape_edges(df, alpha2=8_000).collect()
    }
    assert twin == got8


def test_ring_validity_cases_and_twin(spark):
    """Designed cases: a valid square; a bowtie (1 proper bad pair); a
    ring with a duplicate consecutive vertex (zero-length edge); a
    spike (collinear double-back); twin byte-for-byte."""
    import duckdb

    from osm2geojson_spark.operators.geometry import (
        ring_validity,
        ring_validity_sql,
    )

    rows = []
    # ring 0: valid unit-ish square
    for i, (x, y) in enumerate([(0, 0), (10, 0), (10, 10), (0, 10)]):
        rows.append((0, i, x, y))
    # ring 1: bowtie (figure-eight ordering)
    for i, (x, y) in enumerate([(0, 0), (10, 10), (10, 0), (0, 10)]):
        rows.append((1, i, x, y))
    # ring 2: duplicate consecutive vertex -> zero-length edge
    for i, (x, y) in enumerate([(0, 0), (10, 0), (10, 0), (10, 10), (0, 10)]):
        rows.append((2, i, x, y))
    # ring 3: spike at vertex (5,0) -> out-and-back collinear
    for i, (x, y) in enumerate([(0, 0), (5, 0), (9, 0), (5, 0), (5, 10)]):
        rows.append((3, i, x, y))
    df = spark.createDataFrame(rows, "ring_id long, seq long, x long, y long")
    got = {r["ring_id"]: r.asDict() for r in ring_validity(df).collect()}

    assert got[0]["is_valid"] is True and got[0]["n_bad_pairs"] == 0
    assert got[1]["is_valid"] is False and got[1]["n_bad_pairs"] >= 1
    assert got[2]["n_zero_len"] == 1 and got[2]["is_valid"] is False
    assert got[3]["n_spikes"] >= 1 and got[3]["is_valid"] is False

    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE rvr (ring_id BIGINT, seq BIGINT, x BIGINT, y BIGINT)"
    )
    duck.executemany("INSERT INTO rvr VALUES (?,?,?,?)", rows)
    cols = ["ring_id", "n_vertices", "n_zero_len", "n_spikes",
            "n_bad_pairs", "is_valid"]
    twin = {
        r[0]: dict(zip(cols, r))
        for r in duck.sql(ring_validity_sql("SELECT * FROM rvr")).fetchall()
    }
    for rid, g in got.items():
        assert twin[rid] == {c: g[c] for c in cols}, rid
