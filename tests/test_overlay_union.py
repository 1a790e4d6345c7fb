"""General planar-overlay union (kernels.union_overlay) — topology battery
plus a randomized point-coverage equivalence sweep. No Spark needed."""

from __future__ import annotations

import numpy as np

from osm2geojson_spark.functions import kernels as K


def rect(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=np.float64,
    )


def total_area(polys):
    tot = 0.0
    for rings in polys:
        tot += abs(K.signed_area(K.close_ring(rings[0])))
        for h in rings[1:]:
            tot -= abs(K.signed_area(K.close_ring(h)))
    return tot


def covers(polys, pt):
    for rings in polys:
        if K.point_in_ring(pt, K.close_ring(np.asarray(rings[0]))) and not any(
            K.point_in_ring(pt, K.close_ring(np.asarray(h))) for h in rings[1:]
        ):
            return True
    return False


CASES = [
    ("overlap", [[rect(0, 0, 2, 2)], [rect(1, 1, 2, 2)]], 1, 7.0),
    ("disjoint", [[rect(0, 0, 2, 2)], [rect(5, 0, 2, 2)]], 2, 8.0),
    ("nested", [[rect(0, 0, 4, 4)], [rect(1, 1, 1, 1)]], 1, 16.0),
    ("cross", [[rect(0, 1, 5, 1)], [rect(2, -1, 1, 5)]], 1, 9.0),
    # island inside the hole stays a separate part
    ("hole+island", [[rect(0, 0, 6, 6), rect(2, 2, 2, 2)], [rect(2.5, 2.5, 1, 1)]], 2, 33.0),
    # rect overlapping a hole corner shrinks the hole: 36 - (4 - 1)
    ("hole-part-filled", [[rect(0, 0, 6, 6), rect(2, 2, 2, 2)], [rect(3, 3, 2, 2)]], 1, 33.0),
    ("single-with-hole", [[rect(0, 0, 4, 4), rect(1, 1, 1, 1)]], 1, 15.0),
    ("exact-duplicate", [[rect(0, 0, 2, 2)], [rect(0, 0, 2, 2)]], 1, 4.0),
    ("three-chain", [[rect(0, 0, 2, 2)], [rect(1, 0, 2, 2)], [rect(2, 0, 2, 2)]], 1, 8.0),
]


def test_union_overlay_topologies():
    for name, polys, n_parts, area in CASES:
        u = K.union_overlay(polys)
        assert len(u) == n_parts, (name, len(u))
        assert total_area(u) == area, (name, total_area(u))
        # shells CCW-positive, holes negative, holes inside their shell
        for rings in u:
            assert K.signed_area(K.close_ring(rings[0])) > 0
            for h in rings[1:]:
                assert K.signed_area(K.close_ring(h)) < 0
                assert K.ring_contains_ring(rings[0], h)


def test_union_overlay_point_coverage_random_rects():
    """union(polys) covers a point iff some input covers it — checked on an
    off-lattice probe grid (probes at x.y+1/8 never touch the 1/4-lattice
    rect boundaries, so every parity test is strict)."""
    rng = np.random.RandomState(7)
    for trial in range(25):
        polys = []
        for _ in range(rng.randint(2, 6)):
            x0, y0 = rng.randint(0, 16) / 4.0, rng.randint(0, 16) / 4.0
            w, h = rng.randint(1, 12) / 4.0, rng.randint(1, 12) / 4.0
            polys.append([rect(x0, y0, w, h)])
        u = K.union_overlay(polys)
        probes = np.arange(-0.5, 7.5, 0.25) + 0.125
        for px in probes:
            for py in probes:
                assert covers(u, (px, py)) == covers(polys, (px, py)), (
                    trial, px, py,
                )


def test_union_overlay_inclusion_exclusion_area():
    rng = np.random.RandomState(11)
    for _ in range(50):
        a = rect(rng.randint(0, 8) / 4.0, rng.randint(0, 8) / 4.0,
                 rng.randint(1, 10) / 4.0, rng.randint(1, 10) / 4.0)
        b = rect(rng.randint(0, 8) / 4.0, rng.randint(0, 8) / 4.0,
                 rng.randint(1, 10) / 4.0, rng.randint(1, 10) / 4.0)
        ax0, ay0, ax1, ay1 = a[0, 0], a[0, 1], a[2, 0], a[2, 1]
        bx0, by0, bx1, by1 = b[0, 0], b[0, 1], b[2, 0], b[2, 1]
        iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
        ih = max(0.0, min(ay1, by1) - max(ay0, by0))
        # skip edge-touching pairs (collinear partial overlap carve-out)
        if (iw == 0.0 and ih > 0.0) or (ih == 0.0 and iw > 0.0):
            continue
        want = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - iw * ih
        assert total_area(K.union_overlay([[a], [b]])) == want


def test_overlay_two_ops():
    A, B = [[rect(0, 0, 2, 2)]], [[rect(1, 1, 2, 2)]]
    want = {
        "union": (1, 7.0),
        "intersection": (1, 1.0),
        "difference": (1, 3.0),
        "symdiff": (2, 6.0),
    }
    for op, (n, ar) in want.items():
        u = K.overlay_two(A, B, op)
        assert (len(u), total_area(u)) == (n, ar), op
    # difference punches a hole
    u = K.overlay_two([[rect(0, 0, 4, 4)]], [[rect(1, 1, 1, 1)]], "difference")
    assert len(u) == 1 and len(u[0]) == 2 and total_area(u) == 15.0
    # erased entirely / disjoint intersection -> empty
    assert K.overlay_two(A, [[rect(-1, -1, 4, 4)]], "difference") == []
    assert K.overlay_two(A, [[rect(5, 5, 1, 1)]], "intersection") == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        K.overlay_two(A, B, "buffer")


def test_overlay_two_point_coverage_random():
    rng = np.random.RandomState(3)
    for trial in range(15):
        A = [[rect(rng.randint(0, 12) / 4.0, rng.randint(0, 12) / 4.0,
                   rng.randint(1, 10) / 4.0, rng.randint(1, 10) / 4.0)]
             for _ in range(rng.randint(1, 3))]
        B = [[rect(rng.randint(0, 12) / 4.0, rng.randint(0, 12) / 4.0,
                   rng.randint(1, 10) / 4.0, rng.randint(1, 10) / 4.0)]
             for _ in range(rng.randint(1, 3))]
        ops = {
            "union": lambda a, b: a or b,
            "intersection": lambda a, b: a and b,
            "difference": lambda a, b: a and not b,
            "symdiff": lambda a, b: a != b,
        }
        probes = np.arange(-0.5, 6.5, 0.25) + 0.125
        for op, pred in ops.items():
            u = K.overlay_two(A, B, op)
            for px in probes[::2]:
                for py in probes[::2]:
                    pt = (px, py)
                    assert covers(u, pt) == pred(covers(A, pt), covers(B, pt)), (
                        trial, op, pt,
                    )
