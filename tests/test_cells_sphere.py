"""Spherical cube-face cell index tests (operators/cells_sphere.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators import cells_sphere as S


def _pts_df(spark, pts):
    return spark.createDataFrame(pts, "lon double, lat double")


def test_roundtrip_center(spark):
    """cell -> center -> cell is the identity at every face, pole and edge
    region (the center of a cell re-encodes to the same cell)."""
    rng = np.random.default_rng(5)
    pts = [(float(lo), float(la)) for lo, la in zip(
        rng.uniform(-180, 180, 300), rng.uniform(-89.9, 89.9, 300))]
    pts += [(0.0, 89.999), (0.0, -89.999), (179.99, 0.0), (-179.99, 0.0),
            (45.0, 35.26), (135.0, 35.26)]  # poles, antimeridian, cube corners
    df = _pts_df(spark, pts)
    res = 9
    # stage each step as a projected column: Catalyst inlines every Column
    # reference, so composing encode(center(encode(...))) as ONE expression
    # tree explodes; staged projections (non-cheap, multi-referenced) are
    # kept as separate projects — same pattern as text_features
    s1 = df.select(S.sphere_cell_id(F.col("lon"), F.col("lat"), res).alias("c"))
    clon, clat = S.sphere_cell_center(F.col("c"), res)
    s2 = s1.select("c", clon.alias("clon"), clat.alias("clat"))
    # compare driver-side: a Filter(c != c2) on top would be predicate-
    # pushdown-inlined through all three projection layers, re-expanding the
    # staged expressions into one pathological tree
    rows = s2.select(
        "c", S.sphere_cell_id(F.col("clon"), F.col("clat"), res).alias("c2")
    ).collect()
    assert all(r["c"] == r["c2"] for r in rows)


def test_parent_contains_children(spark):
    rng = np.random.default_rng(6)
    pts = [(float(lo), float(la)) for lo, la in zip(
        rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200))]
    df = _pts_df(spark, pts)
    c12 = S.sphere_cell_id(F.col("lon"), F.col("lat"), 12)
    c7 = S.sphere_cell_id(F.col("lon"), F.col("lat"), 7)
    rows = df.select(
        S.sphere_parent(c12, 12, 7).alias("p"), c7.alias("c7")
    ).collect()
    assert all(r["p"] == r["c7"] for r in rows)


def test_k_ring_crosses_faces(spark):
    """A point near a cube edge / corner / pole gets a full neighborhood:
    the ring contains the cells of perturbed points in every direction —
    including directions that cross onto other faces."""
    res = 7
    cases = [
        (45.0, 0.0),       # cube edge (between +x and +y faces)
        (45.0, 35.2),      # near a cube corner
        (0.0, 89.9),       # pole (on the +z face, far from its center)
        (-135.0, -35.3),   # another corner region
    ]
    step = 90.0 / (1 << res)  # ~one cell width in face angle terms
    for lon0, lat0 in cases:
        probes = [
            (lon0 + dx * step, max(-89.99, min(89.99, lat0 + dy * step)))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
        df = _pts_df(spark, [(lon0, lat0)])
        ring = df.select(
            S.sphere_k_ring(
                S.sphere_cell_id(F.col("lon"), F.col("lat"), res), res, k=2
            ).alias("ring")
        ).collect()[0]["ring"]
        pdf = _pts_df(spark, probes).select(
            S.sphere_cell_id(F.col("lon"), F.col("lat"), res).alias("c")
        ).collect()
        probe_cells = {r["c"] for r in pdf}
        missing = probe_cells - set(ring)
        assert not missing, (lon0, lat0, missing)


def test_area_uniformity_beats_flat_grid(spark):
    """The quadratic cube-face cells stay within ~2.1x min/max area over the
    sphere; the flat equirectangular grid degenerates at the poles. Cell
    'population share' of uniform sphere points is the proxy: encode many
    uniform-on-sphere points at a coarse res and compare occupancy spread."""
    rng = np.random.default_rng(7)
    n = 200_000
    # uniform on the sphere: z ~ U(-1,1), lon ~ U(-180,180)
    z = rng.uniform(-1, 1, n)
    lat = np.degrees(np.arcsin(z))
    lon = rng.uniform(-180, 180, n)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    res = 3  # 6*64 = 384 sphere cells, ~520 pts/cell expected
    counts = (
        df.select(S.sphere_cell_id(F.col("lon"), F.col("lat"), res).alias("c"))
        .groupBy("c").count().collect()
    )
    occ = sorted(r["count"] for r in counts)
    # every sphere cell is populated and the spread is bounded (~2.1 area
    # ratio + sampling noise)
    assert len(occ) == 6 * (1 << res) * (1 << res)
    assert occ[-1] / occ[0] < 3.5
    # flat grid at a comparable cell count: polar rows are near-empty
    from osm2geojson_spark.operators import cells as FLAT

    fcounts = (
        df.select(FLAT.cell_id(F.col("lon"), F.col("lat"), 5).alias("c"))
        .groupBy("c").count().collect()
    )
    focc = sorted(r["count"] for r in fcounts)
    assert focc[-1] / focc[0] > 10  # equirect spread is an order worse


def test_sql_twin_matches(spark):
    """DuckDB evaluates the identical encoding for the same points."""
    import duckdb

    rng = np.random.default_rng(8)
    pts = [(float(lo), float(la)) for lo, la in zip(
        rng.uniform(-180, 180, 500), rng.uniform(-90, 90, 500))]
    df = _pts_df(spark, pts)
    got = [
        r["c"]
        for r in df.select(
            S.sphere_cell_id(F.col("lon"), F.col("lat"), 9).alias("c")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    exp = [
        r[0]
        for r in con.sql(
            f"SELECT {S.sphere_cell_id_sql('lon', 'lat', 9)} FROM p"
        ).fetchall()
    ]
    assert got == exp


def test_sql_twin_parity_near_face_edges(spark):
    """Stress Spark-vs-DuckDB encode parity exactly where a 1-ulp trig
    difference could flip a cell: points packed close to cube-face edges,
    corners and the poles."""
    import duckdb

    pts = []
    eps = [0.0, 1e-9, -1e-9, 1e-6, -1e-6]
    for base_lon in (-135.0, -45.0, 45.0, 135.0, 180.0, 0.0):
        for e in eps:
            pts.append((base_lon + e, 10.0))
            pts.append((base_lon + e, 35.264389682754654 + e))  # corner lat
    for e in eps:
        pts.append((0.0 + e, 90.0 - abs(e)))
        pts.append((0.0 + e, -90.0 + abs(e)))
    df = _pts_df(spark, pts)
    got = [
        r["c"]
        for r in df.select(
            S.sphere_cell_id(F.col("lon"), F.col("lat"), 12).alias("c")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    exp = [
        r[0]
        for r in con.sql(
            f"SELECT {S.sphere_cell_id_sql('lon', 'lat', 12)} FROM p"
        ).fetchall()
    ]
    assert got == exp
