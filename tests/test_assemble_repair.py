"""Call-site repair semantics: buffer(0)-style fixes must keep EVERY
repaired piece (the reference's shapely buffer(0) returns a MultiPolygon
with all loops — main.py:264-270), at both the closed-way and the
relation-member call sites."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osm2geojson_spark.functions import geom
from osm2geojson_spark.functions import kernels as K
from osm2geojson_spark.operators.assemble import (
    _coords_to_bin,
    _lines_to_multipolygon,
    way_gpb_udf,
)


def _pentagram() -> np.ndarray:
    ang = np.pi / 2 + 2 * np.pi * (2 * np.arange(5)) / 5
    return K.close_ring(np.column_stack([np.cos(ang), np.sin(ang)]))


def test_self_intersecting_way_emits_all_repaired_loops(spark):
    """A pentagram closed way tagged as polygon must emit a MultiPolygon
    with all 6 simple loops, not a single arbitrary fragment."""
    ring = _pentagram()
    df = spark.createDataFrame(
        [(1, bytearray(_coords_to_bin(ring)), True)],
        "way_id long, coords binary, is_poly boolean",
    )
    out = df.select(way_gpb_udf(F.col("coords"), F.col("is_poly")).alias("s"))
    row = out.select("s.gpb", "s.reason").collect()[0]
    assert row["reason"] is None
    gtype, polys = geom.decode(bytes(row["gpb"]))
    assert gtype == geom.GTYPE_MULTIPOLYGON
    assert len(polys) == 6
    for rings in polys:
        assert K.ring_is_simple(rings[0])
    # orientation repair applied: shells CCW (positive signed area)
    assert all(K.signed_area(rings[0]) > 0 for rings in polys)


def test_simple_way_still_emits_plain_polygon(spark):
    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    df = spark.createDataFrame(
        [(1, bytearray(_coords_to_bin(sq)), True)],
        "way_id long, coords binary, is_poly boolean",
    )
    row = df.select(way_gpb_udf(F.col("coords"), F.col("is_poly")).alias("s")).select(
        "s.gpb"
    ).collect()[0]
    gtype, _ = geom.decode(bytes(row["gpb"]))
    assert gtype == geom.GTYPE_POLYGON


def test_lines_to_multipolygon_keeps_all_repaired_pieces():
    """The relation-member path: one merged closed line that self-intersects
    (figure-eight) plus a plain square -> three polygons total (two split
    lobes + square), not two."""
    fig8 = np.array(
        [[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]]
    )
    square = np.array(
        [[10.0, 10.0], [14.0, 10.0], [14.0, 14.0], [10.0, 14.0], [10.0, 10.0]]
    )
    polys = _lines_to_multipolygon([fig8, square])
    assert polys is not None
    assert len(polys) == 3
    for rings in polys:
        assert K.ring_is_simple(rings[0])
