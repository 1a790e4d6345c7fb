"""Distributed geometry post-processing over GPB binary columns.

The reference (aspectumapp/osm2geojson) delegates geometry math to shapely
and never simplifies; this module is engine-extension surface for the
tile-serving stage: simplify assembled features BEFORE the GeoJSON sink or
a per-zoom tile write (tolerance per zoom level), cutting payload bytes
where full vertex fidelity is invisible.

All processing is Arrow-batched mapInPandas over the packed-binary geometry
codec (functions/geom.py) — no Python-per-row UDFs, no shapely.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import geom
from ..functions import kernels as K


def simplify_gpb(buf: bytes, tolerance: float) -> bytes:
    """Douglas-Peucker simplification of one GPB geometry (degrees
    tolerance). Points pass through; rings never degenerate below a
    triangle (kernels.dp_simplify_ring)."""
    g = geom.to_geojson_geometry(buf)
    t = g["type"]

    def line(c):
        return K.dp_simplify(np.asarray(c, dtype=np.float64), tolerance)

    def ring(c):
        return K.dp_simplify_ring(np.asarray(c, dtype=np.float64), tolerance)

    if t == "LineString":
        return geom.linestring(line(g["coordinates"]))
    if t == "MultiLineString":
        return geom.multilinestring([line(c) for c in g["coordinates"]])
    if t == "Polygon":
        return geom.polygon([ring(c) for c in g["coordinates"]])
    if t == "MultiPolygon":
        return geom.multipolygon(
            [[ring(c) for c in poly] for poly in g["coordinates"]]
        )
    return bytes(buf)  # Point / empty: nothing to simplify


def simplify_geometries(
    df: DataFrame, tolerance: float, gpb_col: str = "gpb"
) -> DataFrame:
    """Simplify a GPB geometry column in place (schema unchanged) — one
    Arrow pass, embarrassingly parallel, no shuffle."""
    fields = df.schema.fields
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[gpb_col] = [
                None if b is None else simplify_gpb(bytes(b), tolerance)
                for b in pdf[gpb_col]
            ]
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)
