"""Scaled synthetic OSM corpus through the full conversion pipeline:
closed-form ground truth at any n_rel (the bench osm_convert workload)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from osm2geojson_spark.functions import geom as GEO
from osm2geojson_spark.functions import kernels as K
from osm2geojson_spark.plans.pipeline import build_features
from osm2geojson_spark.sources.synthetic import synthetic_osm_frames


def test_synthetic_corpus_conversion(spark):
    n_rel = 300
    frames = synthetic_osm_frames(spark, n_rel)
    features, failures = build_features(spark, frames, materialize="cache")

    # every node is consumed by a way, every way by its relation -> the
    # used-refs anti join leaves exactly the relations
    rows = features.collect()
    assert len(rows) == n_rel
    assert failures.filter(F.col("reason") != "unsupported_type").count() == 0

    for r in rows:
        nrel = r["id"] - 2_000_000_000
        t, payload = GEO.decode(bytes(r["gpb"]))
        assert t == GEO.GTYPE_MULTIPOLYGON
        assert len(payload) == 1
        rings = payload[0]
        assert len(rings) == (2 if nrel % 2 == 0 else 1)
        wd = 0.2 + (nrel % 3) * 0.05
        ht = 0.2 + (nrel % 5) * 0.02
        want = wd * ht - (0.05**2 if nrel % 2 == 0 else 0.0)
        area = abs(K.signed_area(rings[0])) - sum(
            abs(K.signed_area(h)) for h in rings[1:]
        )
        assert abs(area - want) < 1e-9, (nrel, area, want)
        # RFC 7946 orientation: exterior CCW, holes CW
        assert K.signed_area(rings[0]) > 0
        for h in rings[1:]:
            assert K.signed_area(h) < 0
