"""Classifier precedence unit tests — ported from the reference's
tests/test_polygon_logic.py (17 cases) and run against BOTH implementations:
the Python mirror and the Spark column expression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.functions.classify import (
    is_geometry_polygon,
    is_geometry_polygon_without_exceptions,
    polygon_flag_column,
)

# (tags, closed, expected) — closed=None when the element has no geometry/nodes
FULL_CASES = [
    ({}, None, False),
    ({"area": "no", "type": "multipolygon", "building": "yes"}, None, False),
    ({"area": "yes", "highway": "steps"}, None, True),
    ({"area": "no", "building": "yes"}, None, False),
    ({"area": "yes", "name": "Random Feature"}, None, True),
    ({"type": "multipolygon", "name": "Some relation"}, None, True),
    ({"type": "multipolygon", "highway": "steps"}, None, True),
    ({"building": "yes"}, False, False),  # open geometry
    ({"building": "yes"}, True, True),  # closed geometry
    ({"area": "unknown", "highway": "steps"}, None, False),
    # areaKeys veto (barrier-wall golden semantics)
    ({"barrier": "wall"}, True, False),
    # issue-52: highway=service closed way stays a line
    ({"highway": "service"}, True, False),
]

RULEBOOK_CASES = [
    ({"indoor": "yes", "highway": "steps"}, False),
    ({"highway": "trunk"}, False),
    ({"highway": "rest_area"}, True),
    ({"building": "yes"}, True),
    ({"natural": "coastline"}, False),
    ({"natural": "water"}, True),
    ({"name": "Something Random"}, False),
]


@pytest.mark.parametrize("tags,closed,expected", FULL_CASES)
def test_python_mirror(tags, closed, expected):
    assert is_geometry_polygon(tags, closed) is expected


@pytest.mark.parametrize("tags,expected", RULEBOOK_CASES)
def test_python_rulebook(tags, expected):
    assert is_geometry_polygon_without_exceptions(tags) is expected


def test_spark_column_all_cases(spark):
    rows = [
        (i, [(k, v) for k, v in tags.items()] or None, closed, expected)
        for i, (tags, closed, expected) in enumerate(FULL_CASES)
    ]
    df = spark.createDataFrame(
        rows, "i int, tags array<struct<k:string,v:string>>, closed boolean, expected boolean"
    )
    out = df.withColumn(
        "got", polygon_flag_column(F.col("tags"), F.col("closed"))
    ).collect()
    for r in out:
        assert r["got"] == r["expected"], f"case {r['i']}: {r['got']} != {r['expected']}"


def test_tag_order_sensitivity_of_exception(spark):
    """areaKeys veto uses the FIRST tag key present in areaKeys — tag
    insertion order is semantic (main.py:370-373). advertising=billboard is
    a truthy exception, aerialway=zzz a falsy one; whichever comes first
    decides, flipping the verdict."""
    a = [("advertising", "billboard"), ("aerialway", "zzz"), ("building", "yes")]
    b = [("aerialway", "zzz"), ("advertising", "billboard"), ("building", "yes")]
    assert is_geometry_polygon(a, True) is False
    assert is_geometry_polygon(b, True) is True
    df = spark.createDataFrame(
        [(1, a, True), (2, b, True)],
        "i int, tags array<struct<k:string,v:string>>, closed boolean",
    )
    out = {
        r["i"]: r["got"]
        for r in df.withColumn(
            "got", polygon_flag_column(F.col("tags"), F.col("closed"))
        ).collect()
    }
    assert out[1] is False and out[2] is True
