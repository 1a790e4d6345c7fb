"""Cell-partitioned layout: partition pruning reaches the scan, data round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2geojson_spark.operators import cells
from osm2geojson_spark.plans import layout
from osm2geojson_spark.sources import synthetic as SYN


def test_partitioned_write_and_pruning(spark, tmp_path):
    path = str(tmp_path / "imgs_part")
    imgs = SYN.synthetic_images(spark, 2000, with_bytes=False)
    layout.write_images_partitioned(imgs, path, coarse_res=2)

    full = spark.read.parquet(path)
    assert full.count() == 2000

    # pick the busiest coarse cell and prune to it
    top = (
        full.groupBy(layout.PARTITION_COL).count().orderBy(F.desc("count")).first()
    )
    pruned = layout.read_images_for_cells(spark, path, [top[layout.PARTITION_COL]])
    assert pruned.count() == top["count"]

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pcell" in plan
    # the partition predicate must NOT appear as a post-scan data filter
    assert plan.count("PushedFilters: []") >= 1

    # round-trip: partition column equals the recomputed coarse cell
    re = pruned.withColumn(
        "expect",
        cells.cell_id(SYN.phash_lon(F.col("phash")), SYN.phash_lat(F.col("phash")), 2),
    )
    assert re.filter(F.col("expect") != F.col(layout.PARTITION_COL)).count() == 0


# ----------------------------------------------------------------- geohash


def _ref_geohash(lon, lat, precision):
    """Textbook interval-halving geohash encoder (public algorithm,
    written fresh as the test oracle — no bit arithmetic shared with the
    column implementation)."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, ch, out, even = 0, 0, [], True
    while len(out) < precision:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon >= mid:
                ch, lon_r[0] = ch * 2 + 1, mid
            else:
                ch, lon_r[1] = ch * 2, mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                ch, lat_r[0] = ch * 2 + 1, mid
            else:
                ch, lat_r[1] = ch * 2, mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_key_matches_interval_halving_reference(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.cells import geohash_key

    assert _ref_geohash(-5.6, 42.6, 5) == "ezs42"  # canonical example
    rng = np.random.default_rng(2)
    pts = [(i, float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90))) for i in range(150)]
    pts += [(1000, -5.6, 42.6), (1001, 0.0, 0.0), (1002, -180.0, -90.0), (1003, 179.999, 89.999)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    for p in (1, 6, 12):
        got = {
            r["id"]: r["gh"]
            for r in df.select(
                "id", geohash_key(F.col("lon"), F.col("lat"), p).alias("gh")
            ).collect()
        }
        for i, lon, lat in pts:
            assert got[i] == _ref_geohash(lon, lat, p), (p, i)


def test_geohash_prefix_is_spatial_containment(spark):
    """The defining layout property: points sharing a geohash prefix are
    in the same coarser geohash cell — prefix(gh6, 3) == gh3."""
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.cells import geohash_key

    df = spark.range(500).select(
        (F.col("id") * 0.7 - 175).alias("lon"), (F.col("id") * 0.35 - 87).alias("lat")
    )
    bad = df.select(
        geohash_key(F.col("lon"), F.col("lat"), 6).alias("g6"),
        geohash_key(F.col("lon"), F.col("lat"), 3).alias("g3"),
    ).filter(F.substring("g6", 1, 3) != F.col("g3"))
    assert bad.count() == 0
