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
