"""One pinned scaling measurement: the full production job — per-row payload
decode (the E7 invariant path) -> phash point decode -> cell-sharded PIP join
-> tile rollup — over a pre-written parquet image table.

Usage: taskset -c 0-<N-1> python tools/scaling_job.py <cpus> <table_path> <n>

Prints one JSON line {"cpus": N, "seconds": best-of-2, "rows_per_sec": R}.
The caller (scaling_run.py) pins the process tree to exactly N cores so a
"cluster of N cores" is physically true — local[N] alone undercounts because
Arrow UDF stages add N Python workers on top of the N JVM threads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cpus = int(sys.argv[1])
    path = sys.argv[2]
    n = int(sys.argv[3])
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from osm2geojson_spark.operators import cells
    from osm2geojson_spark.operators.multimodal import decode_stats
    from osm2geojson_spark.operators.spatial_join import (
        point_in_polygon_join,
        polygons_to_df,
    )
    from osm2geojson_spark.sources import synthetic as SYN

    boxes = E._nation_boxes(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    polys_df = polygons_to_df(spark, [(p, g) for p, g, *_ in boxes])

    def job() -> int:
        imgs = spark.read.parquet(path)
        ok = decode_stats(imgs).filter(F.col("decode_ok")).select("image_id")
        pts = imgs.select(
            "image_id",
            SYN.phash_lon(F.col("phash")).alias("lon"),
            SYN.phash_lat(F.col("phash")).alias("lat"),
        ).join(ok, "image_id")
        joined = point_in_polygon_join(pts.drop("image_id"), polys_df, res=7)
        return (
            joined.withColumn("tile", cells.cell_id(F.col("lon"), F.col("lat"), 9))
            .groupBy("poly_id", "tile")
            .agg(F.count("*").alias("n_images"))
            .count()
        )

    job()  # warm: codegen + Arrow worker pool
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        job()
        best = min(best, time.time() - t0)
    print(json.dumps({"cpus": cpus, "seconds": round(best, 2), "rows_per_sec": round(n / best, 1)}))


if __name__ == "__main__":
    main()
