"""Physical table layout (SURVEY §4.2.1): cell-partitioned writes so spatial
predicates prune partitions at scan time, Morton-clustered within partitions
so range scans stay sequential.

This is the Iceberg-style layout over plain Parquet (no Iceberg jar in this
environment — the directory scheme `pcell=<coarse cell>` is exactly what an
Iceberg identity-partition spec would produce, so a real catalog slots in by
swapping the writer/reader calls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cells
from ..sources import synthetic as SYN

PARTITION_COL = "pcell"


def write_images_partitioned(
    images: DataFrame,
    path: str,
    coarse_res: int = 2,
    cluster_res: int = 9,
    mode: str = "overwrite",
    cluster: str = "morton",
) -> None:
    """Partition by coarse cell (phash-decoded point), cluster rows within
    each partition by a space-filling key over the fine cell — ``morton``
    (pure column expr) or ``hilbert`` (S2-style, better locality, Arrow
    UDF). One shuffle (the repartition), then sequential writes."""
    lon = SYN.phash_lon(F.col("phash"))
    lat = SYN.phash_lat(F.col("phash"))
    fine = cells.cell_id(lon, lat, cluster_res)
    key = (
        cells.hilbert_key(fine, cluster_res)
        if cluster == "hilbert"
        else cells.morton_key(fine, cluster_res)
    )
    df = images.withColumn(PARTITION_COL, cells.cell_id(lon, lat, coarse_res)).withColumn(
        "_mk", key
    )
    (
        df.repartition(F.col(PARTITION_COL))
        .sortWithinPartitions(PARTITION_COL, "_mk")
        .drop("_mk")
        .write.mode(mode)
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def read_images_for_cells(
    spark: SparkSession, path: str, coarse_cells: list[int]
) -> DataFrame:
    """Scan restricted to the given coarse cells — the filter is a partition
    predicate, so only those directories are read (PartitionFilters in the
    scan node; at 10^12 rows this is the difference between touching 1/16th
    of the table and all of it)."""
    df = spark.read.parquet(path)
    return df.filter(F.col(PARTITION_COL).isin([int(c) for c in coarse_cells]))
