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


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part_key",
    id_col: str = "file_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """SMALL-FILE COMPACTION PLANNER — group a manifest's files into
    rewrite bins of ~``target_bytes`` each, per table partition (the
    maintenance pass every long-lived cell-partitioned table needs: tile
    jobs and streaming commits leave many small files per pcell, and scan
    cost follows file count, not bytes).

    Packing rule: within a partition, order files bytes DESC (id ASC tie
    break) and assign ``bin_id = floor(running_bytes_before / target)`` —
    the same quota rule Spark's own FilePartition coalescing applies to
    splits. Bin COUNT is exactly ceil(partition_bytes / target) (the
    optimal lower bound); the tradeoff is that a bin can overshoot the
    target by up to its largest file. Fully deterministic and replayable
    as one SQL window — no sequential driver loop, unlike true
    first-fit-decreasing, which cannot be expressed as a combinable
    computation and would not scale past a single task per partition.

    Returns one row per file: (part_col, id_col, bytes_col, bin_id).

    Scale: ONE window shuffle keyed by the partition column; manifests
    are ~10^6 rows per 10^12-row table, so this is metadata-sized. Skewed
    partition file counts are bounded by the table's own partition
    granularity."""
    from pyspark.sql.window import Window

    assert target_bytes > 0
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(bytes_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(bytes_col).over(w), F.lit(0)).cast("double")
    return files.select(
        part_col, id_col, F.col(bytes_col).cast("long").alias(bytes_col)
    ).withColumn(
        "bin_id", F.floor(cum_before / F.lit(float(target_bytes))).cast("long")
    )
