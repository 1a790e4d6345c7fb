"""E5 salted-key skew handling: salted join == plain join, and heavy cells
actually fan out across salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2geojson_spark.plans import skew


def _frames(spark):
    # 5000 points: 80% land in hot cell 7, the rest spread over cells 0-99
    big = spark.range(0, 5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 5 < 4, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("cell_id"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("cell_id"), (F.col("id") * 10).alias("payload")
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _frames(spark)
    plain = big.join(small, "cell_id").select("row_id", "payload")
    salted = skew.salted_cell_join(
        big, small, cell_col="cell_id", threshold=1000, n_salts=8, salt_src="row_id"
    ).select("row_id", "payload")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_heavy_cell_fans_out_across_salts(spark):
    big, _ = _frames(spark)
    hitters = skew.heavy_cells(big, "cell_id", threshold=1000)
    assert hitters == [7]
    salted = skew.salt_big_side(big, "cell_id", hitters, n_salts=8, salt_src="row_id")
    per_salt = (
        salted.filter(F.col("cell_id") == 7).groupBy("salt").count().collect()
    )
    assert len(per_salt) == 8  # hot cell split across all salts
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 4000 * 0.5  # no salt holds a majority
    # light cells stay unsalted
    assert (
        salted.filter((F.col("cell_id") != 7) & (F.col("salt") != 0)).count() == 0
    )


def test_small_side_replication(spark):
    _, small = _frames(spark)
    rep = skew.replicate_small_side(small, "cell_id", hitters=[7], n_salts=8)
    assert rep.filter(F.col("cell_id") == 7).count() == 8
    assert rep.filter(F.col("cell_id") != 7).count() == 99
