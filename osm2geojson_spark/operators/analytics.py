"""Order-free analytics operators: the 2-D skyline (Pareto frontier).

The skyline of a point set under (minimize x, minimize y) is the set of
points not DOMINATED by any other: p' dominates p iff x' <= x and
y' <= y and p' != p as a value pair. It is the classic multi-criteria
shortlist query (Borzsony/Kossmann/Stocker 2001): "cheapest AND
smallest", "freshest AND highest-quality" — every training-data curation
tradeoff gate is a skyline.

Spark-first shape (two phases):

1. PRUNE — the skyline of a deterministic hash-sample is computed first
   (tiny), broadcast, and every input row dominated by a sample skyline
   point is dropped with one broadcast theta-join. On thick data this
   removes almost everything: a single sample point near the frontier
   dominates the entire quadrant above-right of it. The sample gate is
   ``sampling.sample_hash`` — no RNG, the pruned set is a pure function
   of the data.
2. EXACT — the survivors (frontier + a thin sample-slack band) go
   through the sort-based sweep: order by (x asc, y asc), a point is
   dominated iff min(y) over STRICTLY-PRECEDING rows <= its y. One
   window over the survivor set. The global orderBy is the honest cost:
   it runs on the post-prune residue, not the input (the frontier of
   anti-correlated 100 TB data is inherently a global object).

Both phases are exact integer/float comparisons — no epsilon. The
DuckDB twin deliberately uses the OTHER classic formulation (NOT EXISTS
dominance anti-join), so the two engines agree through independent
algorithms, not shared code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _H_MOD, sample_hash, sample_hash_sql


def _sweep_skyline(pts: DataFrame) -> DataFrame:
    """Exact skyline of distinct (x, y) pairs via the sorted sweep."""
    w = (
        Window.orderBy(F.col("x").asc(), F.col("y").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_min = F.min("y").over(w)
    return pts.withColumn("_pm", prev_min).filter(
        F.col("_pm").isNull() | (F.col("_pm") > F.col("y"))
    ).drop("_pm")


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    sample_rate: float = 0.02,
) -> DataFrame:
    """(x, y, n_points, min_id) — the 2-D skyline under (min x, min y),
    one row per distinct frontier value pair, with the exact number of
    input rows carrying that pair and the smallest id among them.

    ``sample_rate`` sizes the phase-1 prune sample; any rate (including
    0) gives the same answer — it only moves work between the broadcast
    prune and the exact sweep."""
    pts = (
        df.select(
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min("_id").alias("min_id"),
        )
    )
    thr = int(sample_rate * _H_MOD)
    if thr > 0:
        samp = pts.filter(sample_hash(F.col("min_id")) < F.lit(thr))
        sky_s = _sweep_skyline(samp.select("x", "y")).select(
            F.col("x").alias("sx"), F.col("y").alias("sy")
        )
        # drop rows strictly dominated by a sample-frontier point; the
        # sample points themselves survive their own prune (equal pair
        # is not dominated) and every true frontier point survives all
        # of them, so phase 2 sees frontier + slack only
        dominated = (
            (F.col("sx") <= F.col("x"))
            & (F.col("sy") <= F.col("y"))
            & ((F.col("sx") < F.col("x")) | (F.col("sy") < F.col("y")))
        )
        pts = pts.join(F.broadcast(sky_s), on=dominated, how="left_anti")
    return _sweep_skyline(pts)


def skyline2d_sql(rows_cte: str, x: str, y: str, id_col: str) -> str:
    """DuckDB twin — NOT EXISTS dominance over the distinct value pairs
    (independent algorithm; same answer)."""
    return f"""
WITH r AS ({rows_cte}),
pts AS (
  SELECT {x} AS x, {y} AS y, CAST(count(*) AS BIGINT) AS n_points,
         min({id_col}) AS min_id
  FROM r GROUP BY {x}, {y}
)
SELECT x, y, n_points, min_id FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y)
)
"""
