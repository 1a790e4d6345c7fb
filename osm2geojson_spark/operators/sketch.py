"""Cardinality sketching — the deterministic Theta-sampling distinct-count
estimator.

Exact ``count(DISTINCT x)`` over 100 TB is a full shuffle of every distinct
value; planners (dedup sizing, join-strategy choice, stratified-sample rate
fitting) only need a few-percent estimate. The fixed-threshold Theta sketch
(the sampling mode of the Theta-sketch family, Dasgupta et al. 2016) keeps
exactly the values whose hash falls below a threshold tau and scales the
surviving distinct count back up:

    est = n_sampled * (H_MOD / tau)

Because the hash is the engine's own congruential ``sampling.sample_hash``
(total, deterministic, engine-identical) the sketch is a PURE FUNCTION of
the value set: the survivor set, the exact ``n_sampled`` int64, and the one
float op of the estimate all hash-match a serial oracle — unlike HLL/KMV
implementations whose merge order leaks in. Survivor sets with the same tau
merge by union (distinct again) — partition-, stream-, and cluster-size-
independent.

Scale shape: scan -> hash filter (keeps ~tau/H_MOD of rows BEFORE any
shuffle) -> distinct on survivors only -> per-group count. The shuffle
carries a 1/rate fraction of the data; accuracy is ~1/sqrt(n_sampled)
(choose tau so hot groups sample >= ~10k values). No per-group state grows
with cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _H_MOD, sample_hash, sample_hash_sql


def theta_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tau: int,
) -> DataFrame:
    """Per-group distinct-count estimate: (*group_cols, n_sampled, est)
    with ``n_sampled`` the EXACT number of distinct values whose
    sample_hash < ``tau`` and ``est = round(n_sampled * H_MOD / tau, 3)``
    (one multiply + divide on exact integers — identical in the SQL
    twin). Empty groups simply don't appear (no survivors)."""
    assert 0 < tau <= _H_MOD
    surv = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .filter(sample_hash(F.col("_v")) < F.lit(tau))
        .distinct()
    )
    est = F.round(
        (F.count(F.lit(1)).cast("long") * F.lit(_H_MOD)).cast("double")
        / F.lit(float(tau)),
        3,
    ) + F.lit(0.0)
    return surv.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        est.alias("est"),
    )


def theta_distinct_sql(
    rows_cte: str, group_cols: list[str], value_col: str, tau: int
) -> str:
    """DuckDB twin — same hash gate, same distinct, same float assembly.
    ``rows_cte`` must yield the group columns and ``value_col``."""
    g = ", ".join(group_cols)
    h = sample_hash_sql(value_col)
    return f"""
WITH r AS ({rows_cte}),
surv AS (
  SELECT DISTINCT {g}, {value_col} AS _v FROM r WHERE {h} < {tau}
)
SELECT {g}, CAST(count(*) AS BIGINT) AS n_sampled,
       round(CAST(CAST(count(*) AS BIGINT) * {_H_MOD} AS DOUBLE)
             / {float(tau)!r}, 3) + 0.0 AS est
FROM surv GROUP BY {g}
"""
