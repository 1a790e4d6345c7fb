"""Explicit skew handling for cell-keyed joins (E5).

Dense urban cells dominate cell-keyed shuffles at planet scale. The
north-rule demands *explicit* handling, so AQE skew-join is kept enabled as
belt-and-braces but not relied upon:

1. a cheap pre-pass counts rows per cell on the big (point/image) side;
2. cells above ``threshold`` become heavy hitters (collected to the driver —
   bounded: the hitter list is capped, it's a top-N by definition);
3. big side: heavy rows get ``salt = pmod(hash(row_key), n_salts)``;
4. small side: heavy cells are replicated once per salt value
   (explode over a literal salt array);
5. the join key becomes (cell_id, salt) — light cells use salt 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_cells(df: DataFrame, cell_col: str, threshold: int, cap: int = 10_000) -> list[int]:
    rows = (
        df.groupBy(cell_col)
        .count()
        .filter(F.col("count") >= threshold)
        .orderBy(F.desc("count"))
        .limit(cap)
        .collect()
    )
    return [r[cell_col] for r in rows]


def salt_big_side(
    df: DataFrame, cell_col: str, hitters: list[int], n_salts: int, salt_src: str
) -> DataFrame:
    """Adds ``salt``: 0 for light cells, hash-distributed for heavy cells."""
    if not hitters:
        return df.withColumn("salt", F.lit(0))
    is_heavy = F.col(cell_col).isin(hitters)
    return df.withColumn(
        "salt",
        F.when(is_heavy, F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")).otherwise(
            F.lit(0)
        ),
    )


def replicate_small_side(
    df: DataFrame, cell_col: str, hitters: list[int], n_salts: int
) -> DataFrame:
    """Replicates heavy-cell rows once per salt; light rows keep salt 0."""
    if not hitters:
        return df.withColumn("salt", F.lit(0))
    is_heavy = F.col(cell_col).isin(hitters)
    salts = F.when(is_heavy, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
        F.array(F.lit(0))
    )
    return df.withColumn("salt", F.explode(salts))


def salted_cell_join(
    big: DataFrame,
    small: DataFrame,
    cell_col: str = "cell_id",
    threshold: int = 2_000_000,
    n_salts: int = 16,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on (cell_col, salt) with heavy-hitter salting."""
    salt_src = salt_src or big.columns[0]
    hitters = heavy_cells(big, cell_col, threshold)
    b = salt_big_side(big, cell_col, hitters, n_salts, salt_src)
    s = replicate_small_side(small, cell_col, hitters, n_salts)
    return b.join(s, [cell_col, "salt"], how).drop("salt")
