"""MinHash / SimHash primitives with exact Spark <-> DuckDB parity.

All hashing is anchored on md5 (identical across engines) followed by pure
int64 modular arithmetic chosen to never overflow:

    base     = CAST('0x' + md5(s)[:15] AS BIGINT)     (60-bit positive)
    hm       = base % 2^30
    minhash_i = (A_i * hm + B_i) % P31,   P31 = 2147483647 (2^31 - 1)
    A_i * hm < 2^31 * 2^30 = 2^61 < int64 max  -> exact everywhere

Shingles are character 4-grams of the normalized text; tokens are the
whitespace words of the normalized text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as TXT

P31 = 2147483647
M30 = 1 << 30

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS

# fixed odd multipliers / offsets (any fixed constants define the operator)
MINHASH_A = [1299721 + 2 * i * 15485863 % (P31 - 1) | 1 for i in range(N_MINHASH)]
MINHASH_B = [(7919 * (i + 1) * 104729) % P31 for i in range(N_MINHASH)]

SIMHASH_BITS = 32
SHINGLE_K = 4


# -------------------------------------------------------------- shingles


def shingles_col(text: Column, k: int = SHINGLE_K) -> Column:
    """array<string> of character k-grams over the normalized text (distinct,
    keeping first occurrence order irrelevant — set semantics downstream)."""
    t = TXT.normalize_col(text)
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(t, F.lit(0) + i, k))
    return F.array_distinct(grams)


def shingles_sql(text: str, k: int = SHINGLE_K) -> str:
    t = TXT.normalize_sql(text)
    return (
        f"list_distinct(list_transform(range(1, greatest(length({t}) - {k - 1}, 1) + 1),"
        f" i -> substr({t}, CAST(i AS INTEGER), {k})))"
    )


def tokens_col(text: Column) -> Column:
    t = TXT.normalize_col(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def tokens_sql(text: str) -> str:
    t = TXT.normalize_sql(text)
    return f"CASE WHEN length({t}) = 0 THEN [] ELSE str_split({t}, ' ') END"


# --------------------------------------------------------------- minhash


def minhash_expr(hm: Column, i: int) -> Column:
    return (F.lit(MINHASH_A[i]) * hm + F.lit(MINHASH_B[i])) % F.lit(P31)


def minhash_sql(hm: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * {hm} + {MINHASH_B[i]}) % {P31})"


def shingle_hm_col(shingle: Column) -> Column:
    return TXT.md5_long(shingle) % F.lit(M30)


def shingle_hm_sql(shingle: str) -> str:
    return f"({TXT.md5_long_sql(shingle)} % {M30})"


def minhash_signature(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, mh0..mh15) — one row per document.

    Computed NARROWLY: each min runs over the row's own shingle array
    (``array_min(transform(...))``), so the signature needs no explode +
    groupBy shuffle at all — per-row work is identical to the exploded
    formulation and the result is value-identical (same hash exprs, min over
    the same set). Null-text rows are dropped, matching the explode
    formulation (explode of null emits nothing)."""
    sh = shingles_col(F.col(text_col))
    d = df.filter(F.col(text_col).isNotNull()).select(F.col(id_col), sh.alias("_sh"))
    d = d.select(
        id_col, F.transform(F.col("_sh"), lambda s: shingle_hm_col(s)).alias("_hm")
    )
    mins = [
        F.array_min(F.transform(F.col("_hm"), lambda h: minhash_expr(h, i))).alias(
            f"mh{i}"
        )
        for i in range(N_MINHASH)
    ]
    return d.select(F.col(id_col), *mins)


def minhash_signature_sql(table: str, id_col: str, text_col: str) -> str:
    hm = shingle_hm_sql("sh")
    mins = ", ".join(f"min({minhash_sql(hm, i)}) AS mh{i}" for i in range(N_MINHASH))
    return (
        f"SELECT {id_col}, {mins} FROM "
        f"(SELECT {id_col}, unnest({shingles_sql(text_col)}) AS sh FROM {table}) "
        f"GROUP BY {id_col}"
    )


def band_hash_col(df_cols_prefix: str = "mh") -> list[Column]:
    """One md5-string band key per band over the signature columns."""
    out = []
    for b in range(N_BANDS):
        cols = [
            F.col(f"{df_cols_prefix}{b * ROWS_PER_BAND + r}").cast("string")
            for r in range(ROWS_PER_BAND)
        ]
        out.append(F.md5(F.concat_ws("_", *cols)).alias(f"band{b}"))
    return out


def band_hash_sql() -> list[str]:
    out = []
    for b in range(N_BANDS):
        cols = " || '_' || ".join(
            f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        out.append(f"md5({cols}) AS band{b}")
    return out


# --------------------------------------------------------------- simhash


def token_h32_col(token: Column) -> Column:
    return TXT.md5_long(token) % F.lit(1 << SIMHASH_BITS)


def token_h32_sql(token: str) -> str:
    return f"({TXT.md5_long_sql(token)} % {1 << SIMHASH_BITS})"


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 32-bit simhash over token hashes."""
    ex = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).withColumn("h", token_h32_col(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when((F.col("h").bitwiseAND(F.lit(1 << b))) != 0, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = ex.groupBy(id_col).agg(*bit_sums)
    sh = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sh = sh + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return agg.select(F.col(id_col), sh.alias("simhash"))


def simhash_sql(table: str, id_col: str, text_col: str) -> str:
    h = token_h32_sql("tok")
    sums = ", ".join(
        f"sum(CASE WHEN ({h} & {1 << b}) != 0 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return (
        f"SELECT {id_col}, ({bits}) AS simhash FROM "
        f"(SELECT {id_col}, {sums} FROM "
        f"(SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok FROM {table}) "
        f"GROUP BY {id_col})"
    )


def shingles_from_norm_col(norm: Column, k: int = SHINGLE_K) -> Column:
    """shingles_col's gram builder over an ALREADY-normalized column.
    Use when the normalized text is materialized separately: inside a
    transform() lambda Catalyst re-evaluates the outer expression per
    ELEMENT, so shingling the raw-normalize expression costs one regex
    pass per gram (~500x) — project + materialize the normalization,
    then shingle with this."""
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(norm, F.lit(0) + i, k))
    return F.array_distinct(grams)
