"""Deterministic synthetic image+caption table (the BASELINE.json input_hint
payload: 10^12-row notional scale, small-scale here).

Schema (exact input_hint shape):
    image_id string, bytes binary, w int, h int, fmt string,
    caption string, phash bigint

``phash`` is the perceptual-hash stand-in that the spatial layer decodes to a
(lon, lat) point: the point is quantized to 31+31 bits,

    lon_q = floor((lon+180)/360 * 2^31),  lat_q = floor((lat+90)/180 * 2^31)
    phash = lat_q * 2^31 + lon_q

and decoding returns bin centers. Encoding/decoding are closed-form integer
arithmetic, so they run JVM-side as column expressions AND have byte-identical
ANSI-SQL equivalents for the DuckDB oracle.

Point placement is a seedless modular-arithmetic sequence of the row index
(exact in int64 for n < 2^31, identical in Spark and DuckDB), uniform over a
configurable bbox so spatial joins against fixture polygons have known
answers.

All generation is distributed: ``spark.range(n)`` + column expressions; only
the pixel/zlib encode runs in an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import imagecodec

Q = 1 << 31
_LON_M1, _LON_M2 = 2654435761, 1000003
_LAT_M1, _LAT_M2 = 2246822519, 999983

WORLD_BBOX = (-180.0, -90.0, 180.0, 90.0)


# ------------------------------------------------------------ point <-> i


def lon_expr(i: Column, bbox=WORLD_BBOX) -> Column:
    lo, _, hi, _ = bbox
    u = (i * F.lit(_LON_M1) % F.lit(_LON_M2)).cast("double") / F.lit(float(_LON_M2))
    return F.lit(lo) + F.lit(hi - lo) * u


def lat_expr(i: Column, bbox=WORLD_BBOX) -> Column:
    _, lo, _, hi = bbox
    u = ((i * F.lit(_LAT_M1) + F.lit(7)) % F.lit(_LAT_M2)).cast("double") / F.lit(float(_LAT_M2))
    return F.lit(lo) + F.lit(hi - lo) * u


def lon_sql(i: str, bbox=WORLD_BBOX) -> str:
    # parenthesized exactly like lon_expr so both engines run the identical
    # IEEE op sequence: lo + range * (m / M)
    lo, _, hi, _ = bbox
    return f"({lo} + ({hi} - {lo}) * ((({i} * {_LON_M1}) % {_LON_M2}) / {_LON_M2}.0))"


def lat_sql(i: str, bbox=WORLD_BBOX) -> str:
    _, lo, _, hi = bbox
    return f"({lo} + ({hi} - {lo}) * ((({i} * {_LAT_M1} + 7) % {_LAT_M2}) / {_LAT_M2}.0))"


# ------------------------------------------------------------ phash codec


def phash_encode(lon: Column, lat: Column) -> Column:
    lon_q = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(Q)))
    lat_q = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(Q)))
    lon_q = F.least(F.lit(Q - 1), F.greatest(F.lit(0), lon_q)).cast("long")
    lat_q = F.least(F.lit(Q - 1), F.greatest(F.lit(0), lat_q)).cast("long")
    return lat_q * F.lit(Q) + lon_q


def phash_lon(phash) -> Column:
    """Decoded bin-center longitude."""
    phash = F.col(phash) if isinstance(phash, str) else phash
    return ((phash % F.lit(Q)).cast("double") + F.lit(0.5)) / F.lit(float(Q)) * F.lit(360.0) - F.lit(180.0)


def phash_lat(phash) -> Column:
    phash = F.col(phash) if isinstance(phash, str) else phash
    # shiftright, not double division: phash can exceed 2^53
    return (F.shiftright(phash, 31).cast("double") + F.lit(0.5)) / F.lit(float(Q)) * F.lit(180.0) - F.lit(90.0)


def phash_encode_sql(lon: str, lat: str) -> str:
    lon_q = f"least({Q - 1}, greatest(0, CAST(floor(({lon} + 180.0) / 360.0 * {Q}.0) AS BIGINT)))"
    lat_q = f"least({Q - 1}, greatest(0, CAST(floor(({lat} + 90.0) / 180.0 * {Q}.0) AS BIGINT)))"
    return f"({lat_q} * {Q} + {lon_q})"


def phash_lon_sql(phash: str) -> str:
    return f"((({phash}) % {Q} + 0.5) / {Q}.0 * 360.0 - 180.0)"


def phash_lat_sql(phash: str) -> str:
    return f"(((({phash}) // {Q}) + 0.5) / {Q}.0 * 180.0 - 90.0)"


# ------------------------------------------------------------- the table


@pandas_udf(T.BinaryType())
def _encode_image_udf(i: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    out = []
    for idx, ww, hh in zip(i, w, h):
        out.append(imagecodec.encode_rawz(imagecodec.synth_pixels(int(idx), int(ww), int(hh))))
    return pd.Series(out)


def synthetic_images(
    spark: SparkSession,
    n: int,
    bbox=WORLD_BBOX,
    num_partitions: int | None = None,
    with_bytes: bool = True,
) -> DataFrame:
    """The image+caption payload table at the input_hint schema."""
    df = spark.range(0, n, numPartitions=num_partitions)
    i = F.col("id")
    sizes = [16, 32, 64]
    w = (
        F.when(i % 3 == 0, sizes[0]).when(i % 3 == 1, sizes[1]).otherwise(sizes[2])
    ).cast("int")
    lon = lon_expr(i, bbox)
    lat = lat_expr(i, bbox)
    df = df.select(
        F.format_string("img%012d", i).alias("image_id"),
        i.alias("_i"),
        w.alias("w"),
        w.alias("h"),
        F.lit("rawz").alias("fmt"),
        F.concat(F.lit("caption for img"), i.cast("string")).alias("caption"),
        phash_encode(lon, lat).alias("phash"),
    )
    if with_bytes:
        df = df.withColumn("bytes", _encode_image_udf(F.col("_i"), F.col("w"), F.col("h")))
    else:
        df = df.withColumn("bytes", F.lit(None).cast("binary"))
    return df.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "_i")
