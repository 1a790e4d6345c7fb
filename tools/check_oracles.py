"""Driver-style correctness check: run every queries() entry on Spark at a
given SF dir and compare against oracle_sql() via DuckDB (row count + schema
+ order-insensitive value comparison), mirroring CORRECTNESS_r{N}.json.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def df_to_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            results[name] = f"SPARK ERROR: {type(ex).__name__}: {str(ex)[:300]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only: {len(srows)} rows"
            continue
        try:
            orc = con.sql(oracles[name])
            ocols = [c.lower() for c in orc.columns]
            orows = [tuple(r) for r in orc.fetchall()]
        except Exception as ex:
            results[name] = f"ORACLE ERROR: {type(ex).__name__}: {str(ex)[:300]}"
            continue
        sc, sr = df_to_rows([c.lower() for c in scols], srows)
        oc, orws = df_to_rows(ocols, orows)
        if sc != oc:
            results[name] = f"SCHEMA MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(orws):
            results[name] = f"ROWCOUNT MISMATCH spark={len(sr)} oracle={len(orws)}"
        elif sr != orws:
            diffs = [(a, b) for a, b in zip(sr, orws) if a != b][:3]
            only_s = [r for r in sr if r not in set(orws)][:2]
            only_o = [r for r in orws if r not in set(sr)][:2]
            results[name] = (
                f"VALUE MISMATCH ({len(sr)} rows) first_diffs={diffs} "
                f"spark_only={only_s} oracle_only={only_o}"
            )
        else:
            results[name] = f"OK ({len(sr)} rows)"
    width = max(len(k) for k in results)
    for k, v in results.items():
        print(f"{k:<{width}}  {v}", flush=True)
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    print(f"\n{n_ok}/{len(results)} passing")


if __name__ == "__main__":
    main()
