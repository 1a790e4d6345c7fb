"""Driver-style correctness check: run every queries() entry on Spark at a
given SF dir and compare against oracle_sql() via DuckDB (row count + schema
+ order-insensitive value comparison), mirroring CORRECTNESS_r{N}.json.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]

Every run also updates CORRECTNESS_LOCAL.json — the cumulative per-query
ledger (VERDICT r4 ask #9): for each of the registry's queries, the last
local result + when it was verified + which driver rounds ever recorded it
green, so drift of long-unverified queries is visible at a glance.
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
    update_ledger(results, sf_dir, set(qs))


def update_ledger(results: dict, sf_dir: str, registry: set) -> None:
    """Merge this run's results into CORRECTNESS_LOCAL.json (cumulative,
    one entry per registry query) alongside driver-round provenance."""
    import datetime
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "CORRECTNESS_LOCAL.json")
    ledger = {}
    if os.path.exists(path):
        with open(path) as f:
            ledger = json.load(f)
    ledger.pop("_summary", None)
    # driver provenance: every CORRECTNESS_r*.json row that was green
    driver_rounds: dict[str, list[str]] = {}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(p)[len("CORRECTNESS_") : -len(".json")]
        with open(p) as f:
            rows = json.load(f)
        for qname, row in rows.items():
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") is not False)
                and not row.get("err")
            )
            if ok:
                driver_rounds.setdefault(qname, []).append(rnd)
    today = datetime.date.today().isoformat()
    sf_key = os.path.basename(sf_dir.rstrip("/"))
    for qname in sorted(registry):
        ent = ledger.get(qname, {})
        if qname in results:
            r = results[qname]
            ent["last_result"] = r
            ent["ok"] = r.startswith("OK") or r.startswith("rows-only")
            ent["last_verified"] = f"{today} local {sf_key}"
            # per-SF stamp history: one entry per scale factor verified
            stamps = ent.get("verified_at", {})
            stamps[sf_key] = {"date": today, "ok": ent["ok"], "result": r}
            ent["verified_at"] = stamps
        ent["driver_rounds"] = driver_rounds.get(qname, [])
        ledger[qname] = ent
    # registry-pruned: drop queries that no longer exist
    ledger = {k: v for k, v in ledger.items() if k in registry}
    n_ok = sum(1 for v in ledger.values() if v.get("ok"))
    n_loc = sum(1 for v in ledger.values() if "last_result" in v)
    summary = {
        "registry_size": len(registry),
        "locally_verified": n_loc,
        "locally_ok": n_ok,
        "driver_recorded_ever": sum(
            1 for v in ledger.values() if v["driver_rounds"]
        ),
        "updated": today,
    }
    out = {"_summary": summary}
    out.update(ledger)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(
        f"ledger: {n_ok}/{len(registry)} ok "
        f"({summary['driver_recorded_ever']} driver-recorded) -> {path}"
    )


if __name__ == "__main__":
    main()
