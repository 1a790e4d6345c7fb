"""Two-parallelism scaling run — the sandbox proxy for the north-rule's
N -> 4N executor criterion (BASELINE.json:2,14).

Runs bench.py twice (local[8] and local[32]) on the SAME input via fresh
subprocesses (a JVM can't change master in-process), computes throughput at
both and the scaling efficiency

    efficiency = (throughput_32 / throughput_8) / (32 / 8)

and appends the results to BASELINE.md + writes BENCH.md.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str, n_images: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_IMAGES=str(n_images),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_images = int(os.environ.get("SPARK_GRAFT_IMAGES", "400000"))
    lo, hi = 8, 32

    r_lo = run_bench(lo, sf_dir, n_images)
    r_hi = run_bench(hi, sf_dir, n_images)

    thr_lo = n_images / r_lo["queries"]["spatial_join_tiles"]
    thr_hi = n_images / r_hi["queries"]["spatial_join_tiles"]
    eff = (thr_hi / thr_lo) / (hi / lo)

    total_lo, total_hi = r_lo["value"], r_hi["value"]
    eff_total = (total_lo / total_hi) / (hi / lo)

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    block = f"""
## Measured engine numbers ({stamp})

Same job, same input ({sf_dir}, {n_images} image rows), two parallelism
levels — the sandbox proxy for the N -> 4N executor scaling criterion:

| config | spatial-join+tile rows/sec | headline suite total (s) |
|---|---|---|
| local[{lo}]  | {thr_lo:,.0f} | {total_lo} |
| local[{hi}] | {thr_hi:,.0f} | {total_hi} |

**Spatial-join scaling efficiency ({lo} -> {hi} cores): {eff:.3f}**
(criterion: >= 0.8). Whole-suite wall-time efficiency: {eff_total:.3f}.

Per-query seconds at local[{hi}]: `{json.dumps(r_hi['queries'])}`
"""
    with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
        f.write(block)
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("# BENCH — two-parallelism scaling evidence\n" + block)
    print(json.dumps({
        "rows_per_sec_8": round(thr_lo, 1),
        "rows_per_sec_32": round(thr_hi, 1),
        "efficiency_spatial": round(eff, 3),
        "efficiency_total": round(eff_total, 3),
    }))


if __name__ == "__main__":
    main()
