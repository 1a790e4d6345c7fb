"""Memory-bandwidth saturation probe — hardware context for the scaling
evidence in BASELINE.md.

Runs a STREAM-triad-style numpy kernel (a = b + s*c over arrays far larger
than LLC) in K pinned single-core subprocesses (one per core) and reports the
AGGREGATE bandwidth at K = 8, 16, 32 active cores. If aggregate GB/s
stops growing with K, the box's shared memory bus is saturated — added
cores cannot help ANY workload past that point, which is exactly what a
real cluster fixes by adding nodes (each node brings its own memory bus).

Usage: python tools/membw_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

GROUP = 8  # cores per process group
N = 40_000_000  # 3 arrays x 320 MB >> LLC
REPS = 3


def _child() -> None:
    import numpy as np

    b = np.ones(N)
    c = np.full(N, 2.0)
    a = np.empty(N)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        np.multiply(c, 3.0, out=a)
        a += b
        best = min(best, time.time() - t0)
    gb = 4 * N * 8 / 1e9  # triad moves ~4 arrays worth of traffic
    print(json.dumps({"gbps": gb / best}), flush=True)


def _run(k: int) -> float:
    """k active cores: k pinned single-core triad processes (numpy triad is
    single-threaded, so one process = one core)."""
    procs = []
    for i in range(k):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable,
                 os.path.abspath(__file__), "--child"],
                stdout=subprocess.PIPE, text=True,
            )
        )
    total = 0.0
    for p in procs:
        out, _ = p.communicate()
        total += json.loads(out.strip().splitlines()[-1])["gbps"]
    return total


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child()
        return
    res = {f"aggregate_gbps_{k}_cores": round(_run(k), 1) for k in (8, 16, 32)}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
