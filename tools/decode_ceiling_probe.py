"""Hardware-ceiling probe MATCHED to the flagship scaling job.

tools/scaling_execs.py measures the production pipeline (payload decode ->
PIP -> rollup) at 1 vs 4 pinned executors. On this single box all
executors share one memory bus, so the measured efficiency is bounded by
the BOX, not the engine. membw_probe.py gives the generic bandwidth
curve; this probe gives the curve for EXACTLY the flagship job's byte
profile: read the same parquet shards (pyarrow, no Spark, no JVM, no
Arrow IPC), inflate + decode every payload with the same
imagecodec.decode kernel, at the same pinned core quadrants.

No engine code other than the codec runs here, so this is an UPPER BOUND
on what any execution engine could scale to for this work on this box: if
the pure kernel scales at E_hw, a Spark job at >= 0.9 * E_hw is at the
hardware ceiling (the round-3 verdict's acceptance alternative for the
4-core scaling point).

Usage: python tools/decode_ceiling_probe.py   (needs the scaling table:
       run tools/scaling_execs.py first or set SPARK_GRAFT_SCALE_N)
Env:   SPARK_GRAFT_EXEC_CORES (default 4), SPARK_GRAFT_SCALE_N
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES_PER_EXEC = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
N_EXEC_HI = 4
TIMED_REPS = 2


def _decode_file(path: str) -> int:
    import pyarrow.parquet as pq

    from osm2geojson_spark.functions import imagecodec

    t = pq.read_table(path, columns=["bytes", "fmt"])
    bufs = t.column("bytes").to_pylist()
    fmts = t.column("fmt").to_pylist()
    n = 0
    for b, f in zip(bufs, fmts):
        try:
            imagecodec.decode(bytes(b), f)
            n += 1
        except NotImplementedError:
            pass
    return n


def _child(argv: list[str]) -> None:
    exec_id, n_shards, table, barrier_dir = (
        int(argv[0]), int(argv[1]), argv[2], argv[3],
    )
    files = sorted(glob.glob(os.path.join(table, "part-*")))
    shard = files[exec_id::n_shards]
    pool = mp.Pool(CORES_PER_EXEC)  # inherits the taskset mask

    def job() -> int:
        return sum(pool.map(_decode_file, shard))

    rows = job()  # warm: page cache + pool forks + codec import
    with open(os.path.join(barrier_dir, f"ready-{exec_id}"), "w") as f:
        f.write("1")
    go = os.path.join(barrier_dir, "go")
    while not os.path.exists(go):
        time.sleep(0.05)
    reps = []
    for _ in range(TIMED_REPS):
        t0 = time.time()
        job()
        reps.append(time.time() - t0)
    pool.close()
    print(json.dumps({"exec_id": exec_id, "rows": rows, "reps": reps}), flush=True)


def _run(n_execs: int, table: str) -> dict:
    import subprocess

    barrier_dir = f"/tmp/osm2geojson_spark_scaling/ceiling_{n_execs}_{os.getpid()}"
    os.makedirs(barrier_dir, exist_ok=True)
    procs = []
    for i in range(n_execs):
        c0 = i * CORES_PER_EXEC
        procs.append(
            subprocess.Popen(
                [
                    "taskset", "-c", f"{c0}-{c0 + CORES_PER_EXEC - 1}",
                    sys.executable, os.path.abspath(__file__), "--child",
                    str(i), str(N_EXEC_HI), table, barrier_dir,
                ],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, cwd=REPO,
            )
        )
    while not all(
        os.path.exists(os.path.join(barrier_dir, f"ready-{i}"))
        for i in range(n_execs)
    ):
        time.sleep(0.1)
        for p in procs:
            if p.poll() not in (None, 0):
                raise RuntimeError(f"probe child died rc={p.returncode}")
    with open(os.path.join(barrier_dir, "go"), "w") as f:
        f.write("1")
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1800)
        outs.append(json.loads(stdout.strip().splitlines()[-1]))
    total = sum(o["rows"] for o in outs)
    walls = [max(o["reps"][r] for o in outs) for r in range(TIMED_REPS)]
    wall = min(walls)
    return {"n_execs": n_execs, "rows": total, "wall": round(wall, 2),
            "rows_per_sec": round(total / wall, 1)}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2:])
        return
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1000000"))
    table = f"/tmp/osm2geojson_spark_scaling/imgtable_{n}"
    if not os.path.isdir(table):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from scaling_run import build_table

        build_table(table, n)
    r1 = _run(1, table)
    r4 = _run(N_EXEC_HI, table)
    eff = r4["rows_per_sec"] / (N_EXEC_HI * r1["rows_per_sec"])
    print(json.dumps({
        "probe": "pure decode kernel (pyarrow + imagecodec, no Spark)",
        "cores_per_exec": CORES_PER_EXEC,
        "r1": r1, "r4": r4,
        "ceiling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
