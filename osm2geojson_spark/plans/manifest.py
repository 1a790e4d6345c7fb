"""Per-partition lineage manifest + resumable batch jobs (E6).

Iceberg-style commit semantics over plain Parquet (no Iceberg runtime jar in
this environment; the layout mirrors an Iceberg manifest so a real catalog
can be swapped in):

    <root>/data/batch=<batch_id>/...parquet      completed batch outputs
    <root>/manifest/batch=<batch_id>.json        atomic commit record with
        (batch_id, cell_ids?, rows_in, rows_out, bytes_out, wall_s)

A batch is *committed* iff its manifest JSON exists — the JSON is written
via tempfile + atomic rename AFTER the data lands, so a killed job leaves at
most uncommitted data files that the resume pass ignores/overwrites.

``ResumableJob.run`` partitions the work units (e.g. cell ranges), anti-joins
the already-committed batch ids, and processes only the remainder — restart
== identical final manifest (resume-equivalence is pinned by tests).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class ParquetManifest:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "manifest")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- commit log ------------------------------------------------------
    def committed_batches(self) -> set[str]:
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("batch=") and name.endswith(".json"):
                out.add(name[len("batch=") : -len(".json")])
        return out

    def commit(self, batch_id: str, metrics: dict) -> None:
        path = os.path.join(self.manifest_dir, f"batch={batch_id}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, **metrics}, f)
        os.replace(tmp, path)  # atomic commit point

    def read_metrics(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def batch_path(self, batch_id: str) -> str:
        return os.path.join(self.data_dir, f"batch={batch_id}")


class ResumableJob:
    """Runs ``fn(batch_id) -> DataFrame`` for every work unit not yet
    committed; writes Parquet then commits lineage metrics."""

    def __init__(self, manifest: ParquetManifest):
        self.manifest = manifest

    def run(
        self,
        batch_ids: Sequence[str],
        fn: Callable[[str], DataFrame],
        rows_in: Callable[[str], int] | None = None,
    ) -> dict:
        done = self.manifest.committed_batches()
        ran, skipped = [], []
        for bid in batch_ids:
            if bid in done:
                skipped.append(bid)
                continue
            t0 = time.time()
            df = fn(bid)
            path = self.manifest.batch_path(bid)
            # count during the write via observe() — no second read of the
            # batch output just to record rows_out
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
            df.write.mode("overwrite").parquet(path)
            n_out = obs.get["n"]
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
            )
            self.manifest.commit(
                bid,
                {
                    "rows_in": rows_in(bid) if rows_in else None,
                    "rows_out": n_out,
                    "bytes_out": size,
                    "wall_s": round(time.time() - t0, 3),
                },
            )
            ran.append(bid)
        return {"ran": ran, "skipped": skipped}
