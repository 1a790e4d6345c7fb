"""Iteration-safe checkpointing.

Spark's size-only statistics visitor MULTIPLIES child sizeInBytes through
every join, and ``Dataset.localCheckpoint`` snapshots that estimate into
the checkpointed ``LogicalRDD``. In an iterative operator (label
propagation, SCC, PageRank-style loops) whose round builds ≥2 joins over
the previous round's checkpoint, the estimate therefore SQUARES each
round: the BigInteger bit-length doubles, and after ~12-20 rounds the
driver burns tens of seconds per round inside
``BigInteger.multiplyToomCook3`` while planning — wall time grows ~2.5×
per round with constant-size data (diagnosed via driver thread dumps on
the sf0.1 SCC fixture: Thread-3 RUNNABLE in Toom-Cook multiply,
stats bit-length 51 → 116 → 245 → 505 → 1024 → ... per round).

``stable_checkpoint`` breaks the compounding: persist → materialize →
localCheckpoint → unpersist. At checkpoint time the CacheManager replaces
the entire pipeline with its ``InMemoryRelation``, whose statistics are
the REAL cached bytes, so the ``LogicalRDD`` snapshot holds a ~20-bit
number no matter how many rounds preceded it (measured: stats pinned at
19 bits over 24 rounds, per-round wall flat ~0.8 s where the naive
checkpoint hit 60 s/round by round 23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stable_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint with a materialized-size statistics snapshot —
    REQUIRED instead of plain localCheckpoint inside iterative loops
    whose rounds join the previous round's output (see module doc).
    Costs one extra cache materialization per call."""
    cached = df.persist()
    try:
        cached.count()
        return cached.localCheckpoint(eager=True)
    finally:
        cached.unpersist()
