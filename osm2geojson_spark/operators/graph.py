"""Graph traversal over road networks — multi-source BFS hop distance.

osm2geojson's LineString output IS a road graph (shared way endpoints =
vertices); the canonical downstream query is bounded reachability — "every
node within k hops of a source set" (isochrone precursors, service-area
analysis, contamination spread). This is iterative frontier expansion,
the one operator family Catalyst cannot express in a single plan, so it
runs as a driver-coordinated loop of DataFrame rounds:

* each round is ONE shuffle (frontier ⋈ edges on src, then an anti-join
  against the known set) — the textbook Pregel superstep as relational
  algebra;
* the frontier is localCheckpoint'ed per round to cut the exponential
  lineage iterative plans otherwise accumulate;
* early exit when the frontier empties (a limit(1).count probe, the same
  idiom as dedup.duplicate_clusters), so sparse source sets on large
  graphs stop at the true eccentricity, not max_hops.

Hop counts are exact integers and the visited-set semantics ("first
round that reaches a node wins") is order-independent, so a serial
recursive-CTE oracle hash-matches the distributed answer.

At 10^12-edge scale: rounds = max_hops is the product spec (bounded k),
the per-round shuffle carries only (node) ids, and the known set stays
partitioned by node id so the anti-join co-locates with the frontier
output of the previous round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """(node, hops) — the minimum number of edge traversals from ANY
    source to each reachable node, capped at ``max_hops``; unreachable
    nodes (within the cap) are absent.

    ``edges``: (src, dst) rows; pass ``directed=False`` to traverse both
    ways (the reverse edges are unioned in — roads are undirected unless
    oneway-tagged). ``sources``: rows with ``node_col``. Sources
    themselves report hops = 0 even if they also appear as edge targets
    (min semantics)."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst_col).alias("_s"), F.col(src_col).alias("_d"))
        )
    known = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    frontier = known
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(known.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .localCheckpoint(eager=False)
        )
        if nxt.limit(1).count() == 0:
            break
        known = known.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return known


def bfs_hops_sql(
    edges_cte: str, sources_cte: str, max_hops: int, directed: bool = True
) -> str:
    """DuckDB recursive-CTE twin of bfs_hops: expand (node, hops) pairs
    up to the cap, then take the min hop per node. UNION (not UNION ALL)
    dedupes identical (node, hops) states, bounding the recursion at
    V * (max_hops + 1) rows."""
    und = (
        " UNION SELECT dst AS src, src AS dst FROM e0" if not directed else ""
    )
    return f"""
WITH RECURSIVE e0 AS ({edges_cte}),
e AS (SELECT src, dst FROM e0{und}),
s AS ({sources_cte}),
walk(node, hops) AS (
  SELECT node, 0 FROM s
  UNION
  SELECT e.dst, walk.hops + 1
  FROM walk JOIN e ON e.src = walk.node
  WHERE walk.hops < {max_hops}
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM walk GROUP BY node
"""
