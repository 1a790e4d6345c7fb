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
from pyspark.sql.window import Window

from ..plans.iterate import stable_checkpoint


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


def shortest_dists(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    directed: bool = True,
) -> DataFrame:
    """(node, dist) — the minimum total edge weight from ANY source to each
    node over walks of at most ``max_hops`` edges (bounded Bellman-Ford,
    the weighted sibling of bfs_hops: travel-time isochrones instead of
    hop isochrones). Weights must be nonnegative; keep them integer for a
    bit-exact oracle. Unreached nodes (within the cap) are absent; sources
    report dist = 0.

    Each round is ONE relax shuffle (dist ⋈ edges on src, then a min-
    rollup over the union with the current labels) — the Pregel superstep
    as relational algebra, localCheckpoint'ed so iterative lineage stays
    flat. Early exit uses an exact two-scalar probe: distances only ever
    decrease and the node set only grows, so an unchanged
    (count, sum(dist)) pair proves a fixed point — no join against the
    previous round needed.

    At 10^12-edge scale the per-round shuffle carries only (node, dist)
    pairs and the rollup is map-side combinable; rounds <= max_hops is
    the product spec (bounded reach), exactly like bfs_hops."""
    e = edges.select(
        F.col(src_col).alias("_s"),
        F.col(dst_col).alias("_d"),
        F.col(weight_col).cast("long").alias("_w"),
    )
    if not directed:
        e = e.unionByName(
            edges.select(
                F.col(dst_col).alias("_s"),
                F.col(src_col).alias("_d"),
                F.col(weight_col).cast("long").alias("_w"),
            )
        )
    dist = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    sig = dist.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
    for _ in range(max_hops):
        relaxed = dist.join(e, dist["node"] == e["_s"]).select(
            F.col("_d").alias("node"), (F.col("dist") + F.col("_w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        nsig = dist.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
        if tuple(nsig) == tuple(sig):
            break
        sig = nsig
    return dist


def shortest_dists_sql(
    edges_cte: str, sources_cte: str, max_hops: int, directed: bool = True
) -> str:
    """DuckDB recursive-CTE twin of shortest_dists: enumerate (node, dist,
    hops) walk states up to the cap (UNION dedups identical states), then
    min(dist) per node. Positive integer weights keep the state space
    finite and the arithmetic engine-exact."""
    und = (
        " UNION SELECT dst AS src, src AS dst, w FROM e0" if not directed else ""
    )
    return f"""
WITH RECURSIVE e0 AS ({edges_cte}),
e AS (SELECT src, dst, w FROM e0{und}),
s AS ({sources_cte}),
walk(node, dist, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM s
  UNION
  SELECT e.dst, walk.dist + e.w, walk.hops + 1
  FROM walk JOIN e ON e.src = walk.node
  WHERE walk.hops < {max_hops}
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY node
"""


PR_SCALE = 1_000_000_000_000  # fixed-point PageRank mass per node


def pagerank_int(
    edges: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, score) — ``n_iters`` rounds of FIXED-POINT integer PageRank
    (node importance / intersection centrality on road graphs). Every
    node starts at PR_SCALE; each round a node keeps
    base = PR_SCALE * (100-d)/100 and receives, from every in-neighbor v,

        ((score_v * d) div 100) div outdeg_v      (integer division)

    All arithmetic is int64 with truncating division on positive values,
    so the result is bit-identical regardless of partitioning, summation
    order, or engine — a serial SQL twin (``pagerank_sql``, iterations
    unrolled) hash-matches exactly. Dangling nodes (outdeg 0) leak their
    damped mass — the standard simplification; rounding also sheds
    O(outdeg) units per node per round. Scores therefore DECAY slightly
    rather than normalize; rankings are what the operator delivers.

    Scale: one groupBy(dst) shuffle per round over (dst, contrib) pairs
    (map-side combinable) plus a node-keyed left join; the degree join is
    precomputed ONCE outside the loop. localCheckpoint keeps iterative
    lineage flat. int64 headroom: max score < n * PR_SCALE — fine to
    ~9e6 nodes at this SCALE; lower PR_SCALE for larger graphs."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ed = e.join(deg, "_s").localCheckpoint(eager=False)
    base = PR_SCALE * (100 - damping_pct) // 100
    scores = nodes.withColumn("score", F.lit(PR_SCALE).cast("long"))
    for _ in range(n_iters):
        contrib = (
            scores.join(ed, scores["node"] == ed["_s"])
            .select(
                F.col("_d").alias("node"),
                F.expr(f"(score * {damping_pct}) div 100 div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        scores = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("_c"), F.lit(0)))
                .cast("long")
                .alias("score"),
            )
            .localCheckpoint(eager=False)
        )
    return scores


def pagerank_sql(
    edges_cte: str, n_iters: int = 3, damping_pct: int = 85
) -> str:
    """DuckDB twin of pagerank_int with the iterations UNROLLED as chained
    CTEs — identical integer arithmetic ((score*d)//100//outdeg, truncating
    division on positive int64), so the hash matches bit-for-bit."""
    base = PR_SCALE * (100 - damping_pct) // 100
    parts = [
        f"WITH e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT src AS node FROM e UNION SELECT dst FROM e) u)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src)",
        f"s0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS score FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" CAST(sum(s{i-1}.score * {damping_pct} // 100 // deg.d) AS BIGINT) AS c"
            f" FROM e JOIN s{i-1} ON s{i-1}.node = e.src"
            f" JOIN deg ON deg.src = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"s{i} AS (SELECT n.node,"
            f" CAST({base} + COALESCE(c{i}.c, 0) AS BIGINT) AS score"
            f" FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, score FROM s{n_iters}"


def isochrone_cells(
    dists: DataFrame,
    coords: DataFrame,
    tiers: list[int],
    res: int,
    node_col: str = "node",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """ISOCHRONE COVERAGE — the service-area map as a CELL SET: every
    grid cell touched by a reached node is tagged with the smallest cost
    tier that reaches it (tier of a cell = bucket of the MIN node dist
    inside it). Cell-based isochrones are the scale-correct output shape
    (what tile renderers and coverage analyses consume); polygon outlines
    are a downstream `polygonize`/`dissolve` of this set.

    ``dists``: (node, dist) from ``shortest_dists`` (or bfs_hops with
    hops as the cost); ``coords``: (node, lon, lat). ``tiers`` must be
    ascending; cells whose min dist exceeds the last tier are dropped.
    Returns (tier, cell_id) distinct rows.

    All decisions are exact: integer dists, integer cell ids, integer
    tier thresholds — the SQL twin (recursive-CTE dists + the identical
    min/bucket algebra) hash-matches. One join (node-keyed, rides the
    shortest_dists output partitioning) + one combinable min-rollup."""
    assert list(tiers) == sorted(tiers)
    j = dists.join(coords.select(node_col, lon_col, lat_col), node_col)
    from . import cells as _cells

    agg = (
        j.select(
            _cells.cell_id(F.col(lon_col), F.col(lat_col), res).alias("cell_id"),
            "dist",
        )
        .groupBy("cell_id")
        .agg(F.min("dist").alias("_d"))
        .filter(F.col("_d") <= F.lit(int(tiers[-1])))
    )
    tier = F.lit(int(tiers[-1]))
    for t in reversed(tiers[:-1]):
        tier = F.when(F.col("_d") <= F.lit(int(t)), F.lit(int(t))).otherwise(tier)
    return agg.select(tier.cast("long").alias("tier"), "cell_id")


def isochrone_cells_sql(
    dists_sql: str, coords_cte: str, tiers: list[int], res: int
) -> str:
    """DuckDB twin of isochrone_cells; ``dists_sql`` is a full query
    yielding (node, dist) (e.g. shortest_dists_sql output), ``coords_cte``
    yields (node, lon, lat)."""
    from . import cells as _cells

    cell = _cells.cell_id_sql("lon", "lat", res)
    case = "CASE "
    for t in tiers[:-1]:
        case += f"WHEN _d <= {int(t)} THEN {int(t)} "
    case += f"ELSE {int(tiers[-1])} END"
    return f"""
WITH d AS ({dists_sql}),
c AS ({coords_cte}),
j AS (
  SELECT {cell} AS cell_id, d.dist
  FROM d JOIN c ON c.node = d.node
),
agg AS (
  SELECT cell_id, MIN(dist) AS _d FROM j GROUP BY cell_id
)
SELECT CAST({case} AS BIGINT) AS tier, cell_id
FROM agg WHERE _d <= {int(tiers[-1])}
"""


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


def label_propagation(
    edges: DataFrame,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, label) — ``n_iters`` rounds of SYNCHRONOUS label propagation
    community detection (Raghavan 2007, the deterministic variant): every
    node starts labeled with its own id; each round all nodes
    simultaneously adopt the most frequent label among their neighbors
    (undirected — edges are symmetrized), ties broken by the SMALLEST
    label, isolated nodes keeping theirs. Synchronous + deterministic
    tie-break makes the result a pure function of the edge set — no
    vertex ordering, no randomness — so it is bit-identical across
    partitionings and engines, and ``label_propagation_sql`` unrolls the
    identical rounds for the serial twin.

    Complements the engine's other graph ops: duplicate_clusters finds
    CONNECTED components; LPA splits a connected graph into dense
    communities (the road-network district / covisitation-cluster use).
    Fixed round count is the honest distributed contract (LPA's
    convergence is not guaranteed under synchronous update — it can
    2-cycle; rankings stabilize in a few rounds).

    Scale: per round ONE groupBy(node, label) count shuffle over the edge
    relation + a min-struct rollup and a node-keyed left join — all
    map-side combinable; the symmetrized edge relation is checkpointed
    once. Skewed hubs are bounded by degree (counts combine before the
    shuffle)."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    sym = (
        e.unionByName(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = sym.select(F.col("_s").alias("node")).distinct()
    labels = nodes.select(
        "node", F.col("node").cast("long").alias("label")
    ).localCheckpoint(eager=False)
    for _ in range(n_iters):
        pick = (
            sym.join(labels, sym["_s"] == labels["node"])
            .groupBy(F.col("_d").alias("nd"), "label")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("nd")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_c")).alias("nc"), F.col("label").alias("l")
                    )
                ).alias("_b")
            )
            .select(F.col("nd"), F.col("_b.l").alias("_new"))
        )
        labels = (
            labels.join(pick, labels["node"] == pick["nd"], "left")
            .select(
                "node",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels


def label_propagation_sql(edges_cte: str, n_iters: int = 3) -> str:
    """DuckDB twin of label_propagation — rounds unrolled as chained CTEs,
    same symmetrization, majority count and (count DESC, label ASC)
    tie-break."""
    parts = [
        f"WITH e0 AS ({edges_cte})",
        "e AS (SELECT DISTINCT _s, _d FROM (SELECT src AS _s, dst AS _d"
        " FROM e0 UNION ALL SELECT dst, src FROM e0) u)",
        "l0 AS (SELECT DISTINCT _s AS node, CAST(_s AS BIGINT) AS label"
        " FROM e)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"c{i} AS (SELECT e._d AS node, l.label,"
            f" count(*) AS c FROM e JOIN l{i-1} l ON l.node = e._s"
            f" GROUP BY e._d, l.label)"
        )
        parts.append(
            f"p{i} AS (SELECT node, label FROM (SELECT node, label,"
            f" row_number() OVER (PARTITION BY node"
            f" ORDER BY c DESC, label ASC) AS rk FROM c{i}) q WHERE rk = 1)"
        )
        parts.append(
            f"l{i} AS (SELECT l.node,"
            f" CAST(coalesce(p.label, l.label) AS BIGINT) AS label"
            f" FROM l{i-1} l LEFT JOIN p{i} p ON p.node = l.node)"
        )
    return "\n, ".join(parts) + f"\nSELECT node, label FROM l{n_iters}"


def k_core(
    edges: DataFrame,
    k: int,
    n_rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, deg) — BOUNDED k-CORE PEELING (Seidman 1983): ``n_rounds``
    synchronous rounds of "delete every node whose degree in the
    surviving subgraph is < k" over the symmetrized simple graph,
    reporting the survivors with their residual degree. The density-
    hierarchy primitive (spam/bot subgraph mining, community cores,
    graph sparsification).

    Peeling reaches its unique fixed point in at most diameter-ish
    rounds; like bfs_hops/shortest_dists/pagerank_int, the ROUND COUNT is
    part of the operator contract (the honest distributed form — each
    round is a shuffle), and the run short-circuits as soon as a round
    deletes nothing, so n_rounds is an upper bound, not a cost. With
    n_rounds >= the convergence depth the output IS the exact k-core;
    the SQL twin unrolls the identical rounds.

    Scale: per round one degree count (map-side combinable) + one
    semi-join of the edge list against survivors; the edge relation
    only shrinks. Early exit costs one tiny count() job per round."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    sym = (
        e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = sym
    for _ in range(n_rounds):
        deg = cur.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
        keep = deg.filter(F.col("_deg") >= k).select("_s")
        nxt = (
            cur.join(keep, "_s")
            .join(keep.withColumnRenamed("_s", "_d"), "_d")
            .select("_s", "_d")
            .localCheckpoint(eager=False)
        )
        if nxt.count() == cur.count():
            cur = nxt
            break
        cur = nxt
    return (
        cur.groupBy("_s")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .filter(F.col("deg") >= k)
        .select(F.col("_s").alias("node"), "deg")
    )


def k_core_sql(edges_cte: str, k: int, n_rounds: int = 8) -> str:
    """DuckDB twin of k_core — the peeling rounds unrolled (no early
    exit needed: once stable, further rounds are identity). CTEs are
    MATERIALIZED: each round references the previous one three times
    (degree count + two survivor joins), so letting the planner inline
    them would expand the tree 3^n_rounds-fold."""
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_cte})",
        "g0 AS MATERIALIZED (SELECT DISTINCT _s, _d"
        " FROM (SELECT src AS _s, dst AS _d"
        " FROM e0 UNION ALL SELECT dst, src FROM e0) u WHERE _s != _d)",
    ]
    for i in range(1, n_rounds + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT _s FROM g{i-1} GROUP BY _s"
            f" HAVING count(*) >= {k})"
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT g._s, g._d FROM g{i-1} g"
            f" JOIN k{i} a ON a._s = g._s JOIN k{i} b ON b._s = g._d)"
        )
    return (
        "\n, ".join(parts)
        + f"""
SELECT _s AS node, CAST(count(*) AS BIGINT) AS deg
FROM g{n_rounds} GROUP BY _s HAVING count(*) >= {k}"""
    )


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, n_tri) — EXACT TRIANGLE COUNTING per node (plus the global
    count = sum/3), the clustering-coefficient numerator and the classic
    cohesion metric. Over the symmetrized simple graph, each triangle
    {a < b < c} is found exactly once by the oriented two-hop join

        (a -> b) join (b -> c) join (a -> c)   with a < b < c

    then credited to all three corners. All counting is exact int64.

    Scale: the canonical degree-ordering trick — orienting every edge
    low-id -> high-id caps each node's out-degree contribution, so the
    two-hop candidate volume is sum_v outdeg(v)^2 on the ORIENTED graph
    (id order here; swap in degree order upstream for power-law graphs).
    Two equi-join shuffles + one combinable rollup; no node ever sees
    the full neighbor list."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    sym = (
        e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    fwd = sym.filter(F.col("_s") < F.col("_d")).localCheckpoint(eager=False)
    ab = fwd.select(F.col("_s").alias("a"), F.col("_d").alias("b"))
    bc = fwd.select(F.col("_s").alias("b"), F.col("_d").alias("c"))
    ac = fwd.select(F.col("_s").alias("a"), F.col("_d").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )


def triangle_count_sql(edges_cte: str) -> str:
    """DuckDB twin of triangle_count — same orientation, same two-hop
    closure, same per-corner credit."""
    return f"""
WITH e0 AS ({edges_cte}),
sym AS (SELECT DISTINCT _s, _d FROM (SELECT src AS _s, dst AS _d FROM e0
        UNION ALL SELECT dst, src FROM e0) u WHERE _s != _d),
fwd AS (SELECT _s, _d FROM sym WHERE _s < _d),
tri AS (
  SELECT ab._s AS a, ab._d AS b, bc._d AS c
  FROM fwd ab JOIN fwd bc ON bc._s = ab._d
  JOIN fwd ac ON ac._s = ab._s AND ac._d = bc._d
),
corners AS (
  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corners GROUP BY node
"""


HITS_SCALE = 1_000_000  # fixed-point HITS mass ceiling (max score per round)


def hits_int(
    edges: DataFrame,
    n_iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, hub, auth) — ``n_iters`` rounds of FIXED-POINT integer HITS
    (Kleinberg hubs-and-authorities: a good hub points at good
    authorities, a good authority is pointed at by good hubs — the
    link-analysis dual of PageRank for directed reference graphs such as
    citation / hyperlink / road-interchange networks).

    Per round:  auth_j = sum over in-edges of hub_i, then max-normalize
    auth' = (auth * HITS_SCALE) div max(auth); hub_i = sum over
    out-edges of auth'_j, max-normalized the same way. Sums are
    order-free int64 and the normalizer is truncating division by a
    1-row global max — bit-identical across partitionings and engines,
    so a serial unrolled-CTE twin (``hits_sql``) hash-matches exactly.
    (Classic HITS L2-normalizes; max-normalization preserves the
    eigenvector direction ranking identically and stays in integers.)

    Nodes with no in-edges have auth 0; no out-edges, hub 0.

    Scale: per round one groupBy(dst) + one groupBy(src) shuffle over
    (node, contrib) pairs (map-side combinable) and a 1-row broadcast
    max; lineage kept flat with localCheckpoint. int64 headroom:
    max degree * HITS_SCALE < 9e18 -> fine to ~9e12-degree hubs."""
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hub = nodes.withColumn("h", F.lit(HITS_SCALE).cast("long"))
    auth = None
    for _ in range(n_iters):
        a_raw = (
            hub.join(e, hub["node"] == e["_s"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        amax = a_raw.agg(F.max("a").alias("m"))
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(amax))
            .select(
                "node",
                F.when(
                    F.col("m").isNotNull() & (F.col("m") > 0),
                    F.expr(f"(coalesce(a, 0L) * {HITS_SCALE}) div m"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("a"),
            )
            .localCheckpoint(eager=False)
        )
        h_raw = (
            auth.join(e, auth["node"] == e["_d"])
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum("a").alias("hr"))
        )
        hmax = h_raw.agg(F.max("hr").alias("m"))
        hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(hmax))
            .select(
                "node",
                F.when(
                    F.col("m").isNotNull() & (F.col("m") > 0),
                    F.expr(f"(coalesce(hr, 0L) * {HITS_SCALE}) div m"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("h"),
            )
            .localCheckpoint(eager=False)
        )
    return nodes.join(hub, "node").join(auth, "node").select(
        "node",
        F.col("h").cast("long").alias("hub"),
        F.col("a").cast("long").alias("auth"),
    )


def hits_sql(edges_cte: str, n_iters: int = 2) -> str:
    """DuckDB twin of hits_int, iterations unrolled — identical int64
    sums and truncating max-normalization, bit-exact hash match."""
    parts = [
        f"WITH e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT src AS node FROM e UNION SELECT dst FROM e) u)",
        f"h0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        parts.append(
            f"ar{i} AS (SELECT e.dst AS node, CAST(sum(h{p}.h) AS BIGINT) AS a"
            f" FROM e JOIN h{p} ON h{p}.node = e.src GROUP BY e.dst)"
        )
        parts.append(f"am{i} AS (SELECT max(a) AS m FROM ar{i})")
        parts.append(
            f"a{i} AS (SELECT nodes.node, CASE WHEN am{i}.m IS NOT NULL"
            f" AND am{i}.m > 0 THEN (COALESCE(ar{i}.a, 0) * {HITS_SCALE})"
            f" // am{i}.m ELSE 0 END AS a"
            f" FROM nodes LEFT JOIN ar{i} ON ar{i}.node = nodes.node, am{i})"
        )
        parts.append(
            f"hr{i} AS (SELECT e.src AS node, CAST(sum(a{i}.a) AS BIGINT) AS hr"
            f" FROM e JOIN a{i} ON a{i}.node = e.dst GROUP BY e.src)"
        )
        parts.append(f"hm{i} AS (SELECT max(hr) AS m FROM hr{i})")
        parts.append(
            f"h{i} AS (SELECT nodes.node, CASE WHEN hm{i}.m IS NOT NULL"
            f" AND hm{i}.m > 0 THEN (COALESCE(hr{i}.hr, 0) * {HITS_SCALE})"
            f" // hm{i}.m ELSE 0 END AS h"
            f" FROM nodes LEFT JOIN hr{i} ON hr{i}.node = nodes.node, hm{i})"
        )
    n = n_iters
    parts.append(
        f"SELECT nodes.node, CAST(h{n}.h AS BIGINT) AS hub,"
        f" CAST(a{n}.a AS BIGINT) AS auth"
        f" FROM nodes JOIN h{n} ON h{n}.node = nodes.node"
        f" JOIN a{n} ON a{n}.node = nodes.node"
    )
    last = parts.pop()
    return ",\n".join(parts) + "\n" + last


RA_SCALE = 1_000_000  # resource-allocation micro-units per 1/deg term


def link_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 2,
    max_degree: int | None = None,
) -> DataFrame:
    """(a, b, common, ra_micro, jacc_num, jacc_den) — LINK PREDICTION
    over the symmetrized simple graph: score every NON-adjacent pair
    (a < b) that shares >= ``min_common`` neighbors with the three
    classic neighborhood indices at once:

    * ``common``   — common-neighbor count |N(a) ∩ N(b)| (Newman 2001),
    * ``ra_micro`` — resource allocation Σ_z 1/deg(z) (Zhou et al. 2009),
      kept EXACT as Σ floor(1e6/deg(z)) integer micro-units — no float
      sum, so the score is order- and partitioning-independent,
    * ``jacc_num/jacc_den`` — Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| as the
      exact integer fraction (den = deg(a) + deg(b) - common).

    RA (not Adamic-Adar) is the logarithm-free member of the family, so
    the whole operator is integer arithmetic end to end.

    Scale: the wedge enumeration (self-join of the adjacency on the
    shared neighbor z) generates Σ_z deg(z)^2 candidates — the standard
    bound; ``max_degree`` drops hub wedges above the cap (the usual
    estimator at web scale, changes the index definition and is OFF by
    default). One adjacency shuffle for the wedge join, one combinable
    (a, b) rollup, degree joins broadcastable when the node set is small
    relative to the pair set; the existing-edge anti-join reuses the
    oriented edge partitioning."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    sym = (
        e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nbr = sym.select(F.col("_s").alias("z"), F.col("_d").alias("x"))
    zdeg = deg.select(
        F.col("_s").alias("z"),
        F.expr(f"CAST({RA_SCALE} DIV deg AS BIGINT)").alias("_ra"),
        F.col("deg").alias("_zdeg"),
    )
    if max_degree is not None:
        zdeg = zdeg.filter(F.col("_zdeg") <= max_degree)
    wedges = (
        nbr.select(F.col("z"), F.col("x").alias("a"))
        .join(nbr.select(F.col("z"), F.col("x").alias("b")), "z")
        .filter(F.col("a") < F.col("b"))
        .join(zdeg.drop("_zdeg"), "z")
    )
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("common"),
        F.sum("_ra").cast("long").alias("ra_micro"),
    )
    fwd = sym.filter(F.col("_s") < F.col("_d")).select(
        F.col("_s").alias("a"), F.col("_d").alias("b")
    )
    non_edges = scored.join(fwd, ["a", "b"], "left_anti").filter(
        F.col("common") >= min_common
    )
    da = deg.select(F.col("_s").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("_s").alias("b"), F.col("deg").alias("_db"))
    return (
        non_edges.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            "ra_micro",
            F.col("common").alias("jacc_num"),
            (F.col("_da") + F.col("_db") - F.col("common"))
            .cast("long")
            .alias("jacc_den"),
        )
    )


def link_scores_sql(
    edges_cte: str, min_common: int = 2, max_degree: int | None = None
) -> str:
    """DuckDB twin of link_scores — same symmetrization, wedge join,
    integer RA micro-units and exact Jaccard fraction."""
    cap = f"WHERE deg <= {int(max_degree)}" if max_degree is not None else ""
    return f"""
WITH e0 AS ({edges_cte}),
sym AS (SELECT DISTINCT _s, _d FROM (SELECT src AS _s, dst AS _d FROM e0
        UNION ALL SELECT dst, src FROM e0) u WHERE _s != _d),
deg AS (SELECT _s, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY _s),
zdeg AS (SELECT _s AS z, {RA_SCALE} // deg AS ra FROM deg {cap}),
nbr AS (SELECT _s AS z, _d AS x FROM sym),
wedges AS (
  SELECT na.z, na.x AS a, nb.x AS b, zdeg.ra
  FROM nbr na JOIN nbr nb ON nb.z = na.z AND na.x < nb.x
  JOIN zdeg ON zdeg.z = na.z
),
scored AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS common,
         CAST(sum(ra) AS BIGINT) AS ra_micro
  FROM wedges GROUP BY a, b
),
non_edges AS (
  SELECT s.* FROM scored s
  WHERE s.common >= {int(min_common)}
    AND NOT EXISTS (SELECT 1 FROM sym WHERE _s = s.a AND _d = s.b)
)
SELECT n.a, n.b, n.common, n.ra_micro,
       n.common AS jacc_num,
       CAST(da.deg + db.deg - n.common AS BIGINT) AS jacc_den
FROM non_edges n
JOIN deg da ON da._s = n.a
JOIN deg db ON db._s = n.b
"""


def degree_assortativity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """One row (m_edges, m_stubs, s_xy, s_x, s_x2, r) — DEGREE
    ASSORTATIVITY (Newman 2002): the Pearson correlation of endpoint
    degrees over the 2m directed stubs of the symmetrized simple graph.
    Positive = hubs attach to hubs (social nets), negative = hub-spoke
    (the web, infrastructure).

    Everything up to the division is an exact int64 sum over stubs
    (degrees ≤ n keep Σxy ≤ 2m·n² in range for any graph whose edge
    list fits a cluster), and because stub marginals are symmetric the
    correlation collapses to the exact integer ratio

        r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)

    — ONE IEEE division, bit-identical cross-engine; NULL for regular
    graphs (zero variance).

    Scale: degree table = one combinable rollup on the symmetrized
    edges; stub pairs = two broadcast-able joins of edges against the
    degree table (degree table is node-sized); final = a 1-row total
    rollup. No quadratic anything."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    sym = (
        e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    deg = sym.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    stubs = (
        sym.join(deg.withColumnRenamed("node", "_s"), "_s")
        .withColumnRenamed("deg", "dx")
        .join(
            deg.select(
                F.col("node").alias("_d"), F.col("deg").alias("dy")
            ),
            "_d",
        )
    )
    tot = stubs.agg(
        F.count(F.lit(1)).alias("m_stubs"),
        F.sum(F.col("dx") * F.col("dy")).alias("s_xy"),
        F.sum("dx").alias("s_x"),
        F.sum(F.col("dx") * F.col("dx")).alias("s_x2"),
    )
    m = F.col("m_stubs")
    num = m * F.col("s_xy") - F.col("s_x") * F.col("s_x")
    den = m * F.col("s_x2") - F.col("s_x") * F.col("s_x")
    return tot.select(
        (m / 2).cast("long").alias("m_edges"),
        "m_stubs",
        "s_xy",
        "s_x",
        "s_x2",
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "r"
        ),
    )


def degree_assortativity_sql(edges_cte: str) -> str:
    """DuckDB twin of degree_assortativity — identical symmetrization,
    integer stub sums, and single-division r."""
    return f"""
WITH e0 AS ({edges_cte}),
sym AS (
  SELECT DISTINCT s, d FROM (
    SELECT src AS s, dst AS d FROM e0
    UNION ALL
    SELECT dst AS s, src AS d FROM e0
  ) WHERE s <> d
),
deg AS (SELECT s AS node, count(*) AS deg FROM sym GROUP BY 1),
stubs AS (
  SELECT a.deg AS dx, b.deg AS dy
  FROM sym JOIN deg a ON a.node = sym.s JOIN deg b ON b.node = sym.d
),
tot AS (
  SELECT count(*) AS m_stubs,
         CAST(sum(dx * dy) AS BIGINT) AS s_xy,
         CAST(sum(dx) AS BIGINT) AS s_x,
         CAST(sum(dx * dx) AS BIGINT) AS s_x2
  FROM stubs
)
SELECT CAST(m_stubs // 2 AS BIGINT) AS m_edges, m_stubs, s_xy, s_x, s_x2,
       CASE WHEN m_stubs * s_x2 - s_x * s_x <> 0
            THEN CAST(m_stubs * s_xy - s_x * s_x AS DOUBLE)
                 / CAST(m_stubs * s_x2 - s_x * s_x AS DOUBLE)
       END AS r
FROM tot
"""


def tree_rollup(
    nodes: DataFrame,
    max_rounds: int = 6,
    id_col: str = "node_id",
    parent_col: str = "parent_id",
    weight_col: str = "w",
) -> DataFrame:
    """(node_id, depth, root_id, subtree_n, subtree_w) — HIERARCHY
    ROLLUP over a parent-pointer forest (the org-chart / category-tree
    / file-system recursive aggregate every warehouse needs and plain
    SQL groupBy cannot express): per node its depth, its root, and the
    exact count/weight-sum of its whole subtree (self included).

    The ancestor closure is built by POINTER DOUBLING — round k holds
    every (descendant, ancestor) pair at distance < 2^k, and one
    self-join doubles the horizon — so a depth-D forest needs
    ceil(log2 D) + 1 rounds, not D.  ``max_rounds`` = 6 covers depth
    64.  Cycles are the caller's bug (forests only); all sums exact
    int64.

    Scale: the closure has n·depth rows — the inherent size of the
    answer for path-dependent aggregates; each round is one equi-join
    shuffle on node id. Subtree sums and depths are then combinable
    rollups over the closure. Real hierarchies (org charts, catalogs,
    admin-area trees) have depth 5-20, so the closure is a small
    constant times the node table."""
    v = nodes.select(
        F.col(id_col).cast("long").alias("v"),
        F.col(parent_col).cast("long").alias("p"),
        F.col(weight_col).cast("long").alias("w"),
    )
    # closure of strict ancestors: (d)escendant -> (a)ncestor
    clos = v.filter(F.col("p").isNotNull()).select(
        F.col("v").alias("d"), F.col("p").alias("a")
    )
    for _ in range(int(max_rounds)):
        hop = clos.alias("x").join(
            clos.alias("y"), F.col("x.a") == F.col("y.d")
        ).select(F.col("x.d").alias("d"), F.col("y.a").alias("a"))
        new = clos.unionByName(hop).distinct().localCheckpoint(eager=False)
        if new.count() == clos.count():
            clos = new
            break
        clos = new
    roots = v.filter(F.col("p").isNull()).select(F.col("v").alias("a"))
    depth = clos.groupBy("d").agg(F.count(F.lit(1)).alias("depth"))
    root_of = clos.join(roots, "a").select(
        F.col("d").alias("v"), F.col("a").alias("root_id")
    )
    sub = (
        clos.join(
            v.select(F.col("v").alias("d"), F.col("w").alias("dw")), "d"
        )
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("desc_n"), F.sum("dw").alias("desc_w"))
    )
    return (
        v.join(depth, v["v"] == depth["d"], "left")
        .drop("d")
        .join(root_of.withColumnRenamed("v", "_rv"), v["v"] == F.col("_rv"), "left")
        .drop("_rv")
        .join(sub, v["v"] == sub["a"], "left")
        .drop("a")
        .select(
            F.col("v").alias(id_col),
            F.coalesce("depth", F.lit(0)).alias("depth"),
            F.coalesce("root_id", F.col("v")).alias("root_id"),
            (F.coalesce("desc_n", F.lit(0)) + 1).alias("subtree_n"),
            (F.coalesce("desc_w", F.lit(0)) + F.col("w")).alias("subtree_w"),
        )
    )


def tree_rollup_sql(nodes_cte: str) -> str:
    """DuckDB twin of tree_rollup — recursive-CTE ancestor closure,
    identical rollups.  ``nodes_cte`` -> (node_id, parent_id, w)."""
    return f"""
WITH RECURSIVE v AS (
  SELECT CAST(node_id AS BIGINT) AS v, CAST(parent_id AS BIGINT) AS p,
         CAST(w AS BIGINT) AS w
  FROM ({nodes_cte})
),
clos(d, a) AS (
  SELECT v, p FROM v WHERE p IS NOT NULL
  UNION
  SELECT c.d, v.p FROM clos c JOIN v ON v.v = c.a WHERE v.p IS NOT NULL
),
depth AS (SELECT d, count(*) AS depth FROM clos GROUP BY 1),
root_of AS (
  SELECT c.d AS v, c.a AS root_id
  FROM clos c JOIN v r ON r.v = c.a AND r.p IS NULL
),
sub AS (
  SELECT c.a, count(*) AS desc_n, CAST(sum(w.w) AS BIGINT) AS desc_w
  FROM clos c JOIN v w ON w.v = c.d GROUP BY 1
)
SELECT v.v AS node_id,
       CAST(COALESCE(depth.depth, 0) AS BIGINT) AS depth,
       COALESCE(root_of.root_id, v.v) AS root_id,
       CAST(COALESCE(sub.desc_n, 0) + 1 AS BIGINT) AS subtree_n,
       CAST(COALESCE(sub.desc_w, 0) + v.w AS BIGINT) AS subtree_w
FROM v
LEFT JOIN depth ON depth.d = v.v
LEFT JOIN root_of ON root_of.v = v.v
LEFT JOIN sub ON sub.a = v.v
"""


def square_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """One row (n_pairs, n_squares) — EXACT 4-CYCLE COUNTING over the
    symmetrized simple graph: quadrilaterals are the next motif after
    triangles (community butterflies in bipartite-ish graphs, lattice
    detection, clustering beyond C3).  Identity: every 4-cycle is
    counted by exactly TWO of its diagonals, so

        n_squares = Σ_{u<w} C(codeg(u, w), 2) / 2

    where codeg(u, w) = |N(u) ∩ N(w)| over unordered non-equal vertex
    pairs (adjacent or not).  The co-degree table comes from one
    oriented two-hop join (wedge enumeration u-v-w with u < w), the
    combination sum is a combinable rollup, and the final halving is
    exact (the sum is provably even).  n_pairs = co-degree pairs seen.

    Scale: wedge volume Σ_v deg(v)² — the standard quadratic-in-hub
    cost of motif counting; cap or sample hubs upstream on power-law
    graphs (same contract as triangle_count's orientation note)."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    sym = (
        e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    wedges = (
        sym.alias("a")
        .join(sym.alias("b"), F.col("a._d") == F.col("b._s"))
        .filter(F.col("a._s") < F.col("b._d"))
        .select(F.col("a._s").alias("u"), F.col("b._d").alias("w"))
    )
    codeg = wedges.groupBy("u", "w").agg(F.count(F.lit(1)).alias("c"))
    return codeg.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum(F.col("c") * (F.col("c") - 1)) / 4).cast("long").alias(
            "n_squares"
        ),
    )


def square_count_sql(edges_cte: str) -> str:
    """DuckDB twin of square_count — identical wedge join and identity."""
    return f"""
WITH e0 AS ({edges_cte}),
sym AS (
  SELECT DISTINCT s, d FROM (
    SELECT src AS s, dst AS d FROM e0
    UNION ALL
    SELECT dst AS s, src AS d FROM e0
  ) WHERE s <> d
),
codeg AS (
  SELECT a.s AS u, b.d AS w, count(*) AS c
  FROM sym a JOIN sym b ON b.s = a.d
  WHERE a.s < b.d
  GROUP BY 1, 2
)
SELECT count(*) AS n_pairs,
       CAST(sum(c * (c - 1)) // 4 AS BIGINT) AS n_squares
FROM codeg
"""


def clustering_coeff(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, deg, n_tri, lcc_num, lcc_den, lcc) — LOCAL CLUSTERING
    COEFFICIENT per node over the symmetrized simple graph: the
    fraction of a node's neighbor pairs that are themselves adjacent,

        lcc(v) = 2 * tri(v) / (deg(v) * (deg(v) - 1))

    kept as the EXACT integer rational (2*tri, deg*(deg-1)) with one
    pinned IEEE division; deg < 2 nodes get 0 by the networkx
    convention (not NULL). The classic cohesion feature for spam/bot
    account detection and graph-quality gates on link corpora.

    Scale: degree is one combinable rollup over the symmetrized edge
    relation; triangles reuse triangle_count's oriented two-hop join
    (low-id -> high-id orientation caps candidate volume). Three
    shuffles total, all key-partitioned; no neighbor list ever
    materializes on one task."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    sym = (
        e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    deg = sym.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    tri = triangle_count(edges, src_col, dst_col)
    num = F.coalesce(F.col("n_tri"), F.lit(0)) * 2
    den = F.col("deg") * (F.col("deg") - 1)
    return deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
        num.cast("long").alias("lcc_num"),
        den.cast("long").alias("lcc_den"),
        F.when(
            F.col("deg") >= 2,
            num.cast("double") / den.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def clustering_coeff_sql(edges_cte: str) -> str:
    """DuckDB twin of clustering_coeff — same symmetrization, degree
    rollup, triangle closure, and pinned division."""
    return f"""
WITH e0 AS ({edges_cte}),
sym AS (SELECT DISTINCT _s, _d FROM (SELECT src AS _s, dst AS _d FROM e0
        UNION ALL SELECT dst, src FROM e0) u WHERE _s != _d),
deg AS (SELECT _s AS node, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY 1),
fwd AS (SELECT _s, _d FROM sym WHERE _s < _d),
tri AS (
  SELECT ab._s AS a, ab._d AS b, bc._d AS c
  FROM fwd ab JOIN fwd bc ON bc._s = ab._d
  JOIN fwd ac ON ac._s = ab._s AND ac._d = bc._d
),
corners AS (
  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
ntri AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
         FROM corners GROUP BY node)
SELECT d.node, d.deg,
       CAST(COALESCE(n.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(2 * COALESCE(n.n_tri, 0) AS BIGINT) AS lcc_num,
       CAST(d.deg * (d.deg - 1) AS BIGINT) AS lcc_den,
       CASE WHEN d.deg >= 2
            THEN CAST(2 * COALESCE(n.n_tri, 0) AS DOUBLE)
                 / CAST(d.deg * (d.deg - 1) AS DOUBLE)
            ELSE 0.0 END AS lcc
FROM deg d LEFT JOIN ntri n ON n.node = d.node
"""


def label_spread(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, label, round_assigned) — SEMI-SUPERVISED LABEL SPREADING
    with FROZEN assignments (the BFS-flavored hard variant of Zhu &
    Ghahramani 2002): seed nodes carry fixed labels (round 0); each
    round, every still-unlabeled node adjacent to labeled nodes takes
    the MAJORITY label among its labeled neighbors (vote-count ties
    break to the smallest label) and is then frozen. Unreached nodes
    after ``rounds`` are absent. The weak-supervision expansion gate
    (propagating moderation / topic / spam labels over an interaction
    graph).

    Determinism: integer votes, MAX(struct(count, −label)) argmax, no
    RNG; frozen assignments make the result order-independent.

    Scale: each round is one edge-keyed equi-join (labeled frontier ×
    edges, frontier usually ≪ graph) + one combinable vote rollup;
    lineage stays flat via localCheckpoint. Multi-seed conflicts
    resolve by the same pinned vote rule. Duplicate edges in the input
    count as extra votes (multigraph semantics) — dedupe upstream for
    simple-graph votes."""
    und = edges.select(
        F.col(src_col).cast("long").alias("u"),
        F.col(dst_col).cast("long").alias("v"),
    )
    und = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    labeled = seeds.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
        F.lit(0).alias("round_assigned"),
    ).localCheckpoint(eager=False)
    for r in range(1, int(rounds) + 1):
        votes = (
            und.join(
                labeled.select(
                    F.col("node").alias("u"), F.col("label").alias("l")
                ),
                "u",
            )
            .join(
                labeled.select(F.col("node").alias("v")),
                "v",
                "left_anti",
            )
            .groupBy(F.col("v").alias("node"), F.col("l").alias("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        newly = votes.groupBy("node").agg(
            F.max(
                F.struct(F.col("c").alias("c"), (-F.col("label")).alias("nl"))
            ).alias("_b")
        ).select(
            "node",
            (-F.col("_b.nl")).cast("long").alias("label"),
            F.lit(r).alias("round_assigned"),
        )
        labeled = labeled.unionByName(newly).localCheckpoint(eager=False)
    return labeled.select(
        "node", "label", F.col("round_assigned").cast("int").alias("round_assigned")
    )


def label_spread_sql(edges_cte: str, seeds_cte: str, rounds: int = 4) -> str:
    """DuckDB twin of label_spread — identical unrolled rounds with
    MATERIALIZED frontier CTEs and the same struct-argmax vote rule."""
    parts = [
        f"""ls_e0 AS ({edges_cte}),
ls_e AS MATERIALIZED (
  SELECT CAST(src AS BIGINT) AS u, CAST(dst AS BIGINT) AS v FROM ls_e0
  UNION ALL
  SELECT CAST(dst AS BIGINT) AS u, CAST(src AS BIGINT) AS v FROM ls_e0
),
ls_l0 AS MATERIALIZED (
  SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label,
         0 AS round_assigned
  FROM ({seeds_cte})
)"""
    ]
    for r in range(1, int(rounds) + 1):
        prev = f"ls_l{r - 1}"
        parts.append(
            f"""ls_l{r} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL
  SELECT node, CAST(-(max({{'c': c, 'nl': -label}}).nl) AS BIGINT) AS label,
         {r} AS round_assigned
  FROM (
    SELECT e.v AS node, l.label, CAST(count(*) AS BIGINT) AS c
    FROM ls_e e
    JOIN {prev} l ON l.node = e.u
    WHERE NOT EXISTS (SELECT 1 FROM {prev} x WHERE x.node = e.v)
    GROUP BY 1, 2
  ) GROUP BY node
)"""
        )
    return f"""
WITH {','.join(parts)}
SELECT node, label, CAST(round_assigned AS INTEGER) AS round_assigned
FROM ls_l{int(rounds)}
"""


def rich_club(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(k, n_k, e_k, phi_micro) — RICH-CLUB COEFFICIENT curve (Zhou &
    Mondragon 2004): for every degree threshold k present in the graph,
    the density among nodes of degree > k,

        phi(k) = 2·E_k / (N_k · (N_k − 1)),

    reported as the exact integer micro quotient. The hub-collusion
    diagnostic (do high-degree accounts preferentially interlink — bot
    rings, citation cartels).

    Mechanism (no per-k scans): each NODE row carries its degree, each
    EDGE row carries min(deg_u, deg_v); both N_k and E_k are SUFFIX
    counts of those two distributions — two combinable rollups to
    degree-valued histograms (at most max-degree rows) + one ordered
    window each over the tiny histogram. Duplicate/parallel edges are
    deduped (canonical u<v pairs); self-loops dropped."""
    e = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).cast("long").alias("u"),
        F.greatest(F.col(src_col), F.col(dst_col)).cast("long").alias("v"),
    ).filter(F.col("u") != F.col("v")).distinct()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    # N_k: suffix counts of the node-degree histogram
    dh = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # E_k: suffix counts of the edge min-degree histogram
    em = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select(F.least("du", "dv").alias("md"))
        .groupBy("md")
        .agg(F.count(F.lit(1)).cast("long").alias("ec"))
    )
    ks = dh.select(F.col("deg").alias("k")).distinct()
    wN = Window.orderBy(F.col("deg").asc()).rowsBetween(1, Window.unboundedFollowing)
    n_suffix = dh.select(
        F.col("deg").alias("k"),
        F.coalesce(F.sum("c").over(wN), F.lit(0)).cast("long").alias("n_k"),
    )
    # E_k at arbitrary thresholds: the md histogram's keys need not align
    # with node-degree values, so evaluate the suffix by a non-equi join
    # over the two TINY histograms (<= max-degree rows each).
    e_suffix = (
        ks.join(F.broadcast(em), F.col("md") > F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("ec"), F.lit(0)).cast("long").alias("e_k"))
    )
    out = (
        ks.join(n_suffix, "k", "left")
        .join(e_suffix, "k", "left")
        .select(
            "k",
            F.coalesce("n_k", F.lit(0)).alias("n_k"),
            F.coalesce("e_k", F.lit(0)).alias("e_k"),
        )
    )
    return out.withColumn(
        "phi_micro",
        F.when(
            F.col("n_k") >= 2,
            F.expr("2 * e_k * 1000000 DIV (n_k * (n_k - 1))"),
        ).cast("long"),
    )


def rich_club_sql(edges_cte: str) -> str:
    """DuckDB twin of rich_club — identical dedup, histograms, suffix
    windows and micro quotient."""
    return f"""
WITH rc_e0 AS ({edges_cte}),
rc_e AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM rc_e0 WHERE src <> dst
),
rc_deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM rc_e UNION ALL SELECT v FROM rc_e
  ) GROUP BY 1
),
rc_dh AS (SELECT deg, CAST(count(*) AS BIGINT) AS c FROM rc_deg GROUP BY 1),
rc_em AS (
  SELECT least(a.deg, b.deg) AS md, CAST(count(*) AS BIGINT) AS ec
  FROM rc_e
  JOIN rc_deg a ON a.node = rc_e.u
  JOIN rc_deg b ON b.node = rc_e.v
  GROUP BY 1
),
rc_n AS (
  SELECT deg AS k,
         CAST(COALESCE(sum(c) OVER (ORDER BY deg ASC
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS BIGINT)
           AS n_k
  FROM rc_dh
),
rc_ee AS (
  SELECT n.k,
         CAST(COALESCE(sum(e.ec), 0) AS BIGINT) AS e_k
  FROM rc_n n LEFT JOIN rc_em e ON e.md > n.k
  GROUP BY 1
)
SELECT n.k, n.n_k, COALESCE(e.e_k, 0) AS e_k,
       CASE WHEN n.n_k >= 2
            THEN 2 * COALESCE(e.e_k, 0) * 1000000 // (n.n_k * (n.n_k - 1))
       END AS phi_micro
FROM rc_n n LEFT JOIN rc_ee e ON e.k = n.k
"""


def four_clique_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, n_k4) — EXACT 4-CLIQUE COUNTING per node, the next rung
    of the clique ladder above triangle_count: K4 participation is the
    standard dense-community signal (a node in many K4s sits inside a
    near-clique cluster, not just a triangle-rich hub).

    DEGREE-ORDERED orientation (the standard arboricity trick): over
    the symmetrized simple graph, edges orient by (degree, id)
    lexicographic — u → v iff (deg(u), u) ≺ (deg(v), v) — so the
    oriented out-degree is O(√edges)-bounded on power-law graphs
    (id-order luck no longer governs extension fan-out). Each 4-clique
    {a ≺ b ≺ c ≺ d} materializes exactly once as an oriented triangle
    (a,b,c) extended by a fourth corner d adjacent to all three with
    c ≺ d:

        tri(a,b,c) ⋈ fwd(c,d) ⋈ fwd(b,d) ⋈ fwd(a,d)

    then credits all four corners in ONE pass (posexplode of the
    corner array, map-side-combined count — not a 4-branch union that
    would re-execute the join tree per branch). Per-node K4 counts
    are orientation-invariant, so any total order yields identical
    output. Exact int64 throughout; nodes in no K4 don't appear.

    Scale: the extension join fans out from each oriented triangle by
    the degree-capped oriented out-degree of c and the (b,d)/(a,d)
    probes are equi-join semijoins that shrink, not grow, the stream.
    One degree rollup + three shuffle joins past triangle_count's two
    + one combinable rollup — no adjacency list on one node."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    sym = (
        e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    deg = sym.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    fwd = (
        sym.join(deg.select(F.col("_s"), F.col("_deg").alias("_ds")), "_s")
        .join(
            deg.select(
                F.col("_s").alias("_d"), F.col("_deg").alias("_dd")
            ),
            "_d",
        )
        .filter(
            (F.col("_ds") < F.col("_dd"))
            | ((F.col("_ds") == F.col("_dd")) & (F.col("_s") < F.col("_d")))
        )
        .select("_s", "_d")
        .localCheckpoint(eager=False)
    )
    ab = fwd.select(F.col("_s").alias("a"), F.col("_d").alias("b"))
    bc = fwd.select(F.col("_s").alias("b"), F.col("_d").alias("c"))
    ac = fwd.select(F.col("_s").alias("a"), F.col("_d").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    cd = fwd.select(F.col("_s").alias("c"), F.col("_d").alias("d"))
    bd = fwd.select(F.col("_s").alias("b"), F.col("_d").alias("d"))
    ad = fwd.select(F.col("_s").alias("a"), F.col("_d").alias("d"))
    k4 = tri.join(cd, "c").join(bd, ["b", "d"]).join(ad, ["a", "d"])
    corners = k4.select(
        F.explode(F.array("a", "b", "c", "d")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_k4")
    )


def four_clique_count_sql(edges_cte: str) -> str:
    """DuckDB twin of four_clique_count — same degree-ordered
    orientation, same triangle extension, same per-corner credit."""
    return f"""
WITH e0 AS ({edges_cte}),
sym AS (SELECT DISTINCT _s, _d FROM (SELECT src AS _s, dst AS _d FROM e0
        UNION ALL SELECT dst, src FROM e0) u WHERE _s != _d),
dg AS (SELECT _s, COUNT(*) AS _deg FROM sym GROUP BY 1),
fwd AS (
  SELECT y._s, y._d FROM sym y
  JOIN dg ds ON ds._s = y._s JOIN dg dd ON dd._s = y._d
  WHERE ds._deg < dd._deg OR (ds._deg = dd._deg AND y._s < y._d)
),
tri AS (
  SELECT ab._s AS a, ab._d AS b, bc._d AS c
  FROM fwd ab JOIN fwd bc ON bc._s = ab._d
  JOIN fwd ac ON ac._s = ab._s AND ac._d = bc._d
),
k4 AS (
  SELECT t.a, t.b, t.c, cd._d AS d
  FROM tri t
  JOIN fwd cd ON cd._s = t.c
  JOIN fwd bd ON bd._s = t.b AND bd._d = cd._d
  JOIN fwd ad ON ad._s = t.a AND ad._d = cd._d
),
corners AS (
  SELECT a AS node FROM k4 UNION ALL SELECT b FROM k4
  UNION ALL SELECT c FROM k4 UNION ALL SELECT d FROM k4
)
SELECT node, CAST(count(*) AS BIGINT) AS n_k4 FROM corners GROUP BY node
"""


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """(node, score) — FIXED-POINT PERSONALIZED PAGERANK: random walk
    with restart onto a SEED set instead of the uniform vector — "rank
    everything by proximity to these query nodes", the standard
    related-item / local-community scorer (seeded recommendations,
    contamination blast-radius, similar-POI expansion).

    Identical integer scheme to pagerank_int (truncating int64
    division, bit-identical across engines and partitionings); the two
    differences are the restart vector — each round every SEED receives
    base = PR_SCALE·(100−d)/100 and non-seeds receive 0 — and the
    start state (seeds at PR_SCALE, everything else 0, so mass flows
    outward from the seeds only). Dangling/rounding leakage as in
    pagerank_int: rankings, not normalized probabilities, are the
    deliverable. Nodes never reached stay at score 0 and are kept (the
    zero rows ARE the answer for blast-radius queries).

    Scale: seed flags ride a broadcast-sized left join; everything else
    is pagerank_int's per-round combinable groupBy(dst) + node-keyed
    join with flat (localCheckpoint) lineage."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    flagged = (
        nodes.join(F.broadcast(sd.withColumn("_is_seed", F.lit(1))), "node", "left")
        .select("node", F.coalesce(F.col("_is_seed"), F.lit(0)).alias("_is_seed"))
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ed = e.join(deg, "_s").localCheckpoint(eager=False)
    base = PR_SCALE * (100 - damping_pct) // 100
    scores = flagged.select(
        "node",
        (F.col("_is_seed") * F.lit(PR_SCALE)).cast("long").alias("score"),
    )
    for _ in range(n_iters):
        contrib = (
            scores.join(ed, scores["node"] == ed["_s"])
            .select(
                F.col("_d").alias("node"),
                F.expr(f"(score * {damping_pct}) div 100 div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        scores = (
            flagged.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.col("_is_seed") * F.lit(base)
                    + F.coalesce(F.col("_c"), F.lit(0))
                )
                .cast("long")
                .alias("score"),
            )
            .localCheckpoint(eager=False)
        )
    return scores


def personalized_pagerank_sql(
    edges_cte: str,
    seeds_cte: str,
    n_iters: int = 3,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin of personalized_pagerank — unrolled rounds, identical
    truncating integer arithmetic and seed-only restart."""
    base = PR_SCALE * (100 - damping_pct) // 100
    parts = [
        f"WITH e AS ({edges_cte})",
        f"sd AS (SELECT DISTINCT node FROM ({seeds_cte}) s)",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT src AS node FROM e UNION SELECT dst FROM e) u)",
        "fl AS (SELECT n.node,"
        " CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS is_seed"
        " FROM nodes n LEFT JOIN sd ON sd.node = n.node)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src)",
        f"s0 AS (SELECT node, CAST(is_seed * {PR_SCALE} AS BIGINT) AS score"
        " FROM fl)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" CAST(sum(s{i-1}.score * {damping_pct} // 100 // deg.d)"
            f" AS BIGINT) AS c"
            f" FROM e JOIN s{i-1} ON s{i-1}.node = e.src"
            f" JOIN deg ON deg.src = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"s{i} AS (SELECT fl.node,"
            f" CAST(fl.is_seed * {base} + COALESCE(c{i}.c, 0) AS BIGINT)"
            f" AS score"
            f" FROM fl LEFT JOIN c{i} ON c{i}.node = fl.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, score FROM s{n_iters}"


SR_SCALE = 1_000_000  # fixed-point SimRank mass (diagonal = SCALE)


def simrank_int(
    edges: DataFrame,
    rounds: int = 3,
    c_num: int = 4,
    c_den: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(a, b, s) — FIXED-POINT SIMRANK (Jeh-Widom 2002): structural
    similarity "two nodes are similar if their in-neighbors are
    similar", the link-based twin of embedding cosine — citation/
    co-purchase similarity without features. C = c_num/c_den (0.8).

        s₀ = SCALE·𝟙[a=b]
        s'(a,b) = (c_num · Σ_{i→a, j→b} s(i,j))
                    div (c_den · indeg(a) · indeg(b)),  a ≠ b

    — all int64 with truncating division on nonnegatives, so every
    round is a pure function of the edge set: bit-identical across
    engines, partitionings, and the unrolled SQL twin. Pairs only
    materialize once reachable (round 1 = common-in-neighbor pairs);
    zero rows are dropped each round. Output is the upper triangle
    (a < b, s > 0) after ``rounds``.

    Scale: per round one join of the live pair set against the edge
    list per side (work = Σ outdeg(i)·outdeg(j) over live pairs) + a
    combinable rollup; localCheckpoint keeps lineage flat. SimRank is
    inherently pair-quadratic — run it on a community/sample subgraph,
    never the raw 10^12-edge graph (the operator caps nothing itself;
    the caller's subgraph IS the knob)."""
    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    indeg = e.groupBy(F.col("_d").alias("node")).agg(
        F.count(F.lit(1)).alias("ind")
    )
    diag = nodes.select(
        F.col("node").alias("a"),
        F.col("node").alias("b"),
        F.lit(SR_SCALE).cast("long").alias("s"),
    ).localCheckpoint(eager=False)
    cur = diag
    e1 = e.select(F.col("_s").alias("a"), F.col("_d").alias("na"))
    e2 = e.select(F.col("_s").alias("b"), F.col("_d").alias("nb"))
    for _ in range(rounds):
        summed = (
            cur.join(e1, "a")
            .join(e2, "b")
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(F.sum("s").alias("num"))
            .filter(F.col("a") != F.col("b"))
        )
        offdiag = (
            summed.join(
                indeg.select(F.col("node").alias("a"), F.col("ind").alias("ia")),
                "a",
            )
            .join(
                indeg.select(F.col("node").alias("b"), F.col("ind").alias("ib")),
                "b",
            )
            .select(
                "a",
                "b",
                F.expr(f"({c_num} * num) div ({c_den} * ia * ib)").alias("s"),
            )
            .filter(F.col("s") > 0)
        )
        cur = diag.unionByName(offdiag).localCheckpoint(eager=False)
    return cur.filter(F.col("a") < F.col("b")).select("a", "b", "s")


def simrank_sql(
    edges_cte: str, rounds: int = 3, c_num: int = 4, c_den: int = 5
) -> str:
    """DuckDB twin of simrank_int — unrolled MATERIALIZED rounds with
    the identical truncating update."""
    parts = [
        f"""WITH sr_e AS MATERIALIZED (
  SELECT DISTINCT src AS s, dst AS d FROM ({edges_cte}) WHERE src != dst
),
sr_nodes AS (SELECT DISTINCT node FROM
  (SELECT s AS node FROM sr_e UNION SELECT d FROM sr_e) u),
sr_ind AS (SELECT d AS node, CAST(count(*) AS BIGINT) AS ind
           FROM sr_e GROUP BY 1),
sr_s0 AS (SELECT node AS a, node AS b, CAST({SR_SCALE} AS BIGINT) AS s
          FROM sr_nodes)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""sr_n{i} AS MATERIALIZED (
  SELECT e1.d AS a, e2.d AS b, CAST(sum(p.s) AS BIGINT) AS num
  FROM sr_s{i-1} p
  JOIN sr_e e1 ON e1.s = p.a
  JOIN sr_e e2 ON e2.s = p.b
  WHERE e1.d != e2.d
  GROUP BY 1, 2
),
sr_s{i} AS MATERIALIZED (
  SELECT a, b, s FROM sr_s0
  UNION ALL
  SELECT n.a, n.b,
         ({c_num} * n.num) // ({c_den} * ia.ind * ib.ind) AS s
  FROM sr_n{i} n
  JOIN sr_ind ia ON ia.node = n.a
  JOIN sr_ind ib ON ib.node = n.b
  WHERE ({c_num} * n.num) // ({c_den} * ia.ind * ib.ind) > 0
)"""
        )
    body = ",\n".join(parts)
    return f"""{body}
SELECT a, b, s FROM sr_s{rounds} WHERE a < b
"""


def critical_path(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 8,
    node_col: str = "node",
    dur_col: str = "dur",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, dur, es, ef, lf, slack, critical) — CRITICAL-PATH METHOD
    over an activity-on-node DAG (Kelley-Walker CPM): earliest start =
    longest predecessor chain, latest finish = project end minus the
    longest successor chain, slack = lf - ef, critical = (slack == 0).
    The scheduling core of every pipeline/DAG planner (Airflow-style
    task graphs, build systems, shuffle-stage scheduling) — and the
    integer-exact sibling of shortest_dists with max instead of min.

    Forward pass: es(v) = max over predecessors u of (es(u) + dur(u)),
    0 at roots — one relax shuffle per round, max-rollup, converges in
    depth(DAG) rounds (``max_rounds`` must be >= depth; walks are
    monotone so an unchanged (count, sum) signature proves the fixed
    point and exits early). Backward pass: the same loop on reversed
    edges accumulating tail(v) = max over successors s of
    (tail(s) + dur(s)). Project end T = max(es + dur); lf = T - tail.
    All int64 — no floats anywhere, so the DuckDB recursive-CTE twin
    (walk enumeration + max per node) is bit-identical.

    Scale: per round the shuffle carries only (node, val) pairs and the
    max-rollup is map-side combinable; cycles would diverge, so the cap
    doubles as a safety bound (a DAG deeper than ``max_rounds`` yields
    bounded-horizon es/lf, still well-defined and twin-matched)."""
    nd = nodes.select(
        F.col(node_col).alias("node"), F.col(dur_col).cast("long").alias("dur")
    )
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))

    def _longest(rel: DataFrame, durs: DataFrame) -> DataFrame:
        # rel: (_s, _d); seed every node at 0, relax val(_d) >= val(_s)+dur(_s)
        lab = durs.select("node", F.lit(0).cast("long").alias("val")).localCheckpoint(
            eager=False
        )
        sig = lab.agg(F.count(F.lit(1)), F.sum("val")).collect()[0]
        ed = rel.join(
            durs.select(F.col("node").alias("_s"), F.col("dur").alias("_sw")), "_s"
        )
        for _ in range(max_rounds):
            relaxed = lab.join(ed, lab["node"] == ed["_s"]).select(
                F.col("_d").alias("node"), (F.col("val") + F.col("_sw")).alias("val")
            )
            lab = (
                lab.unionByName(relaxed)
                .groupBy("node")
                .agg(F.max("val").alias("val"))
                .localCheckpoint(eager=False)
            )
            nsig = lab.agg(F.count(F.lit(1)), F.sum("val")).collect()[0]
            if tuple(nsig) == tuple(sig):
                break
            sig = nsig
        return lab

    es = _longest(e, nd).withColumnRenamed("val", "es")
    tail = _longest(
        e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")), nd
    ).withColumnRenamed("val", "tail")
    out = nd.join(es, "node").join(tail, "node")
    out = out.withColumn("ef", F.col("es") + F.col("dur"))
    t_end = out.agg(F.max("ef").alias("t")).select("t")
    return (
        out.crossJoin(F.broadcast(t_end))
        .select(
            "node",
            "dur",
            "es",
            "ef",
            (F.col("t") - F.col("tail")).alias("lf"),
            (F.col("t") - F.col("tail") - F.col("ef")).alias("slack"),
            ((F.col("t") - F.col("tail") - F.col("ef")) == 0).alias("critical"),
        )
    )


def critical_path_sql(nodes_cte: str, edges_cte: str, max_rounds: int = 8) -> str:
    """DuckDB twin of critical_path: recursive walk enumeration forward
    (es) and backward (tail), max per node, identical T/lf/slack
    assembly. ``nodes_cte`` -> (node, dur); ``edges_cte`` -> (src, dst)."""
    return f"""
WITH RECURSIVE cp_n AS (
  SELECT node, CAST(dur AS BIGINT) AS dur FROM ({nodes_cte})
),
cp_e AS (SELECT src, dst FROM ({edges_cte})),
fwd(node, val, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM cp_n
  UNION
  SELECT e.dst, fwd.val + n.dur, fwd.hops + 1
  FROM fwd
  JOIN cp_e e ON e.src = fwd.node
  JOIN cp_n n ON n.node = fwd.node
  WHERE fwd.hops < {max_rounds}
),
bwd(node, val, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM cp_n
  UNION
  SELECT e.src, bwd.val + n.dur, bwd.hops + 1
  FROM bwd
  JOIN cp_e e ON e.dst = bwd.node
  JOIN cp_n n ON n.node = bwd.node
  WHERE bwd.hops < {max_rounds}
),
cp_es AS (SELECT node, MAX(val) AS es FROM fwd GROUP BY 1),
cp_tl AS (SELECT node, MAX(val) AS tail FROM bwd GROUP BY 1),
cp_j AS (
  SELECT n.node, n.dur, e.es, e.es + n.dur AS ef, t.tail
  FROM cp_n n JOIN cp_es e USING (node) JOIN cp_tl t USING (node)
),
cp_t AS (SELECT MAX(ef) AS t FROM cp_j)
SELECT node, dur, es, ef,
       (t.t - tail) AS lf,
       (t.t - tail - ef) AS slack,
       (t.t - tail - ef) = 0 AS critical
FROM cp_j, cp_t t
"""


def scc_coloring(
    edges: DataFrame,
    max_rounds: int | None = 64,
    trim_rounds: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, scc, scc_size) — EXACT STRONGLY CONNECTED COMPONENTS via
    Trim + forward-backward COLORING (Orzan 2004 / Slota et al. 2014,
    the standard distributed SCC): cycle detection in dependency/
    redirect/money-flow graphs (a component of size > 1 IS a cycle).
    scc(v) = min{u : u and v mutually reachable}; sizes attached.

    Each outer round: (1) TRIM — iteratively peel nodes with zero
    in- or out-degree in the surviving subgraph (they are singleton
    SCCs; kills DAG fringe, hub spokes, tails); (2) forward MIN-LABEL
    propagation to fixpoint — col(v) = smallest surviving node that
    reaches v; (3) the SCC membership test runs as a SECOND min-label
    propagation on the REVERSED, same-color-restricted edge set:
    col2(v) = min same-class node v reaches, and since the color root
    c is provably the minimum id of its class and v→c paths provably
    stay inside the class, v ∈ SCC(c) ⟺ col2(v) = col(v). Label and
    remove those, repeat on the remainder.

    Replaces the earlier reachability-PAIR formulation whose state
    grew as Σ|reach_H(v)| (quadratic on hub-heavy graphs): every
    frontier here — labels, survivors — is one row per NODE, so
    memory is O(nodes + edges) regardless of connectivity. Min-label
    propagation combines the edge relaxation with POINTER DOUBLING
    (col(col(v)) also reaches v), so a diameter-D phase converges in
    O(log D) materialized rounds, not D (the sf0.1 fixture needs 64
    edge hops = 8 doubling rounds). Outer-round complexity is the
    classic coloring bound (≤ #SCC rounds in the worst chain-of-
    cycles case, a handful on real graphs); the run raises past
    ``max_rounds`` (None = unbounded) rather than emit partial
    labels. localCheckpoint lineage truncation throughout."""
    e_all = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    nodes = (
        e_all.select(F.col("_s").alias("node"))
        .unionByName(e_all.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rem_edges = (
        e_all.filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rem_nodes = nodes
    n_rem = rem_nodes.count()
    out = nodes.limit(0).select("node", F.col("node").alias("scc"))
    rounds = 0
    while n_rem > 0:
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(
                f"scc_coloring: {n_rem} nodes unresolved after "
                f"{max_rounds} rounds (chain-of-cycles topology); "
                "raise max_rounds or pass max_rounds=None"
            )
        rounds += 1
        # (1) trim: survivors need an out-edge AND an in-edge
        for _ in range(trim_rounds):
            has_out = rem_edges.select(F.col("_s").alias("node")).distinct()
            has_in = rem_edges.select(F.col("_d").alias("node")).distinct()
            keep = stable_checkpoint(
                rem_nodes.join(has_out, "node", "left_semi")
                .join(has_in, "node", "left_semi")
            )
            n_keep = keep.count()
            if n_keep == n_rem:
                break
            trimmed = rem_nodes.join(keep, "node", "left_anti").select(
                "node", F.col("node").alias("scc")
            )
            out = out.unionByName(trimmed).localCheckpoint(eager=False)
            rem_nodes = keep
            rem_edges = stable_checkpoint(
                rem_edges.join(
                    keep.withColumnRenamed("node", "_s"), "_s", "left_semi"
                )
                .join(keep.withColumnRenamed("node", "_d"), "_d", "left_semi")
                .select("_s", "_d")
            )
            n_rem = n_keep
            if n_rem == 0:
                break
        if n_rem == 0:
            break
        # (2) forward: col(v) = min node that reaches v
        col = _min_reach_labels(rem_nodes, rem_edges)
        # (3) membership: col2 = min-reach on reversed same-class edges;
        # v is in SCC(col(v)) iff col2(v) == col(v)
        cols_s = col.select(F.col("node").alias("_s"), F.col("col").alias("_cs"))
        cols_d = col.select(F.col("node").alias("_d"), F.col("col").alias("_cd"))
        class_rev = stable_checkpoint(
            rem_edges.join(cols_s, "_s")
            .join(cols_d, "_d")
            .filter(F.col("_cs") == F.col("_cd"))
            .select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        col2 = _min_reach_labels(rem_nodes, class_rev)
        flag = stable_checkpoint(
            col.join(col2.withColumnRenamed("col", "col2"), "node")
            .filter(F.col("col") == F.col("col2"))
            .select("node", "col")
        )
        out = out.unionByName(
            flag.select("node", F.col("col").alias("scc"))
        ).localCheckpoint(eager=False)
        rem_nodes = stable_checkpoint(
            rem_nodes.join(flag.select("node"), "node", "left_anti")
        )
        rem_edges = stable_checkpoint(
            rem_edges.join(
                flag.select(F.col("node").alias("_s")), "_s", "left_anti"
            )
            .join(flag.select(F.col("node").alias("_d")), "_d", "left_anti")
            .select("_s", "_d")
        )
        n_rem = rem_nodes.count()
    size = out.groupBy("scc").agg(
        F.count(F.lit(1)).cast("long").alias("scc_size")
    )
    return out.join(size, "scc").select("node", "scc", "scc_size")


def _min_reach_labels(
    nodes: DataFrame, edges: DataFrame, step_batch: int = 4
) -> DataFrame:
    """(node, col) fixpoint of col(v) = min{u : u reaches v} (v itself
    included) over directed ``edges`` (_s, _d). Per materialized round:
    ``step_batch`` edge-relaxation hops chained lazily over the
    self-loop-augmented edge set (self-loops make each hop a SINGLE
    reference to the previous state — col'(v) = min over u→v∪self of
    col(u) — so the lazy plan grows linearly in batch depth), then one
    pointer-doubling hop (col(col(v)) also reaches v), so a diameter-D
    phase converges in ~D/step_batch·(shrinking) rounds with O(nodes)
    state per frontier. Rounds checkpoint via stable_checkpoint — a
    plain localCheckpoint here compounds the join-size statistics
    exponentially across rounds and melts the driver in BigInteger
    multiplies (see plans/iterate.py; measured 60 s/round by round 23
    before the fix, flat ~1 s after)."""
    e_sl = stable_checkpoint(
        edges.unionByName(
            nodes.select(F.col("node").alias("_s"), F.col("node").alias("_d"))
        )
    )
    col = stable_checkpoint(
        nodes.select("node", F.col("node").alias("col"))
    )
    while True:
        cur = col
        for _ in range(step_batch):
            cur = (
                e_sl.join(
                    cur.select(
                        F.col("node").alias("_s"), F.col("col").alias("pcol")
                    ),
                    "_s",
                )
                .groupBy(F.col("_d").alias("node"))
                .agg(F.min("pcol").alias("col"))
            )
        jmp = col.select(F.col("node").alias("col"), F.col("col").alias("jmin"))
        ncol = stable_checkpoint(
            cur.join(jmp, "col", "left")
            .select(
                "node",
                F.least(F.col("col"), F.coalesce("jmin", "col")).alias("col"),
            )
            .join(col.select("node", F.col("col").alias("_old")), "node")
        )
        changed = ncol.filter(F.col("col") < F.col("_old")).count()
        col = ncol.select("node", "col")
        if changed == 0:
            return col


def scc_sql(edges_cte: str) -> str:
    """DuckDB twin of scc_coloring: full recursive reachability both
    ways (exact — terminates via UNION dedup), identical min-label and
    size rollups. The twin may enumerate pairs — it is the small-data
    oracle, not the scale path."""
    return f"""
WITH RECURSIVE sc_e AS (SELECT src, dst FROM ({edges_cte})),
sc_n AS (SELECT DISTINCT src AS node FROM sc_e
         UNION SELECT DISTINCT dst FROM sc_e),
sc_r(a, b) AS (
  SELECT node, node FROM sc_n
  UNION
  SELECT r.a, e.dst FROM sc_r r JOIN sc_e e ON e.src = r.b
),
sc_m AS (
  SELECT f.a AS node, f.b AS u
  FROM sc_r f JOIN sc_r b ON b.a = f.b AND b.b = f.a
),
sc_lab AS (SELECT node, MIN(u) AS scc FROM sc_m GROUP BY 1),
sc_sz AS (SELECT scc, CAST(COUNT(*) AS BIGINT) AS scc_size
          FROM sc_lab GROUP BY 1)
SELECT l.node, l.scc, s.scc_size
FROM sc_lab l JOIN sc_sz s USING (scc)
"""


BC_MICRO = 1_000_000  # dependency fixed point for betweenness


def betweenness_bounded(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """(node, bc_micro) — BETWEENNESS CENTRALITY contributions (Brandes
    2001) from a pivot set, hop-bounded: the broker/bottleneck score of
    road junctions, API hubs, and influence graphs, estimated the way
    every at-scale system does it (pivot sampling — Brandes-Pich 2007;
    the pivot set here is the caller's deterministic sample, so the
    result is an exact function of input, not RNG).

    Per pivot s: a level-synchronous BFS accumulates σ(v) = #shortest
    s→v paths (exact int64 — sums of predecessor σ at first-discovery
    level); the backward sweep over shortest-path DAG levels
    accumulates fixed-point dependencies

        δ(v) = Σ_{(v,w) SP-DAG edge} σ(v)·(BC_MICRO + δ(w)) DIV σ(w)

    — per-edge truncating division on positives (identical in the
    unrolled twin), summed order-free. bc_micro(v) = Σ_pivots δ(v),
    endpoints excluded (δ of the pivot itself is not emitted).

    Scale: all pivots advance TOGETHER — state is (pivot, node) keyed,
    so each BFS round is one equi-join + anti-join + rollup shuffle
    regardless of pivot count; the backward pass is one join per level.
    Hop cap bounds both passes; 2·max_hops+1 shuffles total."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst_col).alias("_s"), F.col(src_col).alias("_d"))
        )
    e = e.distinct().localCheckpoint(eager=False)
    vis = (
        sources.select(F.col(node_col).alias("s"))
        .distinct()
        .select("s", F.col("s").alias("v"), F.lit(0).alias("d"),
                F.lit(1).cast("long").alias("sigma"))
        .localCheckpoint(eager=False)
    )
    frontier = vis
    levels = [vis]
    for d in range(1, max_hops + 1):
        cand = (
            frontier.join(e, frontier["v"] == e["_s"])
            .groupBy("s", F.col("_d").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = (
            cand.join(vis.select("s", "v").withColumn("_seen", F.lit(1)),
                      ["s", "v"], "left")
            .filter(F.col("_seen").isNull())
            .select("s", "v", F.lit(d).alias("d"), "sigma")
            .localCheckpoint(eager=False)
        )
        if nxt.rdd.isEmpty():
            break
        levels.append(nxt)
        vis = vis.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    # backward: delta at deepest level = 0; walk levels up
    delta = None  # DF (s, v, delta) for level d+1
    acc = None
    for d in range(len(levels) - 2, -1, -1):
        lv = levels[d]
        lw = levels[d + 1]
        if delta is not None:
            lw_d = lw.join(delta, ["s", "v"], "left").select(
                "s", "v", "sigma",
                F.coalesce(F.col("delta"), F.lit(0)).alias("delta"),
            )
        else:
            lw_d = lw.select("s", "v", "sigma", F.lit(0).alias("delta"))
        term = (
            lv.join(e, lv["v"] == e["_s"])
            .select("s", "v", "sigma", F.col("_d").alias("w"))
            .join(
                lw_d.select(
                    "s",
                    F.col("v").alias("w"),
                    F.col("sigma").alias("sig_w"),
                    F.col("delta").alias("del_w"),
                ),
                ["s", "w"],
            )
            .select(
                "s",
                "v",
                F.expr(
                    f"CAST(sigma * ({BC_MICRO} + del_w) DIV sig_w AS BIGINT)"
                ).alias("t"),
            )
        )
        delta = (
            term.groupBy("s", "v").agg(F.sum("t").cast("long").alias("delta"))
            .localCheckpoint(eager=False)
        )
        contrib = delta.filter(F.col("v") != F.col("s"))
        acc = contrib if acc is None else acc.unionByName(contrib)
    if acc is None:
        return vis.select(F.col("v").alias("node")).distinct().select(
            "node", F.lit(0).cast("long").alias("bc_micro")
        ).filter(F.lit(False))
    return (
        acc.groupBy(F.col("v").alias("node"))
        .agg(F.sum("delta").cast("long").alias("bc_micro"))
        .filter(F.col("bc_micro") > 0)
    )


def betweenness_bounded_sql(
    edges_cte: str,
    sources_cte: str,
    max_hops: int,
    directed: bool = False,
) -> str:
    """DuckDB twin of betweenness_bounded: walk enumeration gives
    (dist, sigma) per (pivot, node); the backward sweep is unrolled per
    level with identical fixed-point terms."""
    und = " UNION SELECT dst, src FROM bc_e0" if not directed else ""
    parts = [
        f"""bc_e0 AS (SELECT src, dst FROM ({edges_cte})),
bc_e AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM bc_e0{und})),
bc_s AS (SELECT DISTINCT node AS s FROM ({sources_cte})),
bc_walk(s, v, d) AS (
  SELECT s, s, 0 FROM bc_s
  UNION ALL
  SELECT w.s, e.dst, w.d + 1
  FROM bc_walk w JOIN bc_e e ON e.src = w.v
  WHERE w.d < {max_hops}
),
bc_dist AS (
  SELECT s, v, MIN(d) AS d FROM bc_walk GROUP BY 1, 2
),
bc_sig AS (
  SELECT w.s, w.v, dd.d, CAST(COUNT(*) AS BIGINT) AS sigma
  FROM bc_walk w JOIN bc_dist dd ON dd.s = w.s AND dd.v = w.v AND dd.d = w.d
  GROUP BY 1, 2, 3
),
bc_maxd AS (SELECT COALESCE(MAX(d), 0) AS md FROM bc_sig)"""
    ]
    # deepest possible level is max_hops; unroll from max_hops-1 .. 0,
    # levels deeper than the actual frontier just produce empty sets
    prev = None
    for d in range(max_hops - 1, -1, -1):
        dn = f"bc_del{d}"
        if prev is None:
            delta_w = "CAST(0 AS BIGINT)"
            prev_join = ""
        else:
            delta_w = "COALESCE(p.delta, 0)"
            prev_join = f" LEFT JOIN {prev} p ON p.s = lw.s AND p.v = lw.v"
        parts.append(
            f"""{dn} AS MATERIALIZED (
  SELECT lv.s, lv.v,
         CAST(SUM(lv.sigma * ({BC_MICRO} + {delta_w}) // lw.sigma)
              AS BIGINT) AS delta
  FROM bc_sig lv
  JOIN bc_e e ON e.src = lv.v
  JOIN bc_sig lw ON lw.s = lv.s AND lw.v = e.dst AND lw.d = {d + 1}
  {prev_join}
  WHERE lv.d = {d}
  GROUP BY 1, 2
)"""
        )
        prev = dn
    union = " UNION ALL ".join(
        f"SELECT s, v, delta FROM bc_del{d} WHERE v <> s"
        for d in range(max_hops - 1, -1, -1)
    )
    body = ",\n".join(parts)
    return f"""WITH RECURSIVE {body}
SELECT v AS node, CAST(SUM(delta) AS BIGINT) AS bc_micro
FROM ({union}) u
GROUP BY 1 HAVING SUM(delta) > 0
"""


def k_truss(
    edges: DataFrame,
    k: int,
    rounds: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(u, v, support) — K-TRUSS decomposition (Cohen 2008): iteratively
    delete every edge in fewer than k−2 triangles until stable — the
    community-core detector stronger than k-core (each surviving edge
    is embedded in a dense triangle mesh; the standard cohesive-
    subgraph primitive of fraud rings and social cores). Output is the
    surviving canonical edge set with its final triangle support.

    Each round: one oriented triangle enumeration (u<v<w via three
    joins on the canonicalized live set — the triangles operator's
    plan) → per-edge support rollup → filter support >= k−2. Rounds
    run to the caller's cap; peeling is monotone (the live set only
    shrinks) and each round is a pure function of the previous set, so
    an unchanged edge count proves the fixed point and later rounds
    are no-ops — the unrolled twin always runs the full cap and must
    land on the identical set.

    Scale: triangle enumeration is the classic Σ min(deg) join —
    orient by (node id) keeps it skew-bounded; support rollup is
    map-combinable; localCheckpoint flattens iterative lineage."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cnt = e.count()
    for _ in range(rounds):
        ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
        ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
        tri = ab.join(bc, "b").join(ac, ["a", "c"])
        sup = (
            tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
            .unionByName(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
        )
        e = (
            e.select("u", "v")
            .join(sup.withColumnRenamed("support", "_sup"), ["u", "v"], "left")
            .select(
                "u", "v",
                F.coalesce(F.col("_sup"), F.lit(0)).cast("long").alias(
                    "support"
                ),
            )
            .filter(F.col("support") >= k - 2)
            .localCheckpoint(eager=False)
        )
        ncnt = e.count()
        if ncnt == cnt:
            break
        cnt = ncnt
    return e


def k_truss_sql(edges_cte: str, k: int, rounds: int = 6) -> str:
    """DuckDB twin of k_truss — identical canonicalization and unrolled
    peel rounds (MATERIALIZED)."""
    parts = [
        f"""kt_e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM ({edges_cte}) WHERE src <> dst
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""kt_s{i} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
    SELECT t.a AS u, t.b AS v FROM (
      SELECT ab.u AS a, ab.v AS b, bc.v AS c
      FROM kt_e{i - 1} ab
      JOIN kt_e{i - 1} bc ON bc.u = ab.v
      JOIN kt_e{i - 1} ac ON ac.u = ab.u AND ac.v = bc.v
    ) t
    UNION ALL
    SELECT t.b, t.c FROM (
      SELECT ab.u AS a, ab.v AS b, bc.v AS c
      FROM kt_e{i - 1} ab
      JOIN kt_e{i - 1} bc ON bc.u = ab.v
      JOIN kt_e{i - 1} ac ON ac.u = ab.u AND ac.v = bc.v
    ) t
    UNION ALL
    SELECT t.a, t.c FROM (
      SELECT ab.u AS a, ab.v AS b, bc.v AS c
      FROM kt_e{i - 1} ab
      JOIN kt_e{i - 1} bc ON bc.u = ab.v
      JOIN kt_e{i - 1} ac ON ac.u = ab.u AND ac.v = bc.v
    ) t
  ) roles GROUP BY 1, 2
),
kt_e{i} AS MATERIALIZED (
  SELECT e.u, e.v, COALESCE(s.support, 0) AS support
  FROM kt_e{i - 1} e LEFT JOIN kt_s{i} s USING (u, v)
  WHERE COALESCE(s.support, 0) >= {k - 2}
)"""
        )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT u, v, CAST(support AS BIGINT) AS support FROM kt_e{rounds}
"""


def maximal_independent_set(
    edges: DataFrame,
    rounds: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, selected, round) — MAXIMAL INDEPENDENT SET by the
    deterministic id-priority variant of Luby's algorithm: each round,
    every live node whose id is smaller than all live neighbors' ids
    joins the MIS; selected nodes and their neighbors leave the live
    set. The conflict-free scheduling/sampling primitive (pick a set
    of mutually non-adjacent representatives — e.g., near-dup cluster
    exemplars that don't share an edge, conflict-free task slots).
    With id priorities the result is a pure function of the edge set —
    no RNG, twin-identical. ``round`` records when each node was
    decided (selected or knocked out); isolated nodes select in
    round 1.

    Termination: every round removes at least the globally smallest
    live id, and typically a constant fraction — ``rounds`` is a cap
    (12 suffices for the fixtures; raise it for adversarial chains:
    a path graph decided left-to-right needs O(n) by-id rounds, the
    known tradeoff for determinism vs Luby's random priorities).

    Scale: per round one min-neighbor rollup + two anti-joins, all on
    the shrinking live set; localCheckpoint flattens lineage."""
    e0 = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    e = (
        e0.unionByName(
            e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    live = nodes.localCheckpoint(eager=False)
    live_e = e
    decided = None
    for rnd in range(1, rounds + 1):
        min_nbr = live_e.groupBy(F.col("a").alias("node")).agg(
            F.min("b").alias("mn")
        )
        status = live.join(min_nbr, "node", "left")
        sel = status.filter(
            F.col("mn").isNull() | (F.col("node") < F.col("mn"))
        ).select("node")
        knocked = (
            live_e.join(
                sel.withColumnRenamed("node", "a"), "a"
            )
            .select(F.col("b").alias("node"))
            .distinct()
        )
        d = sel.select(
            "node", F.lit(True).alias("selected"), F.lit(rnd).cast("long").alias("round")
        ).unionByName(
            knocked.select(
                "node", F.lit(False).alias("selected"),
                F.lit(rnd).cast("long").alias("round"),
            )
        )
        decided = d if decided is None else decided.unionByName(d)
        gone = sel.unionByName(knocked).distinct()
        live = live.join(gone, "node", "left_anti").localCheckpoint(eager=False)
        if live.limit(1).count() == 0:
            break
        live_e = (
            live_e.join(gone.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(gone.withColumnRenamed("node", "b"), "b", "left_anti")
            .localCheckpoint(eager=False)
        )
    out = decided
    # any still-live nodes after the cap are reported undecided = absent
    return out.groupBy("node").agg(
        F.min(F.struct("round", "selected")).alias("d")
    ).select("node", F.col("d.selected").alias("selected"), F.col("d.round").alias("round"))


def maximal_independent_set_sql(edges_cte: str, rounds: int = 12) -> str:
    """DuckDB twin of maximal_independent_set — unrolled id-priority
    rounds (MATERIALIZED live sets)."""
    parts = [
        f"""mis_e0u AS (SELECT src AS a, dst AS b FROM ({edges_cte})),
mis_e0 AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM mis_e0u UNION ALL SELECT b, a FROM mis_e0u
  ) WHERE a <> b
),
mis_n0 AS MATERIALIZED (
  SELECT DISTINCT a AS node FROM mis_e0
  UNION SELECT DISTINCT b FROM mis_e0
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""mis_sel{i} AS MATERIALIZED (
  SELECT n.node FROM mis_n{i - 1} n
  LEFT JOIN (SELECT a AS node, MIN(b) AS mn FROM mis_e{i - 1} GROUP BY 1) m
    USING (node)
  WHERE m.mn IS NULL OR n.node < m.mn
),
mis_ko{i} AS MATERIALIZED (
  SELECT DISTINCT e.b AS node
  FROM mis_e{i - 1} e JOIN mis_sel{i} s ON s.node = e.a
),
mis_n{i} AS MATERIALIZED (
  SELECT node FROM mis_n{i - 1}
  WHERE node NOT IN (SELECT node FROM mis_sel{i})
    AND node NOT IN (SELECT node FROM mis_ko{i})
),
mis_e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM mis_e{i - 1} e
  JOIN mis_n{i} x ON x.node = e.a
  JOIN mis_n{i} y ON y.node = e.b
)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT node, TRUE AS selected, CAST({i} AS BIGINT) AS round"
        f" FROM mis_sel{i}"
        f" UNION ALL SELECT node, FALSE, CAST({i} AS BIGINT) FROM mis_ko{i}"
        for i in range(1, rounds + 1)
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT node, d.selected AS selected, d.round AS round FROM (
  SELECT node,
         MIN(struct_pack(round := round, selected := selected)) AS d
  FROM ({unions}) u GROUP BY 1
)
"""


def greedy_coloring(
    edges: DataFrame,
    rounds: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, color, round) — GREEDY GRAPH COLORING by id-priority
    Jones-Plassmann rounds: a node colors itself once every smaller-id
    neighbor is colored, taking the minimum color its already-colored
    neighbors don't use (mex). Conflict-free schedule/slot assignment
    (partition jobs that share a resource edge into rounds) with a
    deterministic outcome — identical to sequential greedy coloring in
    ascending id order, computed in parallel waves. ``round`` records
    each node's wave; isolated nodes color 0 in round 1.

    mex is computed relationally: candidate colors 0..deg(v) explode
    against the used-color set, min survivor wins — never a collect.
    ``rounds`` caps the waves (a by-id chain colors O(n) — the known
    determinism tradeoff, as in maximal_independent_set); uncolored
    nodes at the cap are absent from the output.

    Scale: per round one smaller-neighbor-uncolored check (anti-join),
    one used-color join, one mex rollup — all on the shrinking
    uncolored set; localCheckpoint flattens lineage."""
    e0 = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    e = (
        e0.unionByName(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    uncolored = nodes.join(deg, "node", "left").select(
        "node", F.coalesce(F.col("deg"), F.lit(0)).alias("deg")
    ).localCheckpoint(eager=False)
    colored = None  # (node, color, round)
    for rnd in range(1, rounds + 1):
        # ready: no smaller-id UNCOLORED neighbor
        blockers = (
            e.join(uncolored.select(F.col("node").alias("a")), "a")
            .join(uncolored.select(F.col("node").alias("b")), "b")
            .filter(F.col("b") < F.col("a"))
            .select(F.col("a").alias("node"))
            .distinct()
        )
        ready = uncolored.join(blockers, "node", "left_anti")
        if ready.limit(1).count() == 0:
            break
        if colored is not None:
            used = (
                e.join(ready.select(F.col("node").alias("a")), "a")
                .join(colored.select(F.col("node").alias("b"), "color"), "b")
                .select(F.col("a").alias("node"), "color")
                .distinct()
            )
        else:
            used = ready.select(
                "node", F.lit(0).cast("long").alias("color")
            ).filter(F.lit(False))
        cand = ready.select(
            "node",
            F.explode(F.sequence(F.lit(0), F.col("deg"))).alias("_c"),
        ).select("node", F.col("_c").cast("long").alias("color"))
        mex = (
            cand.join(used, ["node", "color"], "left_anti")
            .groupBy("node")
            .agg(F.min("color").cast("long").alias("color"))
            .select("node", "color", F.lit(rnd).cast("long").alias("round"))
            .localCheckpoint(eager=False)
        )
        colored = mex if colored is None else colored.unionByName(mex).localCheckpoint(
            eager=False
        )
        uncolored = uncolored.join(mex.select("node"), "node", "left_anti").localCheckpoint(
            eager=False
        )
    if colored is None:
        return nodes.select(
            "node", F.lit(0).cast("long").alias("color"),
            F.lit(0).cast("long").alias("round"),
        ).filter(F.lit(False))
    return colored


def greedy_coloring_sql(edges_cte: str, rounds: int = 12) -> str:
    """DuckDB twin of greedy_coloring — unrolled waves with the same
    mex-by-anti-join."""
    parts = [
        f"""gc_e0 AS (SELECT src AS a, dst AS b FROM ({edges_cte})),
gc_e AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM gc_e0 UNION ALL SELECT b, a FROM gc_e0
  ) WHERE a <> b
),
gc_n AS MATERIALIZED (
  SELECT node, COALESCE(d.deg, 0) AS deg FROM (
    SELECT DISTINCT a AS node FROM gc_e
    UNION SELECT DISTINCT b FROM gc_e
  ) n
  LEFT JOIN (SELECT a AS node, COUNT(*) AS deg FROM gc_e GROUP BY 1) d
    USING (node)
),
gc_u0 AS MATERIALIZED (SELECT node, deg FROM gc_n),
gc_c0 AS MATERIALIZED (
  SELECT node, CAST(0 AS BIGINT) AS color, CAST(0 AS BIGINT) AS round
  FROM gc_n WHERE FALSE
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""gc_r{i} AS MATERIALIZED (
  SELECT u.node, u.deg FROM gc_u{i - 1} u
  WHERE NOT EXISTS (
    SELECT 1 FROM gc_e e
    JOIN gc_u{i - 1} v ON v.node = e.b
    WHERE e.a = u.node AND e.b < u.node
  )
),
gc_mex{i} AS MATERIALIZED (
  SELECT c.node, CAST(MIN(c.color) AS BIGINT) AS color,
         CAST({i} AS BIGINT) AS round
  FROM (
    SELECT r.node, unnest(range(0, r.deg + 1)) AS color FROM gc_r{i} r
  ) c
  WHERE NOT EXISTS (
    SELECT 1 FROM gc_e e
    JOIN gc_c{i - 1} k ON k.node = e.b
    WHERE e.a = c.node AND k.color = c.color
  )
  GROUP BY 1
),
gc_c{i} AS MATERIALIZED (
  SELECT node, color, round FROM gc_c{i - 1}
  UNION ALL SELECT node, color, round FROM gc_mex{i}
),
gc_u{i} AS MATERIALIZED (
  SELECT u.node, u.deg FROM gc_u{i - 1} u
  WHERE u.node NOT IN (SELECT node FROM gc_mex{i})
)"""
        )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT node, color, round FROM gc_c{rounds}
"""


HC_MICRO = 1_000_000  # harmonic centrality fixed point


def harmonic_centrality(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """(node, hc_micro, n_reached) — HARMONIC CENTRALITY contributions
    from a pivot set (Boldi-Vigna's recommended closeness variant —
    sums 1/d so disconnection costs 0 instead of ∞), hop-bounded and
    pivot-sampled exactly like betweenness_bounded:

        hc(v) = Σ_pivots  HC_MICRO DIV d(pivot, v),   d ≥ 1

    — per-pivot truncating division on positives, order-free integer
    sum; n_reached counts contributing pivots. The "how central is
    this junction/hub really" score that survives disconnected and
    bounded-horizon graphs.

    Scale: one frontier BFS with (pivot, node) keyed state — one
    equi-join + anti-join + min-rollup per round, all pivots advance
    together; state is Σ|reach_H| pairs."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst_col).alias("_s"), F.col(src_col).alias("_d"))
        )
    e = e.distinct().localCheckpoint(eager=False)
    vis = (
        sources.select(F.col(node_col).alias("s"))
        .distinct()
        .select("s", F.col("s").alias("v"), F.lit(0).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    frontier = vis
    for d in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["v"] == e["_s"])
            .select("s", F.col("_d").alias("v"))
            .distinct()
            .join(vis.select("s", "v").withColumn("_seen", F.lit(1)),
                  ["s", "v"], "left")
            .filter(F.col("_seen").isNull())
            .select("s", "v", F.lit(d).cast("long").alias("d"))
            .localCheckpoint(eager=False)
        )
        if nxt.limit(1).count() == 0:
            break
        vis = vis.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    contrib = vis.filter(F.col("d") > 0)
    return (
        contrib.groupBy(F.col("v").alias("node"))
        .agg(
            F.sum(F.expr(f"CAST({HC_MICRO} DIV d AS BIGINT)"))
            .cast("long")
            .alias("hc_micro"),
            F.count(F.lit(1)).cast("long").alias("n_reached"),
        )
    )


def harmonic_centrality_sql(
    edges_cte: str, sources_cte: str, max_hops: int, directed: bool = False
) -> str:
    """DuckDB twin of harmonic_centrality — recursive min-dist walk."""
    und = " UNION SELECT dst, src FROM hc_e0" if not directed else ""
    return f"""
WITH RECURSIVE hc_e0 AS (SELECT src, dst FROM ({edges_cte})),
hc_e AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM hc_e0{und})),
hc_s AS (SELECT DISTINCT node AS s FROM ({sources_cte})),
hc_w(s, v, d) AS (
  SELECT s, s, 0 FROM hc_s
  UNION
  SELECT w.s, e.dst, w.d + 1
  FROM hc_w w JOIN hc_e e ON e.src = w.v
  WHERE w.d < {max_hops}
),
hc_d AS (SELECT s, v, MIN(d) AS d FROM hc_w GROUP BY 1, 2)
SELECT v AS node,
       CAST(SUM({HC_MICRO} // d) AS BIGINT) AS hc_micro,
       CAST(COUNT(*) AS BIGINT) AS n_reached
FROM hc_d WHERE d > 0
GROUP BY 1
"""


def greedy_matching(
    edges: DataFrame,
    rounds: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(u, v, round) — MAXIMAL MATCHING by deterministic edge-priority
    rounds (Luby on the line graph, priority = canonical edge id
    (u, v) ascending): an edge joins the matching when it has the
    smallest id among all live edges it touches; matched endpoints
    knock out their other edges. The pair-assignment primitive —
    merge-partner selection for near-dup pairs, buddy scheduling,
    one-to-one dedupe — maximal (no augmenting needed for maximality)
    and a 1/2-approximation to maximum matching, fully deterministic.

    Scale: per round one min-edge-per-endpoint rollup + an equi-join
    to test "minimum at BOTH endpoints", then two anti-joins — all on
    the shrinking live edge set; same contract as
    maximal_independent_set (worst-case O(n) rounds on chains, capped
    by ``rounds``)."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out = None
    for rnd in range(1, rounds + 1):
        ends = e.select("u", "v", F.col("u").alias("node")).unionByName(
            e.select("u", "v", F.col("v").alias("node"))
        )
        best = ends.groupBy("node").agg(
            F.min(F.struct("u", "v")).alias("b")
        ).select("node", F.col("b.u").alias("bu"), F.col("b.v").alias("bv"))
        picked = (
            e.join(
                best.select(
                    F.col("node").alias("u"),
                    F.col("bu").alias("u1"),
                    F.col("bv").alias("v1"),
                ),
                "u",
            )
            .join(
                best.select(
                    F.col("node").alias("v"),
                    F.col("bu").alias("u2"),
                    F.col("bv").alias("v2"),
                ),
                "v",
            )
            .filter(
                (F.col("u") == F.col("u1")) & (F.col("v") == F.col("v1"))
                & (F.col("u") == F.col("u2")) & (F.col("v") == F.col("v2"))
            )
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        if picked.limit(1).count() == 0:
            break
        lab = picked.select("u", "v", F.lit(rnd).cast("long").alias("round"))
        out = lab if out is None else out.unionByName(lab)
        matched_nodes = picked.select(F.col("u").alias("node")).unionByName(
            picked.select(F.col("v").alias("node"))
        ).distinct()
        e = (
            e.join(matched_nodes.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(matched_nodes.withColumnRenamed("node", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        if e.limit(1).count() == 0:
            break
    if out is None:
        return e.select("u", "v", F.lit(0).cast("long").alias("round")).filter(
            F.lit(False)
        )
    return out


def greedy_matching_sql(edges_cte: str, rounds: int = 12) -> str:
    """DuckDB twin of greedy_matching — unrolled rounds, identical
    both-endpoint-minimum rule."""
    parts = [
        f"""gm_e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM ({edges_cte}) WHERE src <> dst
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""gm_best{i} AS MATERIALIZED (
  SELECT node, MIN(struct_pack(u := u, v := v)) AS b FROM (
    SELECT u, v, u AS node FROM gm_e{i - 1}
    UNION ALL SELECT u, v, v FROM gm_e{i - 1}
  ) GROUP BY 1
),
gm_pick{i} AS MATERIALIZED (
  SELECT e.u, e.v
  FROM gm_e{i - 1} e
  JOIN gm_best{i} a ON a.node = e.u
  JOIN gm_best{i} b ON b.node = e.v
  WHERE a.b.u = e.u AND a.b.v = e.v AND b.b.u = e.u AND b.b.v = e.v
),
gm_e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM gm_e{i - 1} e
  WHERE e.u NOT IN (SELECT u FROM gm_pick{i}
                    UNION SELECT v FROM gm_pick{i})
    AND e.v NOT IN (SELECT u FROM gm_pick{i}
                    UNION SELECT v FROM gm_pick{i})
)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT u, v, CAST({i} AS BIGINT) AS round FROM gm_pick{i}"
        for i in range(1, rounds + 1)
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
{unions}
"""


def reciprocity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One row (n_edges, n_reciprocal, reciprocity_micro) — directed-
    graph RECIPROCITY: the fraction of directed edges whose reverse
    also exists (follow-back rate, mutual-link share — the first
    summary of any directed social/interaction graph). Exact:
    n_reciprocal counts ordered edges with a reverse partner,
    reciprocity_micro = 10⁶·n_reciprocal DIV n_edges.

    Scale: distinct edge set self-joined on the swapped key — one
    equi-join + one global rollup, no windows."""
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b")).withColumn(
        "_r", F.lit(1)
    )
    j = e.join(rev, ["a", "b"], "left")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.coalesce(F.col("_r"), F.lit(0))).cast("long").alias(
            "n_reciprocal"
        ),
    ).select(
        "n_edges",
        "n_reciprocal",
        F.expr(
            "CAST(1000000 * n_reciprocal DIV greatest(n_edges, 1) AS BIGINT)"
        ).alias("reciprocity_micro"),
    )


def reciprocity_sql(edges_cte: str) -> str:
    """DuckDB twin of reciprocity. ``edges_cte`` -> (src, dst)."""
    return f"""
WITH rc_e AS (
  SELECT DISTINCT src AS a, dst AS b FROM ({edges_cte}) WHERE src <> dst
),
rc_j AS (
  SELECT e.a, e.b, CASE WHEN r.a IS NOT NULL THEN 1 ELSE 0 END AS rec
  FROM rc_e e
  LEFT JOIN rc_e r ON r.a = e.b AND r.b = e.a
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(rec) AS BIGINT) AS n_reciprocal,
       CAST(1000000 * SUM(rec) // GREATEST(COUNT(*), 1) AS BIGINT)
         AS reciprocity_micro
FROM rc_j
"""
