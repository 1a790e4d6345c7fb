"""bfs_hops — validated against a plain Python BFS on random sparse
graphs (directed and undirected), early-exit behavior, multi-source min
semantics."""

from __future__ import annotations

from collections import deque

import numpy as np

from osm2geojson_spark.operators.graph import bfs_hops


def _rand_graph(seed, n=150, m=300):
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
    ]


def _brute(edges, sources, max_hops, directed):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        if not directed:
            adj.setdefault(d, []).append(s)
    dist = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        v = dq.popleft()
        if dist[v] >= max_hops:
            continue
        for w in adj.get(v, []):
            if w not in dist:
                dist[w] = dist[v] + 1
                dq.append(w)
    return dist


def _run(spark, edges, sources, max_hops, directed):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {
        r["node"]: r["hops"]
        for r in bfs_hops(e, s, max_hops, directed=directed).collect()
    }


def test_bfs_directed_matches_brute(spark):
    edges = _rand_graph(1)
    sources = [0, 7, 77]
    got = _run(spark, edges, sources, 3, True)
    assert got == _brute(edges, sources, 3, True)


def test_bfs_undirected_matches_brute(spark):
    edges = _rand_graph(2)
    sources = [5]
    got = _run(spark, edges, sources, 4, False)
    want = _brute(edges, [5], 4, False)
    assert got == want
    assert len(want) > 10  # non-degenerate


def test_bfs_source_is_zero_even_if_target(spark):
    # a source that is also an edge target keeps hops = 0 (min semantics)
    edges = [(1, 2), (2, 1)]
    got = _run(spark, edges, [1, 2], 3, True)
    assert got == {1: 0, 2: 0}


def test_bfs_early_exit_and_cap(spark):
    # chain 0-1-2-3-4-5: cap at 2 hops reaches only 0..2
    edges = [(i, i + 1) for i in range(5)]
    got = _run(spark, edges, [0], 2, True)
    assert got == {0: 0, 1: 1, 2: 2}
    # disconnected node never appears even with a generous cap
    got2 = _run(spark, edges + [(100, 101)], [0], 10, True)
    assert 100 not in got2 and 101 not in got2 and got2[5] == 5


# ------------------------------------------------ weighted shortest paths


def _brute_dists(edges, sources, max_hops, directed):
    """Bounded Bellman-Ford in plain Python: min weight over walks with at
    most max_hops edges."""
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        if not directed:
            adj.setdefault(d, []).append((s, w))
    dist = {s: 0 for s in sources}
    for _ in range(max_hops):
        nxt = dict(dist)
        for v, dv in dist.items():
            for u, w in adj.get(v, []):
                if dv + w < nxt.get(u, float("inf")):
                    nxt[u] = dv + w
        if nxt == dist:
            break
        dist = nxt
    return dist


def _wgraph(seed, n=120, m=320):
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(0, n)), int(rng.integers(0, n)),
         int(rng.integers(1, 25)))
        for _ in range(m)
    ]


def _run_dists(spark, edges, sources, max_hops, directed):
    from osm2geojson_spark.operators.graph import shortest_dists

    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {
        r["node"]: r["dist"]
        for r in shortest_dists(
            e, s, max_hops=max_hops, directed=directed
        ).collect()
    }


def test_shortest_dists_matches_bruteforce(spark):
    for seed, directed in ((3, True), (4, False)):
        edges = _wgraph(seed)
        sources = [0, 7, 55]
        for hops in (1, 3, 5):
            got = _run_dists(spark, edges, sources, hops, directed)
            want = _brute_dists(edges, sources, hops, directed)
            assert got == want, (seed, directed, hops)
            assert len(want) > len(sources)  # non-degenerate reach


def test_shortest_dists_weighted_detour_beats_direct(spark):
    # direct edge weight 10; two-hop detour weight 2+3 -> dist 5 needs
    # 2 hops, so hops=1 reports 10 and hops=2 reports 5
    edges = [(0, 1, 10), (0, 2, 2), (2, 1, 3)]
    assert _run_dists(spark, edges, [0], 1, True)[1] == 10
    assert _run_dists(spark, edges, [0], 2, True)[1] == 5


def test_shortest_dists_early_exit_and_source_min(spark):
    # sources keep dist 0 even with incoming edges; a converged graph
    # exits before the hop cap (result equals the unbounded answer)
    edges = [(0, 1, 4), (1, 0, 1), (1, 2, 1)]
    got = _run_dists(spark, edges, [0, 2], 50, True)
    assert got == {0: 0, 2: 0, 1: 4}


# ------------------------------------------------------ integer PageRank


def _brute_pagerank(edges, n_iters, damping=85):
    SCALE = 1_000_000_000_000
    nodes = {v for e in edges for v in e}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = SCALE * (100 - damping) // 100
    score = {v: SCALE for v in nodes}
    for _ in range(n_iters):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += (score[s] * damping) // 100 // deg[s]
        score = {v: base + contrib[v] for v in nodes}
    return score


def test_pagerank_matches_bruteforce(spark):
    from osm2geojson_spark.operators.graph import pagerank_int

    edges = [(int(a), int(b)) for a, b in _rand_graph(9, n=80, m=240)]
    # add a dangling node (in-edges only) and duplicate edges
    edges += [(0, 999), (3, 5), (3, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 3):
        got = {
            r["node"]: r["score"]
            for r in pagerank_int(e, n_iters=iters).collect()
        }
        assert got == _brute_pagerank(edges, iters), iters


def test_pagerank_hub_ranks_highest(spark):
    from osm2geojson_spark.operators.graph import pagerank_int

    # star: everyone points at 0
    edges = [(i, 0) for i in range(1, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["score"] for r in pagerank_int(e, n_iters=3).collect()}
    assert got[0] == max(got.values())
    assert all(got[0] > v for k, v in got.items() if k != 0)


# ------------------------------------------------------- isochrone cells


def test_isochrone_cells_matches_brute(spark):
    from osm2geojson_spark.operators import cells
    from osm2geojson_spark.operators.graph import isochrone_cells, shortest_dists

    edges = _wgraph(13, n=100, m=260)
    sources = [0, 42]
    coords = [
        (v, float((v * 37) % 120 - 60), float((v * 53) % 80 - 40))
        for v in range(100)
    ]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    c = spark.createDataFrame(coords, "node long, lon double, lat double")
    d = shortest_dists(e, s, max_hops=3, directed=False)
    tiers, res = [10, 25, 50], 4
    got = {
        (r["tier"], r["cell_id"])
        for r in isochrone_cells(d, c, tiers, res).collect()
    }
    # brute: python dists -> min dist per cell -> smallest covering tier
    dd = _brute_dists(edges, sources, 3, False)
    cellmin = {}
    n = 1 << res
    for v, dist in dd.items():
        lon, lat = coords[v][1], coords[v][2]
        x = max(0, min(n - 1, int((lon + 180.0) / 360.0 * n)))
        y = max(0, min(n - 1, int((lat + 90.0) / 180.0 * n)))
        cid = cells.pack_cell_py(res, x, y)
        cellmin[cid] = min(cellmin.get(cid, 10**9), dist)
    want = set()
    for cid, md in cellmin.items():
        if md <= tiers[-1]:
            want.add((next(t for t in tiers if md <= t), cid))
    assert got == want
    assert len({t for t, _ in want}) >= 2  # multiple tiers present


def _brute_lpa(edges, n_iters):
    sym = set()
    for s, d in edges:
        sym.add((s, d))
        sym.add((d, s))
    nodes = sorted({s for s, _ in sym})
    nbrs = {n: [] for n in nodes}
    for s, d in sym:
        nbrs[d].append(s)
    lbl = {n: n for n in nodes}
    for _ in range(n_iters):
        new = {}
        for n in nodes:
            cnt = {}
            for v in nbrs[n]:
                cnt[lbl[v]] = cnt.get(lbl[v], 0) + 1
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        lbl = new
    return lbl


def test_lpa_two_cliques_with_bridge(spark):
    from osm2geojson_spark.operators.graph import label_propagation

    import itertools

    k4a = list(itertools.combinations([0, 1, 2, 3], 2))
    k4b = list(itertools.combinations([10, 11, 12, 13], 2))
    edges = k4a + k4b + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iters=4).collect()
    }
    assert got == _brute_lpa(edges, 4)
    # each K4 collapses to a single community label; the one bridge edge
    # cannot outvote the clique majority, so the two stay distinct
    a = {got[n] for n in (0, 1, 2, 3)}
    b = {got[n] for n in (10, 11, 12, 13)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_lpa_matches_brute_on_random_graph_and_sql_twin(spark, duckdb_conn=None):
    import duckdb
    import numpy as np

    from osm2geojson_spark.operators.graph import (
        label_propagation,
        label_propagation_sql,
    )

    rng = np.random.default_rng(13)
    edges = sorted(
        {
            (int(rng.integers(0, 60)), int(rng.integers(0, 60)))
            for _ in range(150)
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iters=3).collect()
    }
    assert got == _brute_lpa(edges, 3)

    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = label_propagation_sql(
        f"SELECT src, dst FROM (VALUES {vals}) t(src, dst)"
    )
    twin = dict(duckdb.sql(sql).fetchall())
    assert got == twin


def test_k_core_matches_brute_peeling(spark):
    import duckdb
    import numpy as np

    from osm2geojson_spark.operators.graph import k_core, k_core_sql

    rng = np.random.default_rng(17)
    # a K5 (4-core) + a long tail of degree-2 chains hanging off it
    import itertools

    edges = list(itertools.combinations(range(5), 2))
    edges += [(4, 10), (10, 11), (11, 12), (12, 13)]
    # random clutter on a DISJOINT node range so the K5/chain hand-check
    # below stays valid regardless of what cores the clutter forms
    edges += sorted(
        {
            (int(rng.integers(100, 130)), int(rng.integers(100, 130)))
            for _ in range(60)
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 3, 4):
        got = {
            r["node"]: r["deg"] for r in k_core(df, k, n_rounds=10).collect()
        }
        # brute peel to the fixed point
        nbrs = {}
        for s, d in edges:
            if s != d:
                nbrs.setdefault(s, set()).add(d)
                nbrs.setdefault(d, set()).add(s)
        alive = set(nbrs)
        while True:
            drop = {v for v in alive if len(nbrs[v] & alive) < k}
            if not drop:
                break
            alive -= drop
        want = {v: len(nbrs[v] & alive) for v in alive}
        assert got == want
        vals = ", ".join(f"({s}, {d})" for s, d in edges)
        twin = dict(
            duckdb.sql(
                k_core_sql(
                    f"SELECT src, dst FROM (VALUES {vals}) t(src, dst)",
                    k, n_rounds=10,
                )
            ).fetchall()
        )
        assert twin == got
    # the K5 survives k=4; the chain does not
    got4 = {r["node"] for r in k_core(df, 4, n_rounds=10).collect()}
    assert {0, 1, 2, 3, 4} <= got4 and 12 not in got4


def test_triangle_count_matches_brute(spark):
    import duckdb
    import numpy as np

    from osm2geojson_spark.operators.graph import (
        triangle_count,
        triangle_count_sql,
    )

    rng = np.random.default_rng(19)
    edges = sorted(
        {(int(rng.integers(0, 25)), int(rng.integers(0, 25))) for _ in range(90)}
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}

    nbrs = {}
    for s, d in edges:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    want = {}
    nodes = sorted(nbrs)
    for a in nodes:
        for b in nbrs[a]:
            for c in nbrs[a] & nbrs[b]:
                if a < b < c:
                    for v in (a, b, c):
                        want[v] = want.get(v, 0) + 1
    assert got == want

    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    twin = dict(
        duckdb.sql(
            triangle_count_sql(f"SELECT src, dst FROM (VALUES {vals}) t(src, dst)")
        ).fetchall()
    )
    assert twin == got
    # hand check: a triangle planted on the K-ish fixture exists
    assert sum(got.values()) % 3 == 0


def test_hits_int_matches_numpy_power_iteration(spark):
    """hits_int's integer max-normalized scores rank nodes identically to
    float HITS power iteration on a planted hub/authority graph."""
    import numpy as np

    from osm2geojson_spark.operators.graph import HITS_SCALE, hits_int

    # planted structure: node 0 is a pure hub pointing at 1..4;
    # node 5 is a second hub pointing at 1..2; 9 is an isolated-ish edge
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 1), (5, 2), (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits_int(df, 2).collect()}

    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1
    h = np.ones(len(nodes))
    for _ in range(2):
        a = A.T @ h
        a = a / a.max()
        h = A @ a
        h = h / h.max()
    # float ranking must agree with integer ranking
    f_hub = sorted(nodes, key=lambda u: (-h[idx[u]], u))
    i_hub = sorted(nodes, key=lambda u: (-got[u][0], u))
    assert f_hub == i_hub
    f_auth = sorted(nodes, key=lambda u: (-a[idx[u]], u))
    i_auth = sorted(nodes, key=lambda u: (-got[u][1], u))
    assert f_auth == i_auth
    # the best hub holds the scale ceiling; sinks have hub 0
    assert got[0][0] == HITS_SCALE
    assert got[9][0] == 0  # node 9 has no out-edges -> hub 0
    assert got[0][1] == 0  # node 0 has no in-edges -> auth 0


def test_link_scores_matches_brute(spark):
    """link_scores == a dict brute force: non-edges only, a < b,
    min_common gate, exact integer RA micro-units and Jaccard fraction."""
    from osm2geojson_spark.operators.graph import RA_SCALE, link_scores

    edges = _rand_graph(7, n=40, m=90)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["a"], r["b"]): r for r in link_scores(df, min_common=1).collect()
    }

    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            want[(a, b)] = (
                len(common),
                sum(RA_SCALE // len(adj[z]) for z in common),
                len(common),
                len(adj[a]) + len(adj[b]) - len(common),
            )
    assert set(got) == set(want)
    for k, (c, ra, jn, jd) in want.items():
        r = got[k]
        assert (r["common"], r["ra_micro"], r["jacc_num"], r["jacc_den"]) == (
            c, ra, jn, jd,
        ), k


def test_link_scores_min_common_and_max_degree(spark):
    """min_common filters pairs; max_degree drops hub wedges (path through
    the hub no longer counted)."""
    from osm2geojson_spark.operators.graph import link_scores

    # star: hub 0 connected to 1..5; plus edge 1-2
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # all leaf pairs share only the hub -> common=1
    base = link_scores(df, min_common=1).collect()
    pairs = {(r["a"], r["b"]) for r in base}
    assert (3, 4) in pairs and (1, 2) not in pairs  # 1-2 is an edge
    assert link_scores(df, min_common=2).count() == 0
    # capping out the deg-5 hub removes every wedge
    assert link_scores(df, min_common=1, max_degree=4).count() == 0


def test_degree_assortativity_textbook_and_twin(spark):
    """networkx-formula float check on a hand graph with known sign
    structure: a star is maximally disassortative (r = -1); a path of
    4 nodes has r = -0.5; twin exact."""
    import duckdb

    from osm2geojson_spark.operators.graph import (
        degree_assortativity,
        degree_assortativity_sql,
    )

    def run(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        row = degree_assortativity(df).collect()[0]
        duck = duckdb.connect()
        duck.execute("CREATE TABLE ed (src BIGINT, dst BIGINT)")
        duck.executemany("INSERT INTO ed VALUES (?, ?)", edges)
        twin = duck.sql(
            degree_assortativity_sql("SELECT * FROM ed")
        ).fetchall()[0]
        assert twin == tuple(row), edges
        duck.close()
        return row

    # star K_{1,4}: r = -1
    star = run([(0, i) for i in range(1, 5)])
    assert star["m_edges"] == 4 and star["r"] == -1.0

    # path 0-1-2-3: r = -0.5
    path = run([(0, 1), (1, 2), (2, 3)])
    assert path["m_edges"] == 3 and abs(path["r"] + 0.5) < 1e-12

    # 4-cycle: regular -> zero variance -> NULL
    cyc = run([(0, 1), (1, 2), (2, 3), (3, 0)])
    assert cyc["r"] is None

    # float Pearson cross-check on a mixed graph (stub formulation)
    edges = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (5, 3), (1, 2)]
    row = run(edges)
    sym = set()
    for s, d in edges:
        sym.add((s, d))
        sym.add((d, s))
    from collections import Counter

    deg = Counter(s for s, _ in sym)
    xs = [deg[s] for s, d in sym]
    ys = [deg[d] for s, d in sym]
    m = len(sym)
    mean = sum(xs) / m
    cov = sum(x * y for x, y in zip(xs, ys)) / m - mean * mean
    var = sum(x * x for x in xs) / m - mean * mean
    assert abs(row["r"] - cov / var) < 1e-9


def test_tree_rollup_brute_and_twin(spark):
    """Dict replay on a random forest (roots 0 and 1, random parents
    among earlier nodes -> acyclic by construction), deep-chain case
    to exercise pointer doubling past one round."""
    import random

    import duckdb

    from osm2geojson_spark.operators.graph import tree_rollup, tree_rollup_sql

    rng = random.Random(13)
    rows = [(0, None, 5), (1, None, 7)]
    for n in range(2, 40):
        rows.append((n, rng.randrange(0, n), (n * 31) % 20))
    # deep chain hanging off node 1: 40 -> 41 -> ... -> 52
    prev = 1
    for n in range(40, 53):
        rows.append((n, prev, 1))
        prev = n

    df = spark.createDataFrame(rows, "node_id long, parent_id long, w long")
    got = {
        r["node_id"]: (
            r["depth"], r["root_id"], r["subtree_n"], r["subtree_w"]
        )
        for r in tree_rollup(df).collect()
    }

    parent = {n: p for n, p, _ in rows}
    weight = {n: w for n, _, w in rows}
    for n in parent:
        anc = []
        p = parent[n]
        while p is not None:
            anc.append(p)
            p = parent[p]
        desc = [m for m in parent if n in _ancestors(parent, m)]
        want = (
            len(anc),
            anc[-1] if anc else n,
            len(desc) + 1,
            sum(weight[m] for m in desc) + weight[n],
        )
        assert got[n] == want, n
    assert got[52][0] == 13  # chain: 40..51 (12 nodes) + root hop via 1

    duck = duckdb.connect()
    duck.execute("CREATE TABLE nd (node_id BIGINT, parent_id BIGINT, w BIGINT)")
    duck.executemany("INSERT INTO nd VALUES (?, ?, ?)", rows)
    twin = {
        r[0]: tuple(r[1:])
        for r in duck.sql(
            tree_rollup_sql("SELECT * FROM nd")
        ).fetchall()
    }
    assert twin == got


def _ancestors(parent, n):
    out = set()
    p = parent[n]
    while p is not None:
        out.add(p)
        p = parent[p]
    return out


def test_square_count_closed_forms_and_brute(spark):
    """Closed forms (C4 = 1 square, K4 = 3, path/star/triangle = 0,
    cube graph Q3 = 6) + exhaustive brute on a random graph + twin."""
    import random
    from itertools import combinations

    import duckdb

    from osm2geojson_spark.operators.graph import square_count, square_count_sql

    def run(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        row = square_count(df).collect()[0]
        duck = duckdb.connect()
        duck.execute("CREATE TABLE eg (src BIGINT, dst BIGINT)")
        duck.executemany("INSERT INTO eg VALUES (?, ?)", edges)
        twin = duck.sql(square_count_sql("SELECT * FROM eg")).fetchall()[0]
        assert twin == tuple(row)
        duck.close()
        return row["n_squares"]

    assert run([(0, 1), (1, 2), (2, 3), (3, 0)]) == 1          # C4
    assert run(list(combinations(range(4), 2))) == 3           # K4
    assert run([(0, 1), (1, 2), (2, 3)]) == 0                  # path
    assert run([(0, i) for i in range(1, 5)]) == 0             # star
    assert run([(0, 1), (1, 2), (2, 0)]) == 0                  # triangle
    cube = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
            (0, 4), (1, 5), (2, 6), (3, 7)]
    assert run(cube) == 6                                      # Q3 faces

    rng = random.Random(3)
    nodes = list(range(12))
    edges = [e for e in combinations(nodes, 2) if rng.random() < 0.35]
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    brute = 0
    for quad in combinations(nodes, 4):
        # count distinct 4-cycles on these 4 vertices (0 or up to 3)
        a, b, c, d = quad
        for perm in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            w, x, y, z = perm
            if (x in adj[w] and y in adj[x] and z in adj[y] and w in adj[z]):
                brute += 1
    assert run(edges) == brute


def test_clustering_coeff_matches_networkx_style_brute(spark):
    import duckdb
    import numpy as np

    from osm2geojson_spark.operators.graph import (
        clustering_coeff,
        clustering_coeff_sql,
    )

    rng = np.random.default_rng(53)
    pairs = {
        (int(a), int(b))
        for a, b in rng.integers(0, 28, size=(140, 2))
        if a != b
    }
    rows = [(a, b) for a, b in pairs]
    # add a pendant (deg 1) and an isolated-pair node to hit the deg<2 path
    rows += [(100, 101)]
    edges = spark.createDataFrame(rows, "src long, dst long").repartition(3)
    got = {r["node"]: r for r in clustering_coeff(edges).collect()}

    adj = {}
    for a, b in rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nb in adj.items():
        nb = nb - {v}
        deg = len(nb)
        tri = 0
        nbl = sorted(nb)
        for i, x in enumerate(nbl):
            for y in nbl[i + 1:]:
                if y in adj.get(x, ()):
                    tri += 1
        r = got[v]
        assert r["deg"] == deg
        assert r["n_tri"] == tri
        assert (r["lcc_num"], r["lcc_den"]) == (2 * tri, deg * (deg - 1))
        expect = 2 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        assert r["lcc"] == expect
    assert got[100]["lcc"] == 0.0 and got[100]["deg"] == 1

    # a 4-clique is fully clustered
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    for r in clustering_coeff(
        spark.createDataFrame(k4, "src long, dst long")
    ).collect():
        assert r["lcc"] == 1.0 and r["deg"] == 3 and r["n_tri"] == 3

    duck = duckdb.connect()
    duck.execute("CREATE TABLE te (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO te VALUES (?, ?)", rows)
    twin = duck.sql(
        clustering_coeff_sql("SELECT src, dst FROM te")
    ).fetchall()
    assert len(twin) == len(got)
    for node, deg, n_tri, num, den, lcc in twin:
        r = got[node]
        assert (
            r["deg"], r["n_tri"], r["lcc_num"], r["lcc_den"], r["lcc"]
        ) == (deg, n_tri, num, den, lcc)


def test_label_spread_replay_and_frontier_semantics(spark):
    """Serial replay on a designed two-community path graph: seeds at
    the ends, the frontier advances one hop per round, the middle node
    with equal votes ties to the SMALLEST label, a disconnected node
    stays unlabeled, and frozen seeds never flip; twin parity."""
    import duckdb

    from osm2geojson_spark.operators.graph import (
        label_spread,
        label_spread_sql,
    )

    # path 0-1-2-3-4, plus isolated node 9 and a triangle 5-6-7 hanging
    # off node 4
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 5)]
    seeds = [(0, 50), (4, 40)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame(seeds, "node long, label long")
    got = {
        r["node"]: (r["label"], r["round_assigned"])
        for r in label_spread(edf, sdf, rounds=4).collect()
    }

    # serial replay
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lab = {n: (l, 0) for n, l in seeds}
    for r in range(1, 5):
        votes = {}
        for u, (l, _) in list(lab.items()):
            for v in adj.get(u, []):
                if v not in lab:
                    votes.setdefault(v, {}).setdefault(l, 0)
                    votes[v][l] += 1
        for v, cnt in votes.items():
            best = max(cnt, key=lambda k: (cnt[k], -k))
            lab[v] = (best, r)
    assert got == lab
    # node 2 is equidistant from both seeds: equal votes -> smaller label
    assert got[2] == (40, 2)
    assert 9 not in got  # unreached
    assert got[0] == (50, 0) and got[4] == (40, 0)  # seeds frozen

    duck = duckdb.connect()
    duck.execute("CREATE TABLE lse (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO lse VALUES (?,?)", edges)
    duck.execute("CREATE TABLE lss (node BIGINT, label BIGINT)")
    duck.executemany("INSERT INTO lss VALUES (?,?)", seeds)
    twin = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            label_spread_sql("SELECT * FROM lse", "SELECT * FROM lss", rounds=4)
        ).fetchall()
    }
    assert twin == got


def test_rich_club_matches_networkx_style_brute(spark):
    """Brute per-threshold density replay on a designed hub graph (a
    4-clique of hubs plus pendant leaves): phi at the leaf threshold
    must reflect hub interlinking; duplicate and self edges ignored;
    twin byte-for-byte."""
    import duckdb

    from osm2geojson_spark.operators.graph import rich_club, rich_club_sql

    # hubs 0-3 form a clique; each hub also has 3 pendant leaves
    edges = []
    for i in range(4):
        for j in range(i + 1, 4):
            edges.append((i, j))
    leaf = 10
    for h in range(4):
        for _ in range(3):
            edges.append((h, leaf))
            leaf += 1
    edges.append((0, 1))  # duplicate
    edges.append((5, 5))  # self loop on nothing relevant
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi_micro"])
           for r in rich_club(df).collect()}

    # brute
    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for u, v in simple:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    for k in sorted(set(deg.values())):
        rich = {n for n, d in deg.items() if d > k}
        ek = sum(1 for u, v in simple if u in rich and v in rich)
        nk = len(rich)
        phi = 2 * ek * 1_000_000 // (nk * (nk - 1)) if nk >= 2 else None
        assert got[k] == (nk, ek, phi), k
    # leaves have degree 1; hubs degree 6 -> at k=1 the club is the
    # 4 hubs, fully interlinked: phi = 1e6
    assert got[1] == (4, 6, 1_000_000)

    duck = duckdb.connect()
    duck.execute("CREATE TABLE rce (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO rce VALUES (?,?)", edges)
    twin = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.sql(rich_club_sql("SELECT * FROM rce")).fetchall()
    }
    assert twin == got


def test_four_clique_count_brute_and_twin(spark):
    """itertools brute force over all 4-subsets on a mixed graph (one
    planted K5, one K4, a triangle-only tail); K5 math checks out
    (each K5 node sits in C(4,2)... i.e. C(4,3)=4 K4s); twin matches."""
    import itertools

    import duckdb

    from osm2geojson_spark.operators.graph import (
        four_clique_count,
        four_clique_count_sql,
    )

    k5 = list(itertools.combinations([0, 1, 2, 3, 4], 2))
    k4 = list(itertools.combinations([10, 11, 12, 13], 2))
    tri = [(20, 21), (21, 22), (22, 20)]
    extra = [(4, 10), (13, 20), (30, 31)]  # bridges + an isolated edge
    edges = k5 + k4 + tri + extra
    # directions shuffled + a duplicate: symmetrization must handle both
    edges = [(b, a) if (a + b) % 3 == 0 else (a, b) for a, b in edges]
    edges.append((1, 0))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_k4"] for r in four_clique_count(df).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    want = {}
    for quad in itertools.combinations(nodes, 4):
        if all(b in adj[a] for a, b in itertools.combinations(quad, 2)):
            for v in quad:
                want[v] = want.get(v, 0) + 1
    assert got == want
    # planted structure: each K5 node is in C(4,3)=4 K4s, K4 nodes in 1
    assert all(got[v] == 4 for v in range(5))
    assert all(got[v] == 1 for v in (10, 11, 12, 13))
    assert 20 not in got and 30 not in got

    duck = duckdb.connect()
    duck.execute("CREATE TABLE ge (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO ge VALUES (?, ?)", edges)
    twin = dict(
        duck.sql(
            four_clique_count_sql("SELECT src, dst FROM ge")
        ).fetchall()
    )
    assert twin == got


def test_four_clique_count_skewed_hub_degree_orientation(spark):
    """Power-law-ish fixture: a low-id hub (node 0) adjacent to all n
    spokes plus a planted K4 among high-id nodes. Id-order orientation
    would give node 0 out-degree n (quadratic triangle fan-out);
    (degree, id) orientation points every hub edge INTO the hub, so
    the hub's oriented out-degree is 0. Counts still exact."""
    import itertools

    from osm2geojson_spark.operators.graph import four_clique_count

    n = 500
    hub = [(0, i) for i in range(1, n + 1)]
    k4 = list(itertools.combinations([n - 3, n - 2, n - 1, n], 2))
    df = spark.createDataFrame(hub + k4, "src long, dst long")
    got = {r["node"]: r["n_k4"] for r in four_clique_count(df).collect()}
    # hub + any K4 triangle face forms a K4 iff hub adjacent to all
    # three: hub is adjacent to everything, so each of the 4 faces of
    # the planted K4 + hub is a K4, plus the planted K4 itself = 5 K4s
    # touching the cluster; the hub sits in 4 of them.
    assert got[0] == 4
    assert all(got[v] == 1 + 3 for v in (n - 3, n - 2, n - 1, n))
    assert sum(got.values()) == 5 * 4


def test_personalized_pagerank_replay_and_locality(spark):
    """Dict replay of the truncating integer rounds; mass stays near the
    seed on a path graph (monotone decay with hop distance); unreached
    nodes score exactly 0; twin bit-identical."""
    import duckdb

    from osm2geojson_spark.operators.graph import (
        PR_SCALE,
        personalized_pagerank,
        personalized_pagerank_sql,
    )

    # directed path 0->1->2->3->4 plus a disconnected pair 10->11
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    seeds = [(0,)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame(seeds, "node long")
    n_iters, d = 3, 85
    got = {
        r["node"]: r["score"]
        for r in personalized_pagerank(df, sdf, n_iters=n_iters).collect()
    }

    # serial replay
    nodes = sorted({a for e in edges for a in e})
    outd = {}
    for a, _ in edges:
        outd[a] = outd.get(a, 0) + 1
    base = PR_SCALE * (100 - d) // 100
    seed_set = {0}
    score = {v: (PR_SCALE if v in seed_set else 0) for v in nodes}
    for _ in range(n_iters):
        nxt = {v: (base if v in seed_set else 0) for v in nodes}
        for a, b in edges:
            nxt[b] += score[a] * d // 100 // outd[a]
        score = nxt
    assert got == score
    # locality: the seed keeps exactly the restart mass (no in-edges);
    # the initial pulse has reached hop 3 but not hop 4 after 3 rounds;
    # the disconnected component stays at exactly 0
    assert got[0] == base
    assert got[3] > 0 and got[4] == 0
    assert got[10] == 0 and got[11] == 0

    duck = duckdb.connect()
    duck.execute("CREATE TABLE pe (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO pe VALUES (?, ?)", edges)
    twin = dict(
        duck.sql(
            personalized_pagerank_sql(
                "SELECT src, dst FROM pe", "SELECT 0 AS node", n_iters=n_iters
            )
        ).fetchall()
    )
    assert twin == got


def test_simrank_dict_replay_and_structure(spark):
    """Dict replay of the truncating fixed-point rounds; two nodes fed
    by the same parents score SCALE*C after round 1; nodes with no
    common ancestry never appear; twin bit-identical."""
    import duckdb

    from osm2geojson_spark.operators.graph import (
        SR_SCALE,
        simrank_int,
        simrank_sql,
    )

    # parents {0,1} both point to 10 and 11 (twins); 2->12 only;
    # 10->20, 11->21 (grandchildren of the twins)
    edges = [(0, 10), (0, 11), (1, 10), (1, 11), (2, 12), (10, 20), (11, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rounds, cn, cd = 3, 4, 5
    got = {
        (r["a"], r["b"]): r["s"]
        for r in simrank_int(df, rounds=rounds, c_num=cn, c_den=cd).collect()
    }

    # dict replay
    import collections

    ins = collections.defaultdict(set)
    for s, d in edges:
        ins[d].add(s)
    nodes = sorted({x for e in edges for x in e})
    s = {(v, v): SR_SCALE for v in nodes}
    for _ in range(rounds):
        nxt = {(v, v): SR_SCALE for v in nodes}
        for a in nodes:
            for b in nodes:
                if a == b or not ins[a] or not ins[b]:
                    continue
                tot = sum(
                    s.get((i, j), 0) for i in ins[a] for j in ins[b]
                )
                val = (cn * tot) // (cd * len(ins[a]) * len(ins[b]))
                if val > 0:
                    nxt[(a, b)] = val
        s = nxt
    want = {(a, b): v for (a, b), v in s.items() if a < b and v > 0}
    assert got == want
    # twins fed by the same TWO parents: Σ over the 2x2 in-pair grid is
    # 2·SCALE (diagonal) + 2·s(0,1) with s(0,1)=0 (parents have no
    # in-edges), so s = C·2·SCALE/4 = C·SCALE/2 — the textbook value
    assert got[(10, 11)] == SR_SCALE * cn // (cd * 2)
    # grandchildren inherit similarity through the twins
    assert got[(20, 21)] > 0
    # no common ancestry with 12's line
    assert not any(12 in p or (p[0] == 2 or p[1] == 2) for p in got)

    duck = duckdb.connect()
    duck.execute("CREATE TABLE sre (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO sre VALUES (?, ?)", edges)
    twin = {
        (r[0], r[1]): r[2]
        for r in duck.sql(
            simrank_sql("SELECT src, dst FROM sre", rounds=rounds)
        ).fetchall()
    }
    assert twin == got


def test_critical_path_brute_and_twin(spark):
    """CPM on a hand DAG: brute-force longest paths vs the relax loop,
    plus the DuckDB recursive twin, bit-exact."""
    import duckdb

    from osm2geojson_spark.operators.graph import critical_path, critical_path_sql

    # diamond + tail:  0 -> {1,2} -> 3 -> 4, plus isolated 5
    durs = {0: 3, 1: 5, 2: 2, 3: 4, 4: 1, 5: 7}
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]

    # brute: es = longest ancestor chain, tail = longest successor chain
    def brute():
        import collections

        preds = collections.defaultdict(list)
        succs = collections.defaultdict(list)
        for s, d in edges:
            preds[d].append(s)
            succs[s].append(d)

        import functools

        @functools.lru_cache(None)
        def es(v):
            return max((es(u) + durs[u] for u in preds[v]), default=0)

        @functools.lru_cache(None)
        def tail(v):
            return max((tail(s) + durs[s] for s in succs[v]), default=0)

        ef = {v: es(v) + durs[v] for v in durs}
        t = max(ef.values())
        return {
            v: (durs[v], es(v), ef[v], t - tail(v), t - tail(v) - ef[v])
            for v in durs
        }

    nodes_df = spark.createDataFrame(
        [(k, v) for k, v in durs.items()], "node long, dur long"
    )
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["dur"], r["es"], r["ef"], r["lf"], r["slack"])
        for r in critical_path(nodes_df, edges_df, max_rounds=6).collect()
    }
    assert got == brute()
    # the critical chain is 0 -> 1 -> 3 -> 4 (slack 0); 2 has slack 3
    crit = {
        r["node"]
        for r in critical_path(nodes_df, edges_df, max_rounds=6)
        .filter("critical")
        .collect()
    }
    assert {0, 1, 3, 4} <= crit
    assert 2 not in crit
    assert got[2][4] == 3

    duck = duckdb.connect()
    duck.execute("CREATE TABLE cpn (node BIGINT, dur BIGINT)")
    duck.executemany("INSERT INTO cpn VALUES (?, ?)", list(durs.items()))
    duck.execute("CREATE TABLE cpe (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO cpe VALUES (?, ?)", edges)
    twin = {
        r[0]: tuple(r[1:6])
        for r in duck.sql(
            critical_path_sql(
                "SELECT node, dur FROM cpn", "SELECT src, dst FROM cpe", 6
            )
        ).fetchall()
    }
    assert twin == got


def test_scc_coloring_brute_and_twin(spark):
    """SCC labels on a hand graph: two cycles, a bridge, a tail."""
    import duckdb

    from osm2geojson_spark.operators.graph import scc_coloring, scc_sql

    # cycle A: 0->1->2->0; cycle B: 10->11->10; bridge 2->10 (one-way);
    # tail 11->20 (dead end); self-loop on 20 (must stay a singleton)
    edges = [
        (0, 1), (1, 2), (2, 0), (10, 11), (11, 10), (2, 10), (11, 20),
        (20, 20),
    ]

    def brute():
        nodes = sorted({x for e in edges for x in e})
        adj = {v: [d for s, d in edges if s == v] for v in nodes}

        def reach(start):
            seen = {start}
            frontier = {start}
            while frontier:
                frontier = {u for v in frontier for u in adj[v]} - seen
                seen |= frontier
            return seen

        r = {v: reach(v) for v in nodes}
        lab = {v: min(u for u in r[v] if v in r[u]) for v in nodes}
        import collections

        sz = collections.Counter(lab.values())
        return {v: (lab[v], sz[lab[v]]) for v in nodes}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["scc"], r["scc_size"])
        for r in scc_coloring(df).collect()
    }
    assert got == brute()
    # the two cycles are separate components; the bridge keeps them apart
    assert got[0] == (0, 3) and got[1] == (0, 3) and got[2] == (0, 3)
    assert got[10] == (10, 2) and got[11] == (10, 2)
    assert got[20] == (20, 1)

    duck = duckdb.connect()
    duck.execute("CREATE TABLE sce (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO sce VALUES (?, ?)", edges)
    twin = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            scc_sql("SELECT src, dst FROM sce")
        ).fetchall()
    }
    assert twin == got


def test_scc_coloring_hub_graph_bounded_state(spark):
    """Hub graph (one node of degree ~n/2): the old reachability-pair
    algorithm materialized Θ(n²/4) pairs here; trim+coloring keeps one
    row per node. n=20000 with a planted 3-cycle among the spokes."""
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.graph import scc_coloring

    n = 20_000
    half = n // 2
    spokes_out = (
        spark.range(1, half + 1)
        .select(F.lit(0).alias("src"), F.col("id").alias("dst"))
    )
    spokes_in = (
        spark.range(half + 1, n + 1)
        .select(F.col("id").alias("src"), F.lit(0).alias("dst"))
    )
    cycle = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    got = scc_coloring(
        spokes_out.unionByName(spokes_in).unionByName(cycle)
    )
    lab = {r["node"]: (r["scc"], r["scc_size"]) for r in got.collect()}
    assert len(lab) == n + 1
    # planted cycle is the only nontrivial component
    assert lab[1] == (1, 3) and lab[2] == (1, 3) and lab[3] == (1, 3)
    assert lab[0] == (0, 1)
    assert lab[half + 1] == (half + 1, 1)
    assert all(v[1] == 1 for k, v in lab.items() if k not in (1, 2, 3))


def test_scc_coloring_chain_of_cycles_round_cap(spark):
    """A chain of 2-cycles linked one-way needs one coloring round per
    component (worst case); max_rounds raises cleanly, None completes."""
    import pytest

    from osm2geojson_spark.operators.graph import scc_coloring

    # components {0,1} -> {2,3} -> {4,5}: 2-cycles with one-way links
    edges = [
        (0, 1), (1, 0), (2, 3), (3, 2), (4, 5), (5, 4), (1, 2), (3, 4),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["scc"], r["scc_size"])
        for r in scc_coloring(df, max_rounds=None).collect()
    }
    assert got == {
        0: (0, 2), 1: (0, 2), 2: (2, 2), 3: (2, 2), 4: (4, 2), 5: (4, 2),
    }
    with pytest.raises(RuntimeError, match="unresolved"):
        scc_coloring(df, max_rounds=1)


def test_betweenness_bounded_scalar_replay(spark):
    """Micro-credit Brandes vs a scalar replay on a barbell-ish graph:
    the bridge node must dominate."""
    import collections
    import duckdb

    from osm2geojson_spark.operators.graph import (
        BC_MICRO,
        betweenness_bounded,
        betweenness_bounded_sql,
    )

    # two triangles joined through node 4 (the broker)
    edges = [(0, 1), (1, 2), (2, 0), (2, 4), (4, 5), (5, 6), (6, 7), (7, 5)]
    srcs = [0, 5, 6]
    H = 4

    def brute():
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        bc = collections.Counter()
        for s in srcs:
            dist = {s: 0}
            sigma = {s: 1}
            levels = collections.defaultdict(list)
            levels[0] = [s]
            frontier = [s]
            for d in range(1, H + 1):
                nxt = collections.Counter()
                for v in frontier:
                    for w in adj[v]:
                        if w not in dist:
                            nxt[w] += sigma[v]
                for w, sg in nxt.items():
                    dist[w] = d
                    sigma[w] = sg
                    levels[d].append(w)
                frontier = list(nxt)
                if not frontier:
                    break
            maxd = max(levels) if levels else 0
            delta = {}
            for d in range(maxd - 1, -1, -1):
                for v in levels[d]:
                    t = 0
                    for w in adj[v]:
                        if dist.get(w) == d + 1:
                            t += sigma[v] * (BC_MICRO + delta.get(w, 0)) // sigma[w]
                    if t:
                        delta[v] = t
            # accumulate per source (v != s)
            for v, dl in delta.items():
                if v != s:
                    bc[v] += dl
        return {v: c for v, c in bc.items() if c > 0}

    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in srcs], "node long")
    got = {
        r["node"]: r["bc_micro"]
        for r in betweenness_bounded(edf, sdf, max_hops=H).collect()
    }
    want = brute()
    assert got == want
    # the bridge (4) and its gateways carry the most dependency
    assert got[4] == max(got.values())

    duck = duckdb.connect()
    duck.execute("CREATE TABLE bce (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO bce VALUES (?, ?)", edges)
    duck.execute("CREATE TABLE bcs (node BIGINT)")
    duck.executemany("INSERT INTO bcs VALUES (?)", [(s,) for s in srcs])
    twin = {
        r[0]: r[1]
        for r in duck.sql(
            betweenness_bounded_sql(
                "SELECT src, dst FROM bce", "SELECT node FROM bcs", H
            )
        ).fetchall()
    }
    assert twin == got


def test_k_truss_peels_to_clique(spark):
    """4-truss: a K5 clique survives; a pendant triangle chain peels."""
    import duckdb
    import itertools

    from osm2geojson_spark.operators.graph import k_truss, k_truss_sql

    k5 = list(itertools.combinations(range(5), 2))
    # tail: triangle (10,11,12) bridged to the clique by edge (0,10):
    # each tail edge sits in at most 1 triangle -> support 1 < 2 -> peels
    tail = [(10, 11), (11, 12), (10, 12), (0, 10)]
    edges = k5 + tail
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["support"] for r in k_truss(df, k=4, rounds=5).collect()
    }
    # K5 edges all survive with support 3 (each edge in 3 triangles)
    assert got == {e: 3 for e in k5}

    duck = duckdb.connect()
    duck.execute("CREATE TABLE kte (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO kte VALUES (?, ?)", edges)
    twin = {
        (r[0], r[1]): r[2]
        for r in duck.sql(
            k_truss_sql("SELECT src, dst FROM kte", k=4, rounds=5)
        ).fetchall()
    }
    assert twin == got


def test_mis_properties_and_twin(spark):
    """MIS invariants: independence, maximality, deterministic scalar
    replay of the id-priority rounds."""
    import duckdb

    from osm2geojson_spark.operators.graph import (
        maximal_independent_set,
        maximal_independent_set_sql,
    )

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 5), (5, 6), (7, 8)]

    def brute(rounds=12):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        live = set(adj)
        out = {}
        for rnd in range(1, rounds + 1):
            if not live:
                break
            sel = {
                v for v in live
                if all(v < u for u in adj[v] if u in live)
            }
            ko = {u for v in sel for u in adj[v] if u in live} - sel
            for v in sel:
                out[v] = (True, rnd)
            for v in ko:
                out[v] = (False, rnd)
            live -= sel | ko
        return out

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["selected"], r["round"])
        for r in maximal_independent_set(df).collect()
    }
    assert got == brute()
    sel = {v for v, (s, _) in got.items() if s}
    # independence: no edge inside the MIS
    assert not any(a in sel and b in sel for a, b in edges)
    # maximality: every non-selected node has a selected neighbor
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in got:
        if v not in sel:
            assert adj[v] & sel, v

    duck = duckdb.connect()
    duck.execute("CREATE TABLE mise (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO mise VALUES (?, ?)", edges)
    twin = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            maximal_independent_set_sql("SELECT src, dst FROM mise")
        ).fetchall()
    }
    assert twin == got


def test_greedy_coloring_equals_sequential_and_proper(spark):
    """JP waves == sequential greedy in ascending id order; coloring is
    proper (no monochromatic edge)."""
    import duckdb

    from osm2geojson_spark.operators.graph import greedy_coloring, greedy_coloring_sql

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (6, 7)]

    def sequential():
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        color = {}
        for v in sorted(adj):
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        return color

    df = spark.createDataFrame(edges, "src long, dst long")
    res = greedy_coloring(df).collect()
    got = {r["node"]: r["color"] for r in res}
    assert got == sequential()
    # proper coloring
    for a, b in edges:
        assert got[a] != got[b]
    # wave order respects id dependencies: node 0 colors in round 1
    rounds = {r["node"]: r["round"] for r in res}
    assert rounds[0] == 1 and rounds[6] == 1

    duck = duckdb.connect()
    duck.execute("CREATE TABLE gce (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO gce VALUES (?, ?)", edges)
    twin = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            greedy_coloring_sql("SELECT src, dst FROM gce")
        ).fetchall()
    }
    assert twin == {r["node"]: (r["color"], r["round"]) for r in res}


def test_harmonic_centrality_scalar_replay(spark):
    """Pivot harmonic centrality vs a BFS replay; the hub of a star
    scores highest from leaf pivots."""
    import collections
    import duckdb

    from osm2geojson_spark.operators.graph import (
        HC_MICRO,
        harmonic_centrality,
        harmonic_centrality_sql,
    )

    # star 0-{1..5} plus tail 5-6-7
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (5, 6), (6, 7)]
    srcs = [1, 2, 7]

    def brute(h=4):
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        hc = collections.Counter()
        nr = collections.Counter()
        for s in srcs:
            dist = {s: 0}
            frontier = [s]
            for d in range(1, h + 1):
                nxt = []
                for v in frontier:
                    for u in adj[v]:
                        if u not in dist:
                            dist[u] = d
                            nxt.append(u)
                frontier = nxt
            for v, d in dist.items():
                if d > 0:
                    hc[v] += HC_MICRO // d
                    nr[v] += 1
        return {v: (hc[v], nr[v]) for v in hc}

    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in srcs], "node long")
    got = {
        r["node"]: (r["hc_micro"], r["n_reached"])
        for r in harmonic_centrality(edf, sdf, max_hops=4).collect()
    }
    assert got == brute()
    # the hub is the most central non-pivot node
    non_pivot = {v: s for v, (s, _) in got.items() if v not in srcs}
    assert max(non_pivot, key=non_pivot.get) == 0

    duck = duckdb.connect()
    duck.execute("CREATE TABLE hce (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO hce VALUES (?, ?)", edges)
    duck.execute("CREATE TABLE hcs (node BIGINT)")
    duck.executemany("INSERT INTO hcs VALUES (?)", [(s,) for s in srcs])
    twin = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            harmonic_centrality_sql(
                "SELECT src, dst FROM hce", "SELECT node FROM hcs", 4
            )
        ).fetchall()
    }
    assert twin == got


def test_greedy_matching_properties_and_replay(spark):
    """Matching invariants: vertex-disjoint, maximal; scalar replay of
    the both-endpoint-minimum rounds; twin bit-equal."""
    import duckdb

    from osm2geojson_spark.operators.graph import greedy_matching, greedy_matching_sql

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (8, 9)]

    def brute(rounds=12):
        live = {(min(a, b), max(a, b)) for a, b in edges}
        out = {}
        for rnd in range(1, rounds + 1):
            if not live:
                break
            best = {}
            for (u, v) in live:
                for n in (u, v):
                    if n not in best or (u, v) < best[n]:
                        best[n] = (u, v)
            picked = {
                (u, v) for (u, v) in live
                if best[u] == (u, v) and best[v] == (u, v)
            }
            if not picked:
                break
            for e in picked:
                out[e] = rnd
            matched = {n for e in picked for n in e}
            live = {e for e in live if e[0] not in matched and e[1] not in matched}
        return out

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["round"] for r in greedy_matching(df).collect()
    }
    assert got == brute()
    # vertex-disjoint
    seen = set()
    for u, v in got:
        assert u not in seen and v not in seen
        seen |= {u, v}
    # maximal: every remaining edge touches a matched vertex
    for a, b in edges:
        e = (min(a, b), max(a, b))
        if e not in got:
            assert a in seen or b in seen, e

    duck = duckdb.connect()
    duck.execute("CREATE TABLE gme (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO gme VALUES (?, ?)", edges)
    twin = {
        (r[0], r[1]): r[2]
        for r in duck.sql(
            greedy_matching_sql("SELECT src, dst FROM gme")
        ).fetchall()
    }
    assert twin == got


def test_reciprocity_census(spark):
    import duckdb

    from osm2geojson_spark.operators.graph import reciprocity, reciprocity_sql

    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (4, 5), (5, 5)]
    # distinct directed, no self-loop: {01,10,12,23,32,45}; reciprocal: 01,10,23,32
    df = spark.createDataFrame(edges, "src long, dst long")
    r = reciprocity(df).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"]) == (6, 4)
    assert r["reciprocity_micro"] == 1_000_000 * 4 // 6

    duck = duckdb.connect()
    duck.execute("CREATE TABLE rce (src BIGINT, dst BIGINT)")
    duck.executemany("INSERT INTO rce VALUES (?, ?)", edges)
    t = duck.sql(reciprocity_sql("SELECT src, dst FROM rce")).fetchall()[0]
    assert tuple(t) == tuple(r)
