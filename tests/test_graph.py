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
