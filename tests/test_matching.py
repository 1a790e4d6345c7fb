"""Map matching (snap_to_segments) — validated against a dense brute-force
NumPy point-to-segment argmin, plus degenerate-segment and tie-break
determinism checks."""

from __future__ import annotations

import numpy as np

from osm2geojson_spark.operators.matching import snap_to_segments


def _seg_d2(px, py, ax, ay, bx, by):
    dx, dy = bx - ax, by - ay
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        t = 0.0
    else:
        t = min(max(((px - ax) * dx + (py - ay) * dy) / l2, 0.0), 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def _fixture(seed, n_pts=120, n_segs=40):
    rng = np.random.default_rng(seed)
    pts = [
        (i, float(rng.uniform(-5, 5)), float(rng.uniform(-5, 5)))
        for i in range(n_pts)
    ]
    segs = []
    for j in range(n_segs):
        ax, ay = rng.uniform(-5, 5), rng.uniform(-5, 5)
        segs.append(
            (
                j,
                float(ax),
                float(ay),
                float(ax + rng.uniform(-2, 2)),
                float(ay + rng.uniform(-2, 2)),
            )
        )
    return pts, segs


def _brute(pts, segs, radius, top_k=1):
    out = {}
    for pid, px, py in pts:
        cand = sorted(
            (
                (_seg_d2(px, py, ax, ay, bx, by), sid)
                for sid, ax, ay, bx, by in segs
            )
        )
        keep = [
            (sid, rank + 1, d2)
            for rank, (d2, sid) in enumerate(cand[:top_k])
            if d2 <= radius * radius
        ]
        if keep:
            out[pid] = keep
    return out


def test_snap_matches_brute(spark):
    pts, segs = _fixture(7)
    p = spark.createDataFrame(pts, "pid long, lon double, lat double")
    s = spark.createDataFrame(
        segs, "seg_id long, ax double, ay double, bx double, by double"
    )
    got = {}
    for r in snap_to_segments(p, s, radius_deg=1.5, res=7).collect():
        got.setdefault(r["pid"], []).append((r["seg_id"], r["snap_rank"], r["d2"]))
    want = _brute(pts, segs, 1.5)
    assert set(got) == set(want)
    for pid in want:
        (gsid, grank, gd2), = sorted(got[pid], key=lambda x: x[1])
        wsid, wrank, wd2 = want[pid][0]
        assert (gsid, grank) == (wsid, wrank)
        assert gd2 == wd2  # identical IEEE op sequence -> bit equality
    assert len(want) > 40  # non-degenerate fixture


def test_snap_top_k(spark):
    pts, segs = _fixture(11)
    p = spark.createDataFrame(pts, "pid long, lon double, lat double")
    s = spark.createDataFrame(
        segs, "seg_id long, ax double, ay double, bx double, by double"
    )
    got = {}
    for r in snap_to_segments(p, s, radius_deg=2.0, res=7, top_k=3).collect():
        got.setdefault(r["pid"], []).append((r["snap_rank"], r["seg_id"], r["d2"]))
    want = _brute(pts, segs, 2.0, top_k=3)
    for pid in want:
        assert sorted(got[pid]) == [
            (rank, sid, d2) for sid, rank, d2 in want[pid]
        ]


def test_snap_degenerate_and_ties(spark):
    # zero-length segment snaps to its endpoint; two equidistant segments
    # break the tie by ascending seg_id
    p = spark.createDataFrame([(0, 0.0, 0.0)], "pid long, lon double, lat double")
    s = spark.createDataFrame(
        [
            (5, 1.0, 0.0, 1.0, 0.0),  # point segment at distance 1
            (3, -1.0, -1.0, -1.0, 1.0),  # vertical segment at distance 1
        ],
        "seg_id long, ax double, ay double, bx double, by double",
    )
    rows = snap_to_segments(p, s, radius_deg=2.0, res=7, top_k=2).collect()
    by_rank = {r["snap_rank"]: r["seg_id"] for r in rows}
    assert by_rank == {1: 3, 2: 5}
    assert all(r["d2"] == 1.0 for r in rows)


def test_stable_matching_classic_and_stability(spark):
    """GS rounds vs a serial Gale-Shapley; result is stable (no
    blocking pair within the candidate table)."""
    import duckdb

    from osm2geojson_spark.operators.matching import (
        stable_matching,
        stable_matching_sql,
    )

    # 4 proposers x 4 acceptors, dense prefs with distinct scores
    prefs = [
        (p, a, ((p * 7 + a * 13 + p * a * 3) % 101))
        for p in range(4)
        for a in range(10, 14)
    ]

    def serial_gs():
        # proposer-optimal serial GS over the same ranked lists
        ranked = {}
        for p in range(4):
            ranked[p] = sorted(
                [(a, s) for pp, a, s in prefs if pp == p],
                key=lambda t: (-t[1], t[0]),
            )
        ptr = {p: 0 for p in ranked}
        hold = {}  # a -> (p, s)
        free = set(ranked)
        while free:
            p = min(free)
            if ptr[p] >= len(ranked[p]):
                free.discard(p)
                continue
            a, s = ranked[p][ptr[p]]
            cur = hold.get(a)
            if cur is None or (-s, p) < (-cur[1], cur[0]):
                if cur is not None:
                    ptr[cur[0]] += 1
                    free.add(cur[0])
                hold[a] = (p, s)
                free.discard(p)
            else:
                ptr[p] += 1
        return {(pa[0], a, pa[1]) for a, pa in hold.items()}

    df = spark.createDataFrame(prefs, "p long, a long, s long")
    got = {(r["p"], r["a"], r["s"]) for r in stable_matching(df, rounds=10).collect()}
    assert got == serial_gs()

    # no blocking pair: for every unmatched candidate pair (p,a,s),
    # NOT (p prefers a to p's match AND a prefers p to a's holder)
    match_p = {p: (a, s) for p, a, s in got}
    match_a = {a: (p, s) for p, a, s in got}
    for p, a, s in prefs:
        if (p, a, s) in got:
            continue
        p_better = p not in match_p or (-s, a) < (
            -match_p[p][1], match_p[p][0]
        )
        a_better = a not in match_a or (-s, p) < (
            -match_a[a][1], match_a[a][0]
        )
        assert not (p_better and a_better), (p, a, s)

    duck = duckdb.connect()
    duck.execute("CREATE TABLE smp (p BIGINT, a BIGINT, s BIGINT)")
    duck.executemany("INSERT INTO smp VALUES (?, ?, ?)", prefs)
    twin = {
        tuple(r)
        for r in duck.sql(
            stable_matching_sql("SELECT * FROM smp", rounds=10)
        ).fetchall()
    }
    assert twin == got


def test_fs_link_scores_scalar_replay_and_bands(spark):
    """FS weights vs scalar replay: all-agree pairs band 'link',
    all-disagree 'non'."""
    import duckdb
    import math

    from osm2geojson_spark.operators.matching import (
        FS_MICRO,
        fs_link_scores,
        fs_link_scores_sql,
    )

    pairs = [
        (1, 2, True, True, True),     # planted duplicate
        (1, 3, False, False, False),
        (2, 3, False, True, False),
        (4, 5, True, False, False),
        (6, 7, True, True, True),     # another duplicate
        (6, 8, False, False, True),
        (9, 10, False, False, False),
        (9, 11, False, False, False),
        (10, 11, False, False, False),
        (12, 13, False, False, False),
    ]
    fields = ["f1", "f2", "f3"]

    def brute():
        n = len(pairs)
        out = {}
        for ia, ib, *ag in pairs:
            s = 0
            for j, f in enumerate(fields):
                a_cnt = sum(1 for p in pairs if p[2 + j]) + 1
                d = n + 2
                if ag[j]:
                    s += round(
                        (math.log(9.0) - math.log(10.0)
                         - math.log(a_cnt) + math.log(d)) * FS_MICRO
                    )
                else:
                    s += round(
                        (math.log(1.0) - math.log(10.0)
                         - math.log(d - a_cnt) + math.log(d)) * FS_MICRO
                    )
            band = "link" if s > 2_000_000 else ("non" if s < 0 else "possible")
            out[(ia, ib)] = (s, band)
        return out

    df = spark.createDataFrame(pairs, "id_a long, id_b long, f1 boolean, f2 boolean, f3 boolean")
    got = {
        (r["id_a"], r["id_b"]): (r["score_micro"], r["band"])
        for r in fs_link_scores(df, fields).collect()
    }
    assert got == brute()
    assert got[(1, 2)][1] == "link" and got[(6, 7)][1] == "link"
    assert got[(1, 3)][1] == "non"

    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE fsp (id_a BIGINT, id_b BIGINT, f1 BOOLEAN, f2 BOOLEAN, f3 BOOLEAN)"
    )
    duck.executemany("INSERT INTO fsp VALUES (?, ?, ?, ?, ?)", pairs)
    twin = {
        (r[0], r[1]): (r[2], r[3])
        for r in duck.sql(
            fs_link_scores_sql("SELECT * FROM fsp", fields)
        ).fetchall()
    }
    assert twin == got


def test_fs_link_scores_precondition_validation(spark):
    """Empty fields and degenerate m-priors raise up front instead of
    failing deep in column assembly (fields=[] left score=None;
    m_num==m_den is ln(0))."""
    import pytest

    from osm2geojson_spark.operators.matching import fs_link_scores

    df = spark.createDataFrame(
        [(1, 2, True)], "id_a long, id_b long, f1 boolean"
    )
    with pytest.raises(ValueError, match="non-empty"):
        fs_link_scores(df, [])
    with pytest.raises(ValueError, match="m_num"):
        fs_link_scores(df, ["f1"], m_num=10, m_den=10)
    with pytest.raises(ValueError, match="m_num"):
        fs_link_scores(df, ["f1"], m_num=0, m_den=10)
