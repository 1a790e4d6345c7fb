"""Trajectory mining: stay points + OD flows vs a hand-walked fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators import cells
from osm2geojson_spark.operators.trajectory import od_flows, stay_points


@pytest.fixture(scope="module")
def pings(spark):
    # user 1: cell A (3 pings, 2h span) -> cell B (2 pings, 30min, below
    # gate) -> cell A (2 pings, 1h) : stays A, A -> self-loop flow A->A
    # user 2: cell C (2 pings, 90min) -> cell D (2 pings, 3h): flow C->D
    # cells via lon centers: A=(0.5, 0.5) B=(10.5, 0.5) C=(20.5, 0.5) D=(30.5, 0.5)
    t0 = 1700000000
    rows = [
        (1, t0 + 0, 0.5), (1, t0 + 3600, 0.5), (1, t0 + 7200, 0.5),
        (1, t0 + 8000, 10.5), (1, t0 + 9800, 10.5),
        (1, t0 + 10000, 0.5), (1, t0 + 13600, 0.5),
        (2, t0 + 0, 20.5), (2, t0 + 5400, 20.5),
        (2, t0 + 6000, 30.5), (2, t0 + 16800, 30.5),
    ]
    return spark.createDataFrame(rows, "user_id long, tsec long, lon double").select(
        "user_id", F.timestamp_seconds("tsec").alias("ts"), "lon", F.lit(0.5).alias("lat")
    )


def test_stay_points_gate_and_sequence(spark, pings):
    stays = stay_points(pings, res=6, min_duration_s=3600).collect()
    by_user = {}
    for r in stays:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["stay_seq"])
    assert len(u1) == 2  # the 30-min B run is gated out
    cell_a = u1[0]["cell_id"]
    assert u1[1]["cell_id"] == cell_a  # revisit of the same cell
    assert u1[0]["dur_s"] == 7200 and u1[1]["dur_s"] == 3600
    assert u1[0]["n_pings"] == 3 and u1[1]["n_pings"] == 2
    u2 = sorted(by_user[2], key=lambda r: r["stay_seq"])
    assert len(u2) == 2 and u2[0]["dur_s"] == 5400 and u2[1]["dur_s"] == 10800


def test_od_flows_including_self_loop(spark, pings):
    stays = stay_points(pings, res=6, min_duration_s=3600)
    flows = {(r["from_cell"], r["to_cell"]): r["n_trips"] for r in od_flows(stays).collect()}
    a = cells.pack_cell_py(6, int((0.5 + 180) / 360 * 64), int((0.5 + 90) / 180 * 64))
    c = cells.pack_cell_py(6, int((20.5 + 180) / 360 * 64), int((0.5 + 90) / 180 * 64))
    d = cells.pack_cell_py(6, int((30.5 + 180) / 360 * 64), int((0.5 + 90) / 180 * 64))
    assert flows[(a, a)] == 1  # interrupted revisit = real self-loop trip
    assert flows[(c, d)] == 1
    assert sum(flows.values()) == 2


def test_mobility_features_vs_numpy(spark, pings):
    import numpy as np

    from osm2geojson_spark.operators.trajectory import mobility_features

    stays = stay_points(pings, res=6, min_duration_s=3600)
    rows = stays.collect()
    got = {r["user_id"]: r for r in mobility_features(stays).collect()}
    by_user = {}
    for r in rows:
        x = (r["cell_id"] % (1 << 58)) >> 29
        y = r["cell_id"] % (1 << 29)
        by_user.setdefault(r["user_id"], []).append((x, y))
    for u, pts in by_user.items():
        a = np.array(pts, dtype=float)
        rog = float(np.sqrt(((a - a.mean(axis=0)) ** 2).sum(axis=1).mean()))
        assert got[u]["n_stays"] == len(pts)
        assert abs(got[u]["rog_cells"] - round(rog, 6)) < 2e-6, u
    # user 1's two stays are the same cell -> rog 0, n_cells 1
    assert got[1]["rog_cells"] == 0.0 and got[1]["n_cells"] == 1


# ----------------------------------------------------- track resampling


def _brute_resample(pings, dt_us):
    """Reference: per user, ticks in [t0, t1) per consecutive pair, linear
    interpolation on exact microseconds."""
    out = []
    by_user = {}
    for u, t, lon, lat in pings:
        by_user.setdefault(u, []).append((t, lon, lat))
    for u, rows in by_user.items():
        rows.sort()
        for (t0, lon0, lat0), (t1, lon1, lat1) in zip(rows, rows[1:]):
            k = -((-t0) // dt_us)  # ceil
            while k * dt_us < t1:
                frac = (k * dt_us - t0) / (t1 - t0)
                out.append(
                    (u, k, lon0 + frac * (lon1 - lon0), lat0 + frac * (lat1 - lat0))
                )
                k += 1
    return sorted(out)


def test_resample_matches_brute(spark):
    import numpy as np
    from osm2geojson_spark.operators.trajectory import resample_tracks

    rng = np.random.default_rng(21)
    base = 1_700_000_000_000_000
    pings = []
    for u in range(5):
        t = base + int(rng.integers(0, 10**9))
        for _ in range(30):
            pings.append(
                (
                    u,
                    t,
                    float(rng.uniform(-10, 10)),
                    float(rng.uniform(-10, 10)),
                )
            )
            t += int(rng.integers(1, 4 * 3600 * 1_000_000))
    df = spark.createDataFrame(
        [(u, t, lon, lat) for u, t, lon, lat in pings],
        "user_id long, t_us long, lon double, lat double",
    ).selectExpr("user_id", "timestamp_micros(t_us) AS ts", "lon", "lat")
    dt_s = 3600
    got = sorted(
        (r["user_id"], r["tick"], r["lon"], r["lat"])
        for r in resample_tracks(df, interval_s=dt_s).collect()
    )
    want = _brute_resample(pings, dt_s * 1_000_000)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        assert abs(g[2] - w[2]) < 1e-12 and abs(g[3] - w[3]) < 1e-12
    assert len(want) > 100  # non-degenerate


def test_resample_tick_on_ping_and_half_open(spark):
    from osm2geojson_spark.operators.trajectory import resample_tracks

    dt = 60  # 1-minute grid
    # pings at exact ticks 100 and 102: tick 100 (frac 0, first ping's
    # position), tick 101 (midpoint), tick 102 EXCLUDED (no next segment)
    df = spark.createDataFrame(
        [(1, 100 * 60 * 1_000_000, 0.0, 0.0), (1, 102 * 60 * 1_000_000, 2.0, 4.0)],
        "user_id long, t_us long, lon double, lat double",
    ).selectExpr("user_id", "timestamp_micros(t_us) AS ts", "lon", "lat")
    rows = {r["tick"]: (r["lon"], r["lat"]) for r in resample_tracks(df, dt).collect()}
    assert rows == {100: (0.0, 0.0), 101: (1.0, 2.0)}


def test_colocation_pairs(spark):
    from osm2geojson_spark.operators.trajectory import colocation_pairs

    M = 60 * 1_000_000  # 1 minute in us
    # users 1 and 2 walk together (same cell) for ticks 10..13; user 3 is
    # far away; user 4 joins the cell only at tick 12
    rows = []
    for u, lon in ((1, 10.0), (2, 10.05), (3, 120.0)):
        rows += [(u, 10 * M, lon, 5.0), (u, 13 * M + 1, lon, 5.0)]
    rows += [(4, 12 * M, 10.1, 5.0), (4, 12 * M + 59_000_000, 10.1, 5.0)]
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_micros(t_us) AS ts", "lon", "lat")
    got = {
        (r["user_a"], r["user_b"]): r["n_ticks"]
        for r in colocation_pairs(df, 60, res=6).collect()
    }
    assert got == {(1, 2): 4, (1, 4): 1, (2, 4): 1}


def test_colocation_min_ticks_gate(spark):
    from osm2geojson_spark.operators.trajectory import colocation_pairs

    M = 60 * 1_000_000
    rows = []
    for u in (1, 2):
        rows += [(u, 0, 0.0, 0.0), (u, 5 * M, 0.0, 0.0)]
    rows += [(3, 2 * M, 0.0, 0.0), (3, 2 * M + 30_000_000, 0.0, 0.0)]
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_micros(t_us) AS ts", "lon", "lat")
    got = {
        (r["user_a"], r["user_b"]): r["n_ticks"]
        for r in colocation_pairs(df, 60, res=6, min_ticks=3).collect()
    }
    assert got == {(1, 2): 5}


# ----------------------------------------------------- geofence visits


def _brute_visits(pings, fences):
    """Reference: per user, time-ordered walk; a visit is a maximal run of
    consecutive pings inside a fence (closed containment)."""
    out = []
    by_user = {}
    for u, t, lon, lat in pings:
        by_user.setdefault(u, []).append((t, lon, lat))
    for u, rows in by_user.items():
        rows.sort()
        for fid, x0, y0, x1, y1 in fences:
            run = None
            for t, lon, lat in rows + [(None, None, None)]:
                ins = t is not None and x0 <= lon <= x1 and y0 <= lat <= y1
                if ins:
                    if run is None:
                        run = [t, t, 0]
                    run[1] = t
                    run[2] += 1
                elif run is not None:
                    out.append((u, fid, run[0], run[1], run[2]))
                    run = None
    vis = {}
    for u, fid, enter, exit_, n in sorted(out):
        seq = vis.setdefault((u, fid), [])
        seq.append((len(seq) + 1, enter, exit_, n))
    return {
        (u, fid, s): (enter, exit_, n)
        for (u, fid), seqs in vis.items()
        for s, enter, exit_, n in seqs
    }


def test_geofence_visits_matches_brute(spark):
    import numpy as np
    from osm2geojson_spark.operators.trajectory import geofence_visits

    rng = np.random.default_rng(7)
    base = 1_700_000_000
    pings = []
    for u in range(6):
        t = base + int(rng.integers(0, 1000))
        for _ in range(60):
            pings.append(
                (u, t, float(rng.uniform(-20, 20)), float(rng.uniform(-20, 20)))
            )
            t += int(rng.integers(60, 7200))
    fences = [
        (100, -10.0, -10.0, 10.0, 10.0),
        (101, 0.0, 0.0, 20.0, 20.0),     # overlaps fence 100
        (102, -20.0, -20.0, -15.0, -15.0),
        (103, 50.0, 50.0, 60.0, 60.0),   # never hit
    ]
    pdf = spark.createDataFrame(
        pings, "user_id long, tsec long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_seconds(tsec) AS ts", "lon", "lat")
    fdf = spark.createDataFrame(
        fences, "fence_id long, x0 double, y0 double, x1 double, y1 double"
    )
    got = {
        (r["user_id"], r["fence_id"], r["visit_seq"]): (
            int(r["enter_ts"].timestamp()),
            int(r["exit_ts"].timestamp()),
            r["n_pings"],
        )
        for r in geofence_visits(pdf, fdf, res=4).collect()
    }
    want = _brute_visits(pings, fences)
    assert got == want
    assert len(want) > 20  # non-degenerate: re-entries and overlaps occur
    assert not any(fid == 103 for (_, fid, _) in want)


def test_geofence_visits_boundary_and_track_end(spark):
    from osm2geojson_spark.operators.trajectory import geofence_visits
    from pyspark.sql import functions as F

    # boundary ping counts (closed box); track ending inside still closes
    # its visit; leaving and returning yields visit_seq 1 and 2
    rows = [
        (1, 0, 5.0, 5.0),      # inside
        (1, 60, 10.0, 5.0),    # ON the x1 boundary -> inside
        (1, 120, 50.0, 5.0),   # outside (exit)
        (1, 180, 5.0, 5.0),    # re-enter; track ends inside
    ]
    pdf = spark.createDataFrame(
        rows, "user_id long, tsec long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_seconds(tsec) AS ts", "lon", "lat")
    fdf = spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 10.0)],
        "fence_id long, x0 double, y0 double, x1 double, y1 double",
    )
    got = sorted(
        (r["visit_seq"], int(r["enter_ts"].timestamp()),
         int(r["exit_ts"].timestamp()), r["n_pings"], r["dur_s"])
        for r in geofence_visits(pdf, fdf, res=6).collect()
    )
    assert got == [(1, 0, 60, 2, 60), (2, 180, 180, 1, 0)]


# ----------------------------------------------------- track speed/glitch


def test_track_speed_matches_brute(spark):
    import math

    from osm2geojson_spark.operators.trajectory import track_speed

    R = 6371008.8

    def hav(lon1, lat1, lon2, lat2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        h = (
            math.sin((p2 - p1) / 2) ** 2
            + math.cos(p1) * math.cos(p2)
            * math.sin(math.radians(lon2 - lon1) / 2) ** 2
        )
        return 2 * R * math.asin(math.sqrt(min(1.0, h)))

    rows = [
        (1, 0, 0.0, 0.0),
        (1, 3600, 0.5, 0.0),      # ~55.6 km/h: ok
        (1, 3660, 10.0, 5.0),     # huge jump in 60 s: glitch
        (1, 7200, 10.01, 5.0),    # back to normal
        (2, 100, 20.0, 20.0),     # lone ping: NULL speed, not flagged
        (3, 50, 30.0, 30.0),      # duplicate ts: deterministic order,
        (3, 50, 30.2, 30.0),      #   dt=0 -> NULL speed, not flagged
    ]
    df = spark.createDataFrame(
        rows, "user_id long, tsec long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_seconds(tsec) AS ts", "lon", "lat")
    got = {
        (r["user_id"], int(r["ts"].timestamp()), r["lon"]): r
        for r in track_speed(df, vmax_ms=55.0).collect()
    }
    assert len(got) == len(rows)
    r1 = got[(1, 3600, 0.5)]
    assert abs(r1["speed_ms"] - hav(0.0, 0.0, 0.5, 0.0) / 3600) < 1e-9
    assert not r1["is_glitch"]  # ~15.4 m/s < 55
    r2 = got[(1, 3660, 10.0)]
    assert r2["is_glitch"] and r2["speed_ms"] > 1000
    assert got[(2, 100, 20.0)]["speed_ms"] is None
    assert not got[(2, 100, 20.0)]["is_glitch"]
    dup = got[(3, 50, 30.2)]
    assert dup["dt_us"] == 0 and dup["speed_ms"] is None and not dup["is_glitch"]
    first3 = got[(3, 50, 30.0)]
    assert first3["speed_ms"] is None  # track head under the tiebreak order


# ------------------------------------------------------- cell transitions


def test_cell_transitions_collapse_and_dwell(spark):
    from osm2geojson_spark.operators.trajectory import cell_transitions

    # user 1: A A B A (collapsed A->B->A; dwell A->A, A->B, B->A)
    # user 2: C C (collapsed: none; dwell C->C)
    rows = [
        (1, 0, 0.5), (1, 60, 0.5), (1, 120, 10.5), (1, 180, 0.5),
        (2, 0, 20.5), (2, 60, 20.5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, tsec long, lon double"
    ).selectExpr(
        "user_id", "timestamp_seconds(tsec) AS ts", "lon",
        "CAST(0.5 AS DOUBLE) AS lat",
    )
    a = cells.pack_cell_py(6, int((0.5 + 180) / 360 * 64), int((0.5 + 90) / 180 * 64))
    b = cells.pack_cell_py(6, int((10.5 + 180) / 360 * 64), int((0.5 + 90) / 180 * 64))
    c = cells.pack_cell_py(6, int((20.5 + 180) / 360 * 64), int((0.5 + 90) / 180 * 64))
    got = {
        (r["from_cell"], r["to_cell"]): r["n"]
        for r in cell_transitions(df, res=6).collect()
    }
    assert got == {(a, b): 1, (b, a): 1}
    dwell = {
        (r["from_cell"], r["to_cell"]): r["n"]
        for r in cell_transitions(df, res=6, collapse_runs=False).collect()
    }
    assert dwell == {(a, a): 1, (a, b): 1, (b, a): 1, (c, c): 1}


# ----------------------------------------------------------------- DTW


def _brute_dtw(seq_a, seq_b):
    import math

    R = 6371008.8

    def hv(p, q):
        la1, la2 = math.radians(p[1]), math.radians(q[1])
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2)
            * math.sin(math.radians(q[0] - p[0]) / 2) ** 2
        )
        return 2 * R * math.asin(math.sqrt(min(1.0, h)))

    import numpy as np

    n, m = len(seq_a), len(seq_b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i, j] = hv(seq_a[i - 1], seq_b[j - 1]) + min(
                D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
            )
    return float(D[n, m])


def test_dtw_distances_matches_brute(spark):
    import numpy as np

    from osm2geojson_spark.operators.trajectory import dtw_distances

    rng = np.random.default_rng(23)
    tracks = []
    seqs = {}
    for u in range(5):
        seq = []
        lon, lat = float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10))
        for k in range(int(rng.integers(5, 14))):
            lon += float(rng.uniform(-0.5, 0.5))
            lat += float(rng.uniform(-0.5, 0.5))
            tracks.append((u, k, lon, lat))
            seq.append((lon, lat))
        seqs[u] = seq
    tdf = spark.createDataFrame(tracks, "user_id long, tick long, lon double, lat double")
    pairs = [(0, 1), (1, 3), (2, 4), (0, 9)]  # 9 has no track -> absent
    pdf = spark.createDataFrame(pairs, "user_a long, user_b long")
    got = {
        (r["user_a"], r["user_b"]): (r["dtw_m"], r["n_a"], r["n_b"])
        for r in dtw_distances(tdf, pdf).collect()
    }
    assert set(got) == {(0, 1), (1, 3), (2, 4)}
    for (a, b), (d, na, nb) in got.items():
        assert na == len(seqs[a]) and nb == len(seqs[b])
        assert abs(d - _brute_dtw(seqs[a], seqs[b])) < 1e-6
    # identical tracks -> DTW 0
    same = spark.createDataFrame(
        [(7, k, lon, lat) for (_, k, lon, lat) in tracks if _ == 0] or
        [(7, k, lon, lat) for (u, k, lon, lat) in tracks if u == 0],
        "user_id long, tick long, lon double, lat double",
    )
    tdf2 = tdf.unionByName(same)
    p2 = spark.createDataFrame([(0, 7)], "user_a long, user_b long")
    r = dtw_distances(tdf2, p2).collect()[0]
    assert r["dtw_m"] == 0.0


def test_frechet_matches_brute(spark):
    import numpy as np

    from osm2geojson_spark.operators.trajectory import dtw_distances

    def brute_frechet(a, b):
        import math

        R = 6371008.8

        def hv(p, q):
            la1, la2 = math.radians(p[1]), math.radians(q[1])
            h = (
                math.sin((la2 - la1) / 2) ** 2
                + math.cos(la1) * math.cos(la2)
                * math.sin(math.radians(q[0] - p[0]) / 2) ** 2
            )
            return 2 * R * math.asin(math.sqrt(min(1.0, h)))

        n, m = len(a), len(b)
        Fm = np.full((n, m), np.inf)
        for i in range(n):
            for j in range(m):
                c = hv(a[i], b[j])
                if i == 0 and j == 0:
                    Fm[i, j] = c
                elif i == 0:
                    Fm[i, j] = max(c, Fm[0, j - 1])
                elif j == 0:
                    Fm[i, j] = max(c, Fm[i - 1, 0])
                else:
                    Fm[i, j] = max(
                        c, min(Fm[i - 1, j], Fm[i, j - 1], Fm[i - 1, j - 1])
                    )
        return float(Fm[n - 1, m - 1])

    rng = np.random.default_rng(29)
    tracks, seqs = [], {}
    for u in range(4):
        seq = []
        lon, lat = float(rng.uniform(-5, 5)), float(rng.uniform(-5, 5))
        for k in range(int(rng.integers(4, 11))):
            lon += float(rng.uniform(-0.4, 0.4))
            lat += float(rng.uniform(-0.4, 0.4))
            tracks.append((u, k, lon, lat))
            seq.append((lon, lat))
        seqs[u] = seq
    tdf = spark.createDataFrame(tracks, "user_id long, tick long, lon double, lat double")
    pdf = spark.createDataFrame([(0, 1), (2, 3)], "user_a long, user_b long")
    got = {
        (r["user_a"], r["user_b"]): r["dtw_m"]
        for r in dtw_distances(tdf, pdf, metric="frechet").collect()
    }
    for (a, b), d in got.items():
        assert abs(d - brute_frechet(seqs[a], seqs[b])) < 1e-9, (a, b)


def test_trips_chaining(spark, pings):
    import math

    from osm2geojson_spark.operators.trajectory import trips

    R = 6371008.8
    stays = stay_points(pings, res=6, min_duration_s=3600)
    got = {
        (r["user_id"], r["trip_seq"]): r for r in trips(stays).collect()
    }
    srows = {}
    for r in stays.collect():
        srows.setdefault(r["user_id"], []).append(r)
    n_expected = 0
    for u, rs in srows.items():
        rs.sort(key=lambda r: r["stay_seq"])
        for a, b in zip(rs, rs[1:]):
            n_expected += 1
            t = got[(u, a["stay_seq"])]
            assert t["from_cell"] == a["cell_id"]
            assert t["to_cell"] == b["cell_id"]
            assert t["depart_ts"] == a["t_end"]
            assert t["arrive_ts"] == b["t_start"]
            assert t["travel_s"] == int(
                (b["t_start"] - a["t_end"]).total_seconds()
            )

            def ctr(cell):
                n = 1 << (cell >> 58)
                x = (cell % (1 << 58)) >> 29
                y = cell % (1 << 29)
                return (
                    (x + 0.5) / n * 360.0 - 180.0,
                    (y + 0.5) / n * 180.0 - 90.0,
                )

            (lo1, la1), (lo2, la2) = ctr(a["cell_id"]), ctr(b["cell_id"])
            p1, p2 = math.radians(la1), math.radians(la2)
            h = (
                math.sin((p2 - p1) / 2) ** 2
                + math.cos(p1) * math.cos(p2)
                * math.sin(math.radians(lo2 - lo1) / 2) ** 2
            )
            brute = 2 * R * math.asin(math.sqrt(min(1.0, h)))
            assert abs(t["dist_m"] - brute) < 1e-9
    assert len(got) == n_expected and n_expected >= 2
    # user 1's revisit trip (A -> A) has dist 0 but real travel time
    u1 = [t for (u, _), t in got.items() if u == 1 and t["dist_m"] == 0.0]
    assert len(u1) == 1 and u1[0]["travel_s"] > 0


def test_convoy_episodes_islands_and_gate(spark):
    from osm2geojson_spark.operators.trajectory import convoy_episodes

    M = 60 * 1_000_000  # 1 minute in us
    # users 1 and 2 move TOGETHER ticks 10..13 (cells change tick to tick —
    # still one convoy), separate at 14, rejoin for the single tick 15:
    # episodes (10,13,4) and (15,15,1); min_len=2 keeps only the first.
    rows = []
    for u, off in ((1, 0.0), (2, 0.05)):
        rows += [
            (u, 10 * M, 10.0 + off, 5.0),
            (u, 13 * M, 40.0 + off, 5.0),  # drift across cells together
        ]
    rows += [(1, 14 * M, 60.0, 5.0), (2, 14 * M, 120.0, 5.0)]
    rows += [(1, 15 * M, 80.0, 5.0), (2, 15 * M, 80.05, 5.0)]
    rows += [(1, 16 * M, 60.0, 5.0), (2, 16 * M, 120.0, 5.0)]
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_micros(t_us) AS ts", "lon", "lat")

    all_eps = {
        (r["user_a"], r["user_b"], r["start_tick"], r["end_tick"]): r["n_ticks"]
        for r in convoy_episodes(df, 60, res=6, min_len=1).collect()
    }
    assert all_eps == {(1, 2, 10, 13): 4, (1, 2, 15, 15): 1}
    gated = convoy_episodes(df, 60, res=6, min_len=2).collect()
    assert [(r["start_tick"], r["end_tick"], r["n_ticks"]) for r in gated] == [
        (10, 13, 4)
    ]


def test_convoy_episodes_matches_brute(spark):
    from osm2geojson_spark.operators.trajectory import (
        convoy_episodes,
        resample_tracks,
    )

    M = 60 * 1_000_000
    rows = []
    for u in range(6):
        t = 0
        for k in range(8):
            t += 30_000_000 + ((u * 7 + k * 13) % 5) * 25_000_000
            lon = ((u * 31 + k * 57) % 11) * 1.7 - 5.0
            lat = ((u * 17 + k * 29) % 7) * 1.3 - 4.0
            rows.append((u, t, lon, lat))
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_micros(t_us) AS ts", "lon", "lat")

    from osm2geojson_spark.operators import cells

    res = 2
    samp = resample_tracks(df, 60).select(
        "user_id", "tick", cells.cell_id(F.col("lon"), F.col("lat"), res).alias("c")
    )
    occ = {}
    for r in samp.collect():
        occ.setdefault((r["tick"], r["c"]), []).append(r["user_id"])
    ticks_by_pair = {}
    for (tick, _c), us in occ.items():
        us = sorted(us)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                ticks_by_pair.setdefault((us[i], us[j]), set()).add(tick)
    want = {}
    for pair, ticks in ticks_by_pair.items():
        ts = sorted(ticks)
        s = ts[0]
        prev = ts[0]
        for t in ts[1:] + [None]:
            if t is None or t != prev + 1:
                want[(pair[0], pair[1], s, prev)] = prev - s + 1
                if t is not None:
                    s = t
            prev = t if t is not None else prev
    got = {
        (r["user_a"], r["user_b"], r["start_tick"], r["end_tick"]): r["n_ticks"]
        for r in convoy_episodes(df, 60, res=res, min_len=1).collect()
    }
    assert got == want and len(want) > 3


def test_track_bearing_compass_and_turns(spark):
    import math

    from osm2geojson_spark.operators.trajectory import track_bearing

    S = 1_000_000
    # user 1 walks: east, north, west along the equator-ish — bearings
    # 90, 0, 270; turns: NULL, -90, -90 (wait: 0 -> 270 is -90 via the
    # (-180, 180] normalization)
    rows = [
        (1, 0 * S, 0.0, 0.0),
        (1, 60 * S, 1.0, 0.0),   # east: 90
        (1, 120 * S, 1.0, 1.0),  # north: 0
        (1, 180 * S, 0.0, 1.0),  # west: 270 (turn 0 -> 270 = -90)
        (1, 240 * S, 0.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_micros(t_us) AS ts", "lon", "lat")
    got = [
        (r["bearing_deg"], r["turn_deg"])
        for r in track_bearing(df).orderBy("ts").collect()
    ]
    assert len(got) == 4
    assert abs(got[0][0] - 90.0) < 1e-6 and got[0][1] is None
    assert abs(got[1][0] - 0.0) < 2e-2  # east leg ends at lat 0: due north
    assert abs(got[1][1] - (got[1][0] - got[0][0])) < 1e-9
    assert abs(got[2][0] - 270.0) < 2e-2
    # 0ish -> 270ish crosses the wrap: turn must be ~-90, never ~+270
    assert -91 < got[2][1] < -89

    # brute parity on irregular legs
    def brute_bearing(lo0, la0, lo1, la1):
        dl = math.radians(lo1 - lo0)
        b = math.degrees(
            math.atan2(
                math.sin(dl) * math.cos(math.radians(la1)),
                math.cos(math.radians(la0)) * math.sin(math.radians(la1))
                - math.sin(math.radians(la0))
                * math.cos(math.radians(la1))
                * math.cos(dl),
            )
        )
        return b + 360.0 if b < 0 else b

    pts = [(0.0, 0.0), (3.2, 1.1), (2.0, 4.5), (-1.0, 3.0)]
    rows2 = [(7, k * S, lo, la) for k, (lo, la) in enumerate(pts)]
    df2 = spark.createDataFrame(
        rows2, "user_id long, t_us long, lon double, lat double"
    ).selectExpr("user_id", "timestamp_micros(t_us) AS ts", "lon", "lat")
    got2 = [r["bearing_deg"] for r in track_bearing(df2).orderBy("ts").collect()]
    want2 = [
        round(brute_bearing(*pts[i], *pts[i + 1]), 6) for i in range(len(pts) - 1)
    ]
    assert got2 == want2


def test_covisitation_matches_brute_and_cap_is_deterministic(spark):
    import math

    from osm2geojson_spark.operators.trajectory import covisitation

    # visit sets: u1 {A,B,C}, u2 {A,B}, u3 {B,C}, u4 {D}
    # (cells as plain ids — the operator is cell-scheme agnostic)
    A, B, C, D = 101, 102, 103, 104
    visits = [
        (1, A), (1, B), (1, C), (1, A),  # duplicate visit: distinct first
        (2, A), (2, B),
        (3, B), (3, C),
        (4, D),
    ]
    df = spark.createDataFrame(visits, "user_id long, cell_id long")
    got = {
        (r["cell_a"], r["cell_b"]): (r["n_ab"], r["pmi"])
        for r in covisitation(df, min_support=2, max_cells_per_user=None).collect()
    }
    N = 4
    n = {A: 2, B: 3, C: 2, D: 1}
    want_pairs = {(A, B): 2, (B, C): 2}  # (A,C) has support 1: gated
    want = {
        p: (s, round(math.log(N * s / (n[p[0]] * n[p[1]])), 6))
        for p, s in want_pairs.items()
    }
    assert got == want

    # cap: with max_cells_per_user=1 each user keeps exactly the cell the
    # congruential hash ranks first — deterministic, so re-running agrees
    from osm2geojson_spark.operators.sampling import sample_hash

    kept = covisitation(df, min_support=1, max_cells_per_user=1).collect()
    assert kept == []  # one cell per user can never form a pair
    one = (
        df.distinct()
        .withColumn("_h", sample_hash(F.col("cell_id")))
        .collect()
    )
    best = {}
    for r in one:
        k = (r["_h"], r["cell_id"])
        if r["user_id"] not in best or k < best[r["user_id"]]:
            best[r["user_id"]] = k
    # sanity: the hash order is a real permutation, not id order
    assert len({v[1] for v in best.values()}) >= 2


def test_location_entropy_matches_brute_and_extremes(spark):
    import math

    from osm2geojson_spark.operators.trajectory import location_entropy

    # user 1: all pings in one cell -> H = 0 exactly
    # user 2: uniform over 4 distinct cells -> H = ln 4
    # user 3: skewed 5/2/1
    rows = []
    rows += [(1, 0.5, 0.5)] * 6
    for lon in (0.5, 10.5, 20.5, 30.5):
        rows += [(2, lon, 0.5)] * 3
    rows += [(3, 0.5, 0.5)] * 5 + [(3, 10.5, 0.5)] * 2 + [(3, 20.5, 0.5)]
    df = spark.createDataFrame(rows, "user_id long, lon double, lat double")
    got = {
        r["user_id"]: (r["n_pings"], r["n_cells"], r["s_q"], r["entropy"])
        for r in location_entropy(df, res=6).collect()
    }

    def brute(cs):
        n = sum(cs)
        s_q = sum(round(c * math.log(c) * 1e6) for c in cs)
        return (n, len(cs), s_q, round(math.log(n) - (s_q / 1e6) / n, 6))

    assert got[1] == brute([6])
    assert got[2] == brute([3, 3, 3, 3])
    assert got[3] == brute([5, 2, 1])
    assert got[1][3] == 0.0
    assert abs(got[2][3] - math.log(4)) < 2e-6


def test_track_nll_matches_brute_markov(spark):
    """Markov NLL: Python dict replay of train-then-score on a corpus
    where user 10 follows the common A->B->A shuttle and user 30 takes a
    once-in-corpus detour — the detour must score strictly higher."""
    import datetime
    import math

    from osm2geojson_spark.operators.trajectory import track_nll

    A, B, C = 0.5, 10.5, 20.5  # distinct res-6 cells at lat 0.5
    t0 = datetime.datetime(2024, 1, 1)

    def mk(uid, lons):
        return [
            (uid, t0 + datetime.timedelta(hours=i), lon, 0.5)
            for i, lon in enumerate(lons)
        ]

    rows = (
        mk(10, [A, B, A, B, A])
        + mk(20, [A, B, A, B])
        + mk(30, [A, B, C, A])  # B->C and C->A are rare
        + mk(40, [A, A, A, B])  # run collapse: one A->B step
    )
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, lon double, lat double"
    )
    got = {r["user_id"]: r for r in track_nll(df, res=6).collect()}

    # brute replay
    seqs = {}
    for uid, ts, lon, lat in rows:
        seqs.setdefault(uid, []).append((ts, lon))
    edges = []
    for uid, pts in seqs.items():
        pts.sort()
        cellseq = []
        for _, lon in pts:
            c = int((lon + 180.0) / 360.0 * 64)
            if not cellseq or cellseq[-1] != c:
                cellseq.append(c)
        edges += [(uid, a, b) for a, b in zip(cellseq, cellseq[1:])]
    n_ft, n_f = {}, {}
    for _, a, b in edges:
        n_ft[(a, b)] = n_ft.get((a, b), 0) + 1
        n_f[a] = n_f.get(a, 0) + 1
    want = {}
    for uid in seqs:
        terms = [
            round((math.log(n_ft[(a, b)]) - math.log(n_f[a])) * 1e6)
            for u, a, b in edges
            if u == uid
        ]
        want[uid] = (len(terms), -sum(terms))
    for uid, (steps, nll) in want.items():
        assert (got[uid]["n_steps"], got[uid]["nll_micro"]) == (steps, nll), uid
        assert got[uid]["avg_nll"] == round(nll / steps / 1e6, 6)
    assert got[40]["n_steps"] == 1  # dwell collapsed
    # the detour user is the anomaly
    assert got[30]["avg_nll"] > got[10]["avg_nll"]


def test_frechet_sq_matches_scalar_dp_and_properties(spark):
    """frechet_sq == a from-scratch O(n*m) scalar DP; identity = 0,
    symmetry via swapped pair, bottleneck <= any single coupling."""
    import numpy as np

    from osm2geojson_spark.operators.trajectory import frechet_sq

    rng = np.random.default_rng(3)
    tracks = []
    for u in range(4):
        n = 6 + u
        for t in range(n):
            tracks.append(
                (u, t, int(t * 2 + rng.integers(-2, 3)),
                 int(u * 3 + rng.integers(-2, 3)))
            )
    tracks.append((9, 0, 5, 5))  # single-point track
    tdf = spark.createDataFrame(tracks, "user_id long, tick long, x long, y long")
    pdf = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 3), (0, 0), (9, 2)], "user_a long, user_b long"
    )
    got = {
        (r["user_a"], r["user_b"]): r
        for r in frechet_sq(tdf, pdf).collect()
    }

    def brute(ua, ub):
        A = [(x, y) for u, t, x, y in sorted(tracks) if u == ua]
        B = [(x, y) for u, t, x, y in sorted(tracks) if u == ub]
        n, m = len(A), len(B)
        c = [[(a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 for b in B] for a in A]
        dp = [[None] * m for _ in range(n)]
        for i in range(n):
            for j in range(m):
                if i == 0 and j == 0:
                    dp[i][j] = c[0][0]
                else:
                    cands = []
                    if i > 0:
                        cands.append(dp[i - 1][j])
                    if j > 0:
                        cands.append(dp[i][j - 1])
                    if i > 0 and j > 0:
                        cands.append(dp[i - 1][j - 1])
                    dp[i][j] = max(c[i][j], min(cands))
        return dp[n - 1][m - 1], n, m

    for ua, ub in [(0, 1), (1, 0), (2, 3), (0, 0), (9, 2)]:
        want, n, m = brute(ua, ub)
        r = got[(ua, ub)]
        assert (r["frechet_sq"], r["n_a"], r["n_b"]) == (want, n, m), (ua, ub)
    assert got[(0, 0)]["frechet_sq"] == 0                      # identity
    assert got[(0, 1)]["frechet_sq"] == got[(1, 0)]["frechet_sq"]  # symmetry
    # single-point vs track: bottleneck = max distance to that point
    A = [(x, y) for u, t, x, y in sorted(tracks) if u == 2]
    want9 = max((x - 5) ** 2 + (y - 5) ** 2 for x, y in A)
    assert got[(9, 2)]["frechet_sq"] == want9


def test_viterbi_smooth_brute_and_glitch_absorption(spark):
    """Exhaustive 2^T brute force over (cost, mask) in pure Python on
    random observation tracks + the smoothing property: an isolated
    glitch never flips the decoded regime, and a genuine regime change
    does."""
    import random
    from itertools import product

    import duckdb

    from osm2geojson_spark.operators.trajectory import (
        VIT_EMIT,
        VIT_TRANS,
        viterbi_smooth,
        viterbi_smooth_sql,
    )

    rng = random.Random(8)
    rows = []
    # user 0: stay regime with a single glitch at idx 3
    rows += [(0, i, 2 if i == 3 else 0) for i in range(10)]
    # user 1: true regime change at idx 5
    rows += [(1, i, 0 if i < 5 else 2) for i in range(10)]
    # users 2..6: random tracks
    for u in range(2, 7):
        rows += [(u, i, rng.randrange(0, 3)) for i in range(9)]

    df = spark.createDataFrame(rows, "user_id long, idx long, obs long")
    got = {
        (r["user_id"], r["idx"]): (r["state"], r["path_cost"])
        for r in viterbi_smooth(df).collect()
    }

    def brute(ob):
        best = None
        t = len(ob)
        for states in product((0, 1), repeat=t):
            c = VIT_EMIT[states[0]][ob[0]]
            for i in range(1, t):
                c += VIT_TRANS[states[i - 1]][states[i]]
                c += VIT_EMIT[states[i]][ob[i]]
            mask = sum(s << i for i, s in enumerate(states))
            if best is None or (c, mask) < best:
                best = (c, mask)
        return best

    users = sorted({u for u, _, _ in rows})
    for u in users:
        ob = [o for uu, i, o in sorted(rows) if uu == u]
        c, mask = brute(ob)
        for i in range(len(ob)):
            assert got[(u, i)] == ((mask >> i) & 1, c), (u, i)
    # smoothing assertions
    assert all(got[(0, i)][0] == 0 for i in range(10))     # glitch absorbed
    assert [got[(1, i)][0] for i in range(10)] == [0] * 5 + [1] * 5

    duck = duckdb.connect()
    duck.execute("CREATE TABLE obs (user_id BIGINT, idx BIGINT, obs BIGINT)")
    duck.executemany("INSERT INTO obs VALUES (?, ?, ?)", rows)
    twin = {
        (r[0], r[1]): (r[3], r[4])
        for r in duck.sql(
            viterbi_smooth_sql("SELECT * FROM obs")
        ).fetchall()
    }
    assert twin == got


def test_home_work_anchors_replay_and_ties(spark):
    """Dict replay on a designed fixture: a user with a clear
    night-home and day-work split, a tie broken to the lowest cell, a
    user with no night pings (NULL home), and the DuckDB twin."""
    from datetime import datetime

    import duckdb

    from osm2geojson_spark.operators.trajectory import (
        home_work_anchors,
        home_work_anchors_sql,
    )

    def ping(u, day, hour, cell):
        return (u, datetime(2024, 3, day, hour, 0, 0), cell)

    rows = []
    # user 1: nights at 100 (3x), days at 200 (2x), one stray night at 300
    rows += [ping(1, d, 23, 100) for d in (1, 2, 3)]
    rows += [ping(1, d, 10, 200) for d in (1, 2)]
    rows += [ping(1, 4, 2, 300)]
    # user 2: night tie between cells 7 and 5 (2 each) -> lowest wins
    rows += [ping(2, 1, 23, 7), ping(2, 2, 0, 7),
             ping(2, 3, 23, 5), ping(2, 4, 1, 5)]
    # user 3: only afternoon pings -> home NULL, work set
    rows += [ping(3, 1, 14, 9), ping(3, 2, 15, 9)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, cell_id long")
    got = {r["user_id"]: r.asDict() for r in home_work_anchors(df).collect()}

    assert got[1]["home_cell"] == 100 and got[1]["n_night_home"] == 3
    assert got[1]["n_night"] == 4 and got[1]["home_share_micro"] == 750_000
    assert got[1]["work_cell"] == 200 and got[1]["n_work_at"] == 2
    assert got[1]["same_place"] is False
    assert got[2]["home_cell"] == 5  # tie -> lowest cell
    assert got[3]["home_cell"] is None and got[3]["work_cell"] == 9
    assert got[3]["home_share_micro"] is None

    duck = duckdb.connect()
    duck.execute("CREATE TABLE hwp (user_id BIGINT, ts TIMESTAMP, cell_id BIGINT)")
    duck.executemany("INSERT INTO hwp VALUES (?,?,?)", rows)
    twin = {
        r[0]: tuple(r)
        for r in duck.sql(home_work_anchors_sql("SELECT * FROM hwp")).fetchall()
    }
    cols = ["user_id", "home_cell", "n_night_home", "n_night", "work_cell",
            "n_work_at", "n_work", "n_pings", "same_place", "home_share_micro"]
    for u, g in got.items():
        assert twin[u] == tuple(g[c] for c in cols), u


def test_bearing_resultant_brute_and_twin(spark):
    """Scalar replay of the quantized-unit-vector sums; a straight-line
    walker concentrates at rbar_micro == 1e6, a back-and-forth walker
    cancels to ~0; zero-displacement steps are skipped; twin matches."""
    import datetime
    import math

    import duckdb

    def t(i):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)

    from osm2geojson_spark.operators.trajectory import (
        bearing_resultant,
        bearing_resultant_sql,
    )

    rows = (
        # straight NE walker
        [(1, t(i), 10.0 + i * 0.5, 20.0 + i * 0.5) for i in range(8)]
        # back-and-forth (even steps east, odd steps west) + one stall
        + [(2, t(i), 5.0 + (i % 2) * 1.0, -3.0) for i in range(9)]
        + [(2, t(9), 6.0, -3.0)]  # duplicate position -> skipped step
        # L-shaped: 3 east then 3 north
        + [(3, t(i), float(i), 0.0) for i in range(4)]
        + [(3, t(4 + i), 3.0, 1.0 + i) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, lon double, lat double")
    got = {r["user_id"]: r.asDict() for r in bearing_resultant(df).collect()}

    # scalar replay
    from collections import defaultdict

    series = defaultdict(list)
    for u, ts, lon, lat in rows:
        series[u].append((ts, lon, lat))
    for u, pts in series.items():
        pts.sort()
        sx = sy = n = 0
        for (t0, x0, y0), (t1, x1, y1) in zip(pts, pts[1:]):
            dx, dy = x1 - x0, y1 - y0
            hyp = math.sqrt(dx * dx + dy * dy)
            if hyp > 0:
                n += 1
                sx += round(1000000.0 * dx / hyp)
                sy += round(1000000.0 * dy / hyp)
        r = got[u]
        assert (r["n_steps"], r["sx"], r["sy"]) == (n, sx, sy), u
        assert r["rbar_micro"] == math.floor(
            math.sqrt(float(sx) ** 2 + float(sy) ** 2) / n
        )
    assert got[1]["rbar_micro"] >= 999999  # perfectly straight
    assert got[2]["rbar_micro"] <= 120000  # mostly cancelling
    assert got[2]["n_steps"] == 9  # the stall step was dropped
    # L-shape: 3 east + 3 north -> resultant at 45 deg, rbar = cos(45)
    assert abs(got[3]["rbar_micro"] - int(1e6 * math.sqrt(2) / 2)) <= 2

    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE bp (user_id BIGINT, ts TIMESTAMP, lon DOUBLE, lat DOUBLE)"
    )
    duck.executemany("INSERT INTO bp VALUES (?, ?, ?, ?)", rows)
    twin = {
        r[0]: r
        for r in duck.sql(
            bearing_resultant_sql("SELECT * FROM bp")
        ).fetchall()
    }
    for u, r in got.items():
        assert twin[u] == (u, r["n_steps"], r["sx"], r["sy"], r["rbar_micro"])
