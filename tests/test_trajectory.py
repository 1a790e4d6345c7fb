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
