"""as-of join contract: inclusive boundary, max-tiebreak on equal ts,
tolerance null-out, and parity with a brute-force per-row oracle."""

from __future__ import annotations

from datetime import datetime

from osm2geojson_spark.operators.asof import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _run(spark, left_rows, right_rows, tolerance_us=None):
    l = spark.createDataFrame(left_rows, "lid long, k long, ts timestamp")
    r = spark.createDataFrame(right_rows, "rid long, k long, ts timestamp, v double")
    out = asof_join(
        l, r, by="k", ts_col="ts", payload_cols=["rid", "v"], tie_col="rid",
        tolerance_us=tolerance_us,
    )
    return {row["lid"]: (row["r_rid"], row["r_v"]) for row in out.collect()}


def test_asof_basic_and_inclusive_and_ties(spark):
    left = [(1, 7, _ts(10)), (2, 7, _ts(5)), (3, 7, _ts(1)), (4, 8, _ts(10))]
    right = [
        (100, 7, _ts(5), 1.0),   # equal ts as lid=2 -> inclusive match
        (101, 7, _ts(5), 2.0),   # same ts, higher rid wins the tie
        (102, 7, _ts(9), 3.0),   # latest before lid=1
        (200, 9, _ts(1), 9.0),   # other key, never matches
    ]
    got = _run(spark, left, right)
    assert got[1] == (102, 3.0)
    assert got[2] == (101, 2.0)   # inclusive + max-rid tiebreak
    assert got[3] == (None, None)  # nothing at or before ts=1
    assert got[4] == (None, None)  # key 8 has no rights

def test_asof_tolerance(spark):
    left = [(1, 7, _ts(30))]
    right = [(100, 7, _ts(10), 1.0)]
    assert _run(spark, left, right)[1] == (100, 1.0)
    # 20s gap > 15s tolerance -> nulled
    assert _run(spark, left, right, tolerance_us=15_000_000)[1] == (None, None)
    assert _run(spark, left, right, tolerance_us=25_000_000)[1] == (100, 1.0)


def test_asof_matches_bruteforce(spark):
    left = [(i, i % 3, _ts((i * 7) % 50 + 1)) for i in range(40)]
    right = [(1000 + j, j % 3, _ts((j * 11) % 50 + 1), float(j)) for j in range(60)]
    got = _run(spark, left, right, tolerance_us=20_000_000)

    for lid, k, lts in left:
        cand = [
            (rts, rid, v)
            for rid, rk, rts, v in right
            if rk == k and rts <= lts and (lts - rts).total_seconds() <= 20
        ]
        want = (None, None) if not cand else (max(cand)[1], max(cand)[2])
        assert got[lid] == want, (lid, got[lid], want)


def test_asof_plan_single_shuffle_no_join(spark):
    left = spark.createDataFrame([(1, 7, _ts(10))], "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 7, _ts(5), 1.0)], "rid long, k long, ts timestamp, v double"
    )
    out = asof_join(left, right, by="k", ts_col="ts", payload_cols=["rid"], tie_col="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + ONE window shuffle; never a join node (no range-join blowup)
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
