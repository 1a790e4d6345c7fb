"""Cell-partitioned layout: partition pruning reaches the scan, data round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2geojson_spark.operators import cells
from osm2geojson_spark.plans import layout
from osm2geojson_spark.sources import synthetic as SYN


def test_partitioned_write_and_pruning(spark, tmp_path):
    path = str(tmp_path / "imgs_part")
    imgs = SYN.synthetic_images(spark, 2000, with_bytes=False)
    layout.write_images_partitioned(imgs, path, coarse_res=2)

    full = spark.read.parquet(path)
    assert full.count() == 2000

    # pick the busiest coarse cell and prune to it
    top = (
        full.groupBy(layout.PARTITION_COL).count().orderBy(F.desc("count")).first()
    )
    pruned = layout.read_images_for_cells(spark, path, [top[layout.PARTITION_COL]])
    assert pruned.count() == top["count"]

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pcell" in plan
    # the partition predicate must NOT appear as a post-scan data filter
    assert plan.count("PushedFilters: []") >= 1

    # round-trip: partition column equals the recomputed coarse cell
    re = pruned.withColumn(
        "expect",
        cells.cell_id(SYN.phash_lon(F.col("phash")), SYN.phash_lat(F.col("phash")), 2),
    )
    assert re.filter(F.col("expect") != F.col(layout.PARTITION_COL)).count() == 0


# ----------------------------------------------------------------- geohash


def _ref_geohash(lon, lat, precision):
    """Textbook interval-halving geohash encoder (public algorithm,
    written fresh as the test oracle — no bit arithmetic shared with the
    column implementation)."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, ch, out, even = 0, 0, [], True
    while len(out) < precision:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon >= mid:
                ch, lon_r[0] = ch * 2 + 1, mid
            else:
                ch, lon_r[1] = ch * 2, mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                ch, lat_r[0] = ch * 2 + 1, mid
            else:
                ch, lat_r[1] = ch * 2, mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_key_matches_interval_halving_reference(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.cells import geohash_key

    assert _ref_geohash(-5.6, 42.6, 5) == "ezs42"  # canonical example
    rng = np.random.default_rng(2)
    pts = [(i, float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90))) for i in range(150)]
    pts += [(1000, -5.6, 42.6), (1001, 0.0, 0.0), (1002, -180.0, -90.0), (1003, 179.999, 89.999)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    for p in (1, 6, 12):
        got = {
            r["id"]: r["gh"]
            for r in df.select(
                "id", geohash_key(F.col("lon"), F.col("lat"), p).alias("gh")
            ).collect()
        }
        for i, lon, lat in pts:
            assert got[i] == _ref_geohash(lon, lat, p), (p, i)


def test_geohash_prefix_is_spatial_containment(spark):
    """The defining layout property: points sharing a geohash prefix are
    in the same coarser geohash cell — prefix(gh6, 3) == gh3."""
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.cells import geohash_key

    df = spark.range(500).select(
        (F.col("id") * 0.7 - 175).alias("lon"), (F.col("id") * 0.35 - 87).alias("lat")
    )
    bad = df.select(
        geohash_key(F.col("lon"), F.col("lat"), 6).alias("g6"),
        geohash_key(F.col("lon"), F.col("lat"), 3).alias("g3"),
    ).filter(F.substring("g6", 1, 3) != F.col("g3"))
    assert bad.count() == 0


# -------------------------------------------------- adaptive quadtree bins


def _brute_adaptive(pts, cap, res_min, res_max):
    """Reference: coarsest ancestor with count <= cap, else res_max cell.
    Ancestors derive from the res_max cell by integer shifts, exactly as
    the operator does."""

    def cmax(lon, lat):
        n = 1 << res_max
        x = max(0, min(n - 1, int((lon + 180.0) / 360.0 * n)))
        y = max(0, min(n - 1, int((lat + 90.0) / 180.0 * n)))
        return x, y

    cells_max = [cmax(lon, lat) for lon, lat in pts]
    out = []
    for x, y in cells_max:
        chosen = None
        for r in range(res_min, res_max):
            d = res_max - r
            ax, ay = x >> d, y >> d
            n_r = sum(
                1 for (px, py) in cells_max if (px >> d, py >> d) == (ax, ay)
            )
            if n_r <= cap:
                chosen = (cells.pack_cell_py(r, ax, ay), r)
                break
        if chosen is None:
            chosen = (cells.pack_cell_py(res_max, x, y), res_max)
        out.append(chosen)
    return out


def test_adaptive_cells_matches_brute(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    # dense cluster + sparse background forces mixed resolutions
    pts = [
        (float(rng.uniform(-1, 1)), float(rng.uniform(-1, 1)))
        for _ in range(150)
    ] + [
        (float(rng.uniform(-170, 170)), float(rng.uniform(-80, 80)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = sorted(
        (r["lon"], r["lat"], r["cell_id"], r["res"])
        for r in cells.adaptive_cells(df, cap=20, res_min=2, res_max=6).collect()
    )
    want = sorted(
        (lon, lat, cid, r)
        for (lon, lat), (cid, r) in zip(pts, _brute_adaptive(pts, 20, 2, 6))
    )
    assert got == want
    reses = {r for _, _, _, r in got}
    assert len(reses) >= 3  # genuinely adaptive: several split depths


def test_adaptive_cells_invariants(spark):
    import numpy as np

    rng = np.random.default_rng(8)
    pts = [
        (float(rng.uniform(-40, 40)), float(rng.uniform(-30, 30)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    cap, r0, r1 = 30, 2, 7
    rows = cells.adaptive_cells(df, cap, r0, r1).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault((r["cell_id"], r["res"]), []).append(r)
    for (cid, res), members in by_cell.items():
        # bins respect the cap except at the max depth
        assert len(members) <= cap or res == r1
        # every member's point really lies in the bin (cell bounds)
        n = 1 << res
        x = (cid % (1 << 58)) >> 29
        y = cid % (1 << 29)
        for m in members:
            assert x == max(0, min(n - 1, int((m["lon"] + 180.0) / 360.0 * n)))
            assert y == max(0, min(n - 1, int((m["lat"] + 90.0) / 180.0 * n)))


def test_quadkey_matches_textbook_and_prefix_property(spark):
    from osm2geojson_spark.operators.cells import (
        cell_id,
        pack_cell,
        quadkey_key,
        quadkey_key_sql,
    )

    res = 6

    def textbook_quadkey(x: int, y: int, r: int) -> str:
        # independent digit walk (Bing quadkey spec, our y convention)
        out = []
        for b in range(r - 1, -1, -1):
            out.append(str(((x >> b) & 1) + 2 * ((y >> b) & 1)))
        return "".join(out)

    xy = [(0, 0), (63, 63), (17, 42), (32, 1), (5, 60)]
    df = spark.createDataFrame(xy, "x long, y long").select(
        "x", "y", quadkey_key(pack_cell(res, F.col("x"), F.col("y")), res).alias("qk")
    )
    for r in df.collect():
        assert r["qk"] == textbook_quadkey(r["x"], r["y"], res), (r["x"], r["y"])
        assert len(r["qk"]) == res

    # prefix property: the res-4 parent's quadkey prefixes the res-6 cell's
    child = spark.range(1).select(
        quadkey_key(cell_id(F.lit(100.3), F.lit(-33.7), 6), 6).alias("q6"),
        quadkey_key(cell_id(F.lit(100.3), F.lit(-33.7), 4), 4).alias("q4"),
    ).collect()[0]
    assert child["q6"].startswith(child["q4"])

    # SQL twin parity on the same cells
    import duckdb

    con = duckdb.connect()
    for x, y in xy:
        cell_val = 6 * (1 << 58) + x * (1 << 29) + y
        got_sql = con.sql(
            f"SELECT {quadkey_key_sql(str(cell_val), res)} AS q"
        ).fetchone()[0]
        assert got_sql == textbook_quadkey(x, y, res)


def _brute_kanon(pts, k, res_min, res_max):
    """Residual publish/carry, point by point (written fresh against the
    docstring): level r publishes a cell iff its UNPUBLISHED-below point
    count >= k; unpublished residuals merge into the parent."""

    def xy(lon, lat, r):
        n = 1 << r
        x = max(0, min(n - 1, int((lon + 180.0) / 360.0 * n)))
        y = max(0, min(n - 1, int((lat + 90.0) / 180.0 * n)))
        return x, y

    def cid(r, x, y):
        return (r << 58) + (x << 29) + y

    assigned = [None] * len(pts)
    for r in range(res_max, res_min - 1, -1):
        resid = {}
        for i, (lon, lat) in enumerate(pts):
            if assigned[i] is None:
                resid.setdefault(cid(r, *xy(lon, lat, r)), []).append(i)
        for c, members in resid.items():
            if len(members) >= k:
                for i in members:
                    assigned[i] = (c, r)
    return assigned


def test_kanon_cells_matches_brute_and_publishes_no_small_counts(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    pts = [
        (float(rng.uniform(-1, 1)), float(rng.uniform(-1, 1)))
        for _ in range(80)
    ] + [
        (float(rng.uniform(-170, 170)), float(rng.uniform(-80, 80)))
        for _ in range(40)
    ]
    k, res_min, res_max = 5, 2, 6
    df = spark.createDataFrame(pts, "lon double, lat double")
    rows = cells.kanon_cells(df, k=k, res_min=res_min, res_max=res_max).collect()
    got = sorted(
        (r["lon"], r["lat"], r["cell_id"], r["res"], r["suppressed"])
        for r in rows
    )
    want = sorted(
        (lon, lat, *(pub if pub else (None, None)), pub is None)
        for (lon, lat), pub in zip(pts, _brute_kanon(pts, k, res_min, res_max))
    )
    assert got == want
    # the k-anonymity contract: every published cell count >= k, and the
    # output is genuinely mixed-resolution with some suppression
    pub_counts = {}
    for r in rows:
        if not r["suppressed"]:
            pub_counts[r["cell_id"]] = pub_counts.get(r["cell_id"], 0) + 1
    assert pub_counts and min(pub_counts.values()) >= k
    assert len({r["res"] for r in rows if r["res"] is not None}) >= 2
    assert any(r["suppressed"] for r in rows)


def test_kanon_sql_twin_matches(spark):
    import duckdb

    import numpy as np

    rng = np.random.default_rng(11)
    pts = [
        (float(rng.uniform(-20, 20)), float(rng.uniform(-20, 20)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = sorted(
        (r["lon"], r["lat"], r["cell_id"], r["res"], r["suppressed"])
        for r in cells.kanon_cells(df, k=4, res_min=1, res_max=4).collect()
    )
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "pts_t",
        pd.DataFrame(pts, columns=["lon", "lat"]).astype("float64"),
    )
    sql = cells.kanon_cells_sql("SELECT lon, lat FROM pts_t", 4, 1, 4)
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want


def _brute_hex(x, y, size):
    import math as m

    qf = (m.sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / size
    rf = (2.0 / 3.0 * y) / size
    sf = -qf - rf
    rq, rr, rs = (m.floor(v + 0.5) for v in (qf, rf, sf))
    dq, dr, ds = abs(rq - qf), abs(rr - rf), abs(rs - sf)
    if dq > dr and dq > ds:
        rq = -rr - rs
    elif dr > ds:
        rr = -rq - rs
    return int(rq), int(rr)


def test_hex_cell_matches_brute_sql_twin_and_nearest_center(spark):
    import duckdb
    import numpy as np

    from osm2geojson_spark.operators.cells import (
        _HEX_OFF,
        hex_cell,
        hex_cell_sql,
        hex_center,
        hex_qr,
    )

    rng = np.random.default_rng(21)
    size = 0.25
    pts = [
        (i, float(rng.uniform(-30, 30)), float(rng.uniform(-20, 20)))
        for i in range(400)
    ]
    df = spark.createDataFrame(pts, "i long, lon double, lat double")
    cell = hex_cell(F.col("lon"), F.col("lat"), size)
    q, r = hex_qr(F.col("cell"))
    cx, cy = hex_center(F.col("cell"), size)
    rows = (
        df.withColumn("cell", cell)
        .select("i", "lon", "lat", "cell", q.alias("q"), r.alias("r"),
                cx.alias("cx"), cy.alias("cy"))
        .collect()
    )
    for row in rows:
        bq, br = _brute_hex(row["lon"], row["lat"], size)
        assert (row["q"], row["r"]) == (bq, br)
        assert row["cell"] == (bq + _HEX_OFF) * (1 << 30) + (br + _HEX_OFF)
        # hexagons tile as the Voronoi diagram of their centers: the
        # assigned center is nearest among itself and all 6 neighbors
        d0 = (row["lon"] - row["cx"]) ** 2 + (row["lat"] - row["cy"]) ** 2
        s3 = 3.0**0.5
        for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
            nx = size * (s3 * (bq + dq) + s3 / 2.0 * (br + dr))
            ny = size * 1.5 * (br + dr)
            dn = (row["lon"] - nx) ** 2 + (row["lat"] - ny) ** 2
            assert d0 <= dn + 1e-12

    vals = ", ".join(f"({i}, {lon!r}, {lat!r})" for i, lon, lat in pts)
    twin = dict(
        duckdb.sql(
            f"SELECT i, {hex_cell_sql('lon', 'lat', size)} AS c"
            f" FROM (VALUES {vals}) t(i, lon, lat)"
        ).fetchall()
    )
    assert twin == {row["i"]: row["cell"] for row in rows}


def test_compaction_plan_quota_packing(spark):
    """Quota packing: brute Python replay of the bytes-DESC running-sum
    rule, optimal bin count ceil(total/target) per partition, and the
    overshoot bound bin_bytes < target + largest file in the bin."""
    import math
    import random

    from osm2geojson_spark.plans.layout import compaction_plan

    rng = random.Random(11)
    rows = [
        (p, p * 1000 + j, rng.randint(1, 900))
        for p in range(4)
        for j in range(rng.randint(1, 60))
    ]
    files = spark.createDataFrame(
        rows, "part_key long, file_id long, bytes long"
    )
    target = 1500
    got = {
        (r["part_key"], r["file_id"]): r
        for r in compaction_plan(files, target).collect()
    }
    assert len(got) == len(rows)

    by_part = {}
    for p, fid, b in rows:
        by_part.setdefault(p, []).append((fid, b))
    for p, fs in by_part.items():
        fs.sort(key=lambda t: (-t[1], t[0]))
        cum = 0
        bins = {}
        for fid, b in fs:
            bid = cum // target
            assert got[(p, fid)]["bin_id"] == bid, (p, fid)
            bins.setdefault(bid, []).append(b)
            cum += b
        total = sum(b for _, b in fs)
        assert len(bins) == math.ceil(total / target)
        assert sorted(bins) == list(range(len(bins)))
        for bid, sizes in bins.items():
            assert sum(sizes) < target + max(sizes)


def test_dirty_pyramid_matches_brute_ancestors(spark):
    """dirty_pyramid == the Python-set ancestor closure; level counts
    collapse monotonically toward the root."""
    from osm2geojson_spark.operators import cells

    base_res, min_res = 8, 3
    pts = [(i * 97 % 360 - 180 + 0.5, i * 53 % 180 - 90 + 0.5) for i in range(60)]
    df = spark.createDataFrame(pts, "lon double, lat double").select(
        cells.cell_id(F.col("lon"), F.col("lat"), base_res).alias("cell_id")
    )
    got = {
        (r["level"], r["tile"])
        for r in cells.dirty_pyramid(df, base_res, min_res).collect()
    }

    want = set()
    n = 1 << base_res
    for lon, lat in pts:
        x = min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))
        y = min(n - 1, max(0, int((lat + 90.0) / 180.0 * n)))
        for r in range(min_res, base_res + 1):
            s = base_res - r
            want.add((r, cells.pack_cell_py(r, x >> s, y >> s)))
    assert got == want
    per_level = {}
    for lvl, _ in got:
        per_level[lvl] = per_level.get(lvl, 0) + 1
    counts = [per_level[r] for r in range(min_res, base_res + 1)]
    assert all(a <= b for a, b in zip(counts, counts[1:]))


def test_hilbert_ranges_cover_exactly_and_minimally(spark):
    """The planned ranges must partition exactly the bbox's Hilbert key
    set (reference hilbert_d_py), be pairwise non-adjacent (else they
    would have merged — minimality), and every key inside a range maps
    back to a cell inside the bbox (no overshoot); twin parity."""
    import duckdb

    from osm2geojson_spark.operators.cells import (
        hilbert_d_py,
        hilbert_ranges,
        hilbert_ranges_sql,
    )

    res = 4  # 16x16 grid, small enough to enumerate
    got = sorted(
        (r["key_lo"], r["key_hi"], r["n_cells"])
        for r in hilbert_ranges(spark, -10.0, -10.0, 40.0, 35.0, res=res).collect()
    )
    n = 1 << res
    import math as m

    def qx(lon):
        return max(0, min(n - 1, int(m.floor((lon + 180.0) / 360.0 * n))))

    def qy(lat):
        return max(0, min(n - 1, int(m.floor((lat + 90.0) / 180.0 * n))))

    keys = sorted(
        hilbert_d_py(x, y, res)
        for x in range(qx(-10.0), qx(40.0) + 1)
        for y in range(qy(-10.0), qy(35.0) + 1)
    )
    covered = [k for lo, hi, _ in got for k in range(lo, hi + 1)]
    assert sorted(covered) == keys
    assert all(hi - lo + 1 == nc for lo, hi, nc in got)
    # minimality: consecutive ranges have a gap > 1
    assert all(got[i + 1][0] > got[i][1] + 1 for i in range(len(got) - 1))

    twin = sorted(
        tuple(r)
        for r in duckdb.sql(
            hilbert_ranges_sql(-10.0, -10.0, 40.0, 35.0, res=res)
        ).fetchall()
    )
    assert twin == got


def test_str_partition_balance_and_order(spark):
    """STR invariants on random points with heavy x-ties: slices are
    balanced within 1, tiles within a slice balanced within 1, every
    slice's x-range precedes the next slice's (rank order), and within
    a slice tiles respect y-rank order; twin byte-for-byte."""
    import random

    import duckdb

    from osm2geojson_spark.plans.layout import (
        str_partition,
        str_partition_sql,
    )

    rng = random.Random(5)
    rows = [(i, rng.randrange(0, 40), rng.randrange(0, 1000)) for i in range(130)]
    df = spark.createDataFrame(rows, "pid long, x long, y long")
    got = {r["pid"]: r.asDict() for r in str_partition(df, 4, 4).collect()}

    from collections import Counter

    slices = Counter(g["slice"] for g in got.values())
    assert max(slices.values()) - min(slices.values()) <= 1
    for s in slices:
        tiles = Counter(g["tile"] for g in got.values() if g["slice"] == s)
        assert max(tiles.values()) - min(tiles.values()) <= 1
    # rank-order consistency: sort by (x, pid); slice ids non-decreasing
    order = sorted(got.values(), key=lambda g: (g["x"], g["pid"]))
    sl = [g["slice"] for g in order]
    assert sl == sorted(sl)
    for s in slices:
        in_s = sorted(
            (g for g in got.values() if g["slice"] == s),
            key=lambda g: (g["y"], g["pid"]),
        )
        tl = [g["tile"] for g in in_s]
        assert tl == sorted(tl)

    duck = duckdb.connect()
    duck.execute("CREATE TABLE spt (pid BIGINT, x BIGINT, y BIGINT)")
    duck.executemany("INSERT INTO spt VALUES (?,?,?)", rows)
    twin = {
        r[0]: tuple(r)
        for r in duck.sql(str_partition_sql("SELECT * FROM spt", 4, 4)).fetchall()
    }
    for pid, g in got.items():
        assert twin[pid] == (pid, g["x"], g["y"], g["slice"], g["tile"])
