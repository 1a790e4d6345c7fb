"""Detection-box ops — IoU join vs brute force, NMS vs a sequential
reference implementation, determinism under reordering."""

from __future__ import annotations

import numpy as np

from osm2geojson_spark.operators.boxes import box_iou_join, nms


def _boxes(seed, n_imgs=8, per_img=25):
    rng = np.random.default_rng(seed)
    rows = []
    bid = 0
    for img in range(n_imgs):
        for _ in range(per_img):
            x0, y0 = int(rng.integers(0, 80)), int(rng.integers(0, 80))
            rows.append(
                (
                    img,
                    bid,
                    x0,
                    y0,
                    x0 + int(rng.integers(5, 30)),
                    y0 + int(rng.integers(5, 30)),
                    int(rng.integers(0, 1000)),
                )
            )
            bid += 1
    return rows


def _iou(a, b):
    iw = max(0, min(a[4], b[4]) - max(a[2], b[2]))
    ih = max(0, min(a[5], b[5]) - max(a[3], b[3]))
    inter = iw * ih
    uni = (a[4] - a[2]) * (a[5] - a[3]) + (b[4] - b[2]) * (b[5] - b[3]) - inter
    return inter, uni


def test_iou_join_matches_brute(spark):
    rows = _boxes(5)
    df = spark.createDataFrame(
        [r[:6] for r in rows],
        "image_id long, box_id long, x0 long, y0 long, x1 long, y1 long",
    )
    got = {
        (r["image_id"], r["id_a"], r["id_b"]): (r["inter"], r["uni"], r["iou"])
        for r in box_iou_join(df, 0.25).collect()
    }
    want = {}
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            if a[0] != b[0]:
                continue
            inter, uni = _iou(a, b)
            if inter * 1_000_000 >= 250_000 * uni:
                ia, ib = sorted((a[1], b[1]))
                want[(a[0], ia, ib)] = (inter, uni, round(inter / uni, 6))
    assert got == want
    assert len(want) > 20  # non-degenerate


def _brute_nms(rows, thr):
    kept = {}
    by_img = {}
    for r in rows:
        by_img.setdefault(r[0], []).append(r)
    t_num = int(round(thr * 1_000_000))
    for img, rs in by_img.items():
        rs = sorted(rs, key=lambda r: (-r[6], r[1]))
        keep = []
        for r in rs:
            if any(
                (lambda iu: iu[0] * 1_000_000 > t_num * iu[1])(_iou(r, k))
                for k in keep
            ):
                continue
            keep.append(r)
        kept[img] = sorted(k[1] for k in keep)
    return kept


def test_nms_matches_reference(spark):
    rows = _boxes(9)
    df = spark.createDataFrame(
        rows,
        "image_id long, box_id long, x0 long, y0 long, x1 long, y1 long, score long",
    )
    out = nms(df, 0.4).collect()
    got = {}
    for r in out:
        got.setdefault(r["image_id"], []).append(r["box_id"])
    got = {k: sorted(v) for k, v in got.items()}
    want = _brute_nms(rows, 0.4)
    assert got == want
    # suppression actually happened
    assert sum(len(v) for v in want.values()) < len(rows)


def test_nms_deterministic_under_shuffle(spark):
    rows = _boxes(13)
    perm = list(rows)
    np.random.default_rng(0).shuffle(perm)
    df1 = spark.createDataFrame(
        rows,
        "image_id long, box_id long, x0 long, y0 long, x1 long, y1 long, score long",
    )
    df2 = spark.createDataFrame(
        perm,
        "image_id long, box_id long, x0 long, y0 long, x1 long, y1 long, score long",
    ).repartition(7)
    r1 = sorted((r["image_id"], r["box_id"]) for r in nms(df1, 0.4).collect())
    r2 = sorted((r["image_id"], r["box_id"]) for r in nms(df2, 0.4).collect())
    assert r1 == r2


def test_mask_iou_brute_and_twin(spark):
    import random

    import duckdb

    from osm2geojson_spark.operators.boxes import mask_iou_join, mask_iou_sql

    rng = random.Random(13)
    # build random binary masks as pixel sets, derive RLE runs
    masks = {}
    for mid in range(8):
        px = set()
        for _ in range(rng.randrange(3, 7)):
            s = rng.randrange(0, 60)
            px.update(range(s, min(64, s + rng.randrange(1, 9))))
        masks[mid] = px
    masks[6] = set()  # empty mask: area 0, iou 0 with everything
    rows = []
    for mid, px in masks.items():
        run = None
        for p in range(65):
            if p in px:
                if run is None:
                    run = p
            elif run is not None:
                rows.append((0, mid, run, p - run))
                run = None
    df = spark.createDataFrame(
        rows, "grp long, mask_id long, start_pos long, run_len long"
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in mask_iou_join(df, band=7).collect()
    }
    # pair census: every (a < b) pair with BOTH masks nonempty-in-RLE
    have = sorted(mid for mid, px in masks.items() if px)
    assert set(got) == {
        (a, b) for i, a in enumerate(have) for b in have[i + 1:]
    }
    for (ia, ib), r in got.items():
        inter = len(masks[ia] & masks[ib])
        uni = len(masks[ia] | masks[ib])
        assert (r["inter"], r["area_a"], r["area_b"], r["uni"]) == (
            inter, len(masks[ia]), len(masks[ib]), uni
        ), (ia, ib)
        want = round(inter / uni, 6) if uni else 0.0
        assert r["iou"] == want

    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE r (grp BIGINT, mask_id BIGINT,"
        " start_pos BIGINT, run_len BIGINT)"
    )
    duck.executemany("INSERT INTO r VALUES (?, ?, ?, ?)", rows)
    twin = {
        (t[1], t[2]): t
        for t in duck.sql(mask_iou_sql("SELECT * FROM r")).fetchall()
    }
    assert set(twin) == set(got)
    for key, r in got.items():
        assert twin[key] == (
            r["grp"], key[0], key[1], r["inter"], r["area_a"],
            r["area_b"], r["uni"], r["iou"],
        ), key
