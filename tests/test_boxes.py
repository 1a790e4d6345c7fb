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


def test_iou_track_chains_occlusion_and_twin(spark):
    """Hand fixture: a drifting object tracked across 5 frames, a track
    BROKEN by a teleport (IoU below threshold -> two tracks), an
    ambiguous crossing resolved by mutual-best, and a lone noise det."""
    import duckdb

    from osm2geojson_spark.operators.boxes import iou_track, iou_track_sql

    dets = []
    # object A: steady drift, frames 0..4, box_id 10+f
    for f in range(5):
        dets.append((1, f, 10 + f, 2 * f, 0, 2 * f + 10, 10))
    # object B: frames 0..4 but TELEPORTS between f=1 and f=2
    for f in range(5):
        x = 100 + 2 * f if f < 2 else 300 + 2 * f
        dets.append((1, f, 20 + f, x, 50, x + 10, 60))
    # two crossing objects in video 2: C drifts right past static D,
    # their cross IoU at f=1 clears the gate (0.47) but each side's
    # best is its own successor (C-C 0.67, D-D 1.0): mutual-best keeps
    # the tracks apart
    for f in range(3):
        dets.append((2, f, 30 + f, 2 * f, 0, 2 * f + 10, 10))       # C
        dets.append((2, f, 40 + f, 4, 2, 14, 12))                   # D
    # lone noise
    dets.append((1, 2, 999, 900, 900, 910, 910))

    df = spark.createDataFrame(
        dets, "video_id long, frame long, box_id long, x0 long, y0 long,"
        " x1 long, y1 long"
    )
    got = {
        (r["video_id"], r["frame"], r["box_id"]): r["track_id"]
        for r in iou_track(df, iou_threshold=0.3).collect()
    }
    K = 100000
    # A: one track rooted at box 10
    for f in range(5):
        assert got[(1, f, 10 + f)] == 1 * K + 10
    # B: broken into [0,1] rooted at 20 and [2,4] rooted at 22
    assert got[(1, 0, 20)] == got[(1, 1, 21)] == 1 * K + 20
    assert got[(1, 2, 22)] == got[(1, 3, 23)] == got[(1, 4, 24)] == 1 * K + 22
    assert got[(1, 1, 21)] != got[(1, 2, 22)]
    # C and D stay separate tracks through the crossing
    assert len({got[(2, f, 30 + f)] for f in range(3)}) == 1
    assert len({got[(2, f, 40 + f)] for f in range(3)}) == 1
    assert got[(2, 0, 30)] != got[(2, 0, 40)]
    # noise: its own singleton track
    assert got[(1, 2, 999)] == 1 * K + 999

    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE dets (video_id BIGINT, frame BIGINT, box_id BIGINT,"
        " x0 BIGINT, y0 BIGINT, x1 BIGINT, y1 BIGINT)"
    )
    duck.executemany(
        "INSERT INTO dets VALUES (?, ?, ?, ?, ?, ?, ?)", dets
    )
    twin = {
        (r[0], r[1], r[2]): r[3]
        for r in duck.sql(
            iou_track_sql("SELECT * FROM dets", iou_threshold=0.3)
        ).fetchall()
    }
    assert twin == got


def test_anchor_assign_rules_brute_and_twin(spark):
    """Scalar replay of the matcher rules on hand-placed GTs: a
    dead-center GT is pos by the hi gate, a small off-grid GT with all
    IoUs < hi still gets its force-matched positive, empty anchors are
    negatives, and the in-between band is 'ignore'."""
    from fractions import Fraction

    import duckdb

    from osm2geojson_spark.operators.boxes import anchor_assign, anchor_assign_sql

    gts = [
        # image 0: GT == anchor (1,1) exactly -> IoU 1 pos; plus a tiny
        # 6x6 GT near anchor (2,2)'s corner -> best IoU small -> forced pos
        (0, 0, 16, 16, 32, 32),
        (0, 1, 30, 34, 36, 40),
        # image 1: tall GT whose best anchor (1,1) is forced pos at
        # IoU 0.41 while runner-up (1,2) sits at 208/672 = 0.3095 ->
        # ignore band
        (1, 0, 16, 6, 32, 45),
    ]
    df = spark.createDataFrame(
        gts, "image_id long, gt_id long, x0 long, y0 long, x1 long, y1 long"
    )
    got = {
        (r["image_id"], r["ax"], r["ay"]): (r["gt_id"], r["label"])
        for r in anchor_assign(df).collect()
    }
    assert len(got) == 2 * 16  # every anchor of both images has one row

    # scalar replay
    def iou(a, g):
        iw = min(a[2], g[2]) - max(a[0], g[0])
        ih = min(a[3], g[3]) - max(a[1], g[1])
        if iw <= 0 or ih <= 0:
            return Fraction(0)
        i = iw * ih
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (g[2] - g[0]) * (g[3] - g[1]) - i
        return Fraction(i, ua)

    anchors = {
        (ax, ay): (ax * 16, ay * 16, ax * 16 + 16, ay * 16 + 16)
        for ax in range(4)
        for ay in range(4)
    }
    for img in (0, 1):
        img_gts = [g for g in gts if g[0] == img]
        # per-GT best anchor (forced)
        forced = set()
        for _, gid, *gb in img_gts:
            best = max(
                anchors,
                key=lambda k: (iou(anchors[k], gb), -k[1], -k[0]),
            )
            if iou(anchors[best], gb) > 0:
                forced.add(best)
        for (ax, ay), ab in anchors.items():
            ious = {
                gid: iou(ab, gb) for _, gid, *gb in img_gts
            }
            best_gid = min(
                (g for g in ious if ious[g] > 0),
                key=lambda g: (-ious[g], g),
                default=None,
            )
            want_gid, want_label = None, "neg"
            if best_gid is not None:
                want_gid = best_gid
                v = ious[best_gid]
                if v >= Fraction(1, 2) or (ax, ay) in forced:
                    want_label = "pos"
                elif v < Fraction(3, 10):
                    want_label = "neg"
                else:
                    want_label = "ignore"
            assert got[(img, ax, ay)] == (want_gid, want_label), (img, ax, ay)

    # the designed cases actually happen
    assert got[(0, 1, 1)] == (0, "pos")
    assert got[(0, 2, 2)][1] == "pos"          # force-matched
    assert got[(1, 1, 2)][1] == "ignore"
    assert got[(0, 0, 3)] == (None, "neg")

    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE gt (image_id BIGINT, gt_id BIGINT, x0 BIGINT,"
        " y0 BIGINT, x1 BIGINT, y1 BIGINT)"
    )
    duck.executemany("INSERT INTO gt VALUES (?, ?, ?, ?, ?, ?)", gts)
    twin = {
        (r[0], r[1], r[2]): (r[3], r[6])
        for r in duck.sql(
            anchor_assign_sql("SELECT * FROM gt")
        ).fetchall()
    }
    assert twin == {k: v for k, v in got.items()}
