"""Detection-box relational ops — IoU pair join and per-image NMS.

The engine's image rows (BASELINE input_hint: image_id, bytes, w, h, fmt,
caption, phash) feed object detectors downstream; their outputs are
(image, box, score) tables that need exactly two primitives at corpus
scale: the IoU self-join (duplicate-detection analysis, label-agreement
audits, tracking association) and non-max suppression (the standard
detector post-process). Both are image-local, so the ONLY shuffle is the
image-id equi-join / groupBy — no spatial index needed: boxes of one
image are bounded (10^2-10^3), the quadratic pair work stays inside a
partition, and 10^12 images parallelize embarrassingly.

Integer-coordinate boxes make every area/intersection an exact int64, so
results are order-independent and a serial SQL oracle hash-matches the
join bit-for-bit; only the final IoU scalar divides two exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import pandas as pd

from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def box_intersection(
    ax0: Column, ay0: Column, ax1: Column, ay1: Column,
    bx0: Column, by0: Column, bx1: Column, by1: Column,
) -> Column:
    """Exact int64 intersection area of two integer [x0,x1)x[y0,y1) boxes."""
    iw = F.greatest(
        F.lit(0), F.least(ax1, bx1) - F.greatest(ax0, bx0)
    )
    ih = F.greatest(
        F.lit(0), F.least(ay1, by1) - F.greatest(ay0, by0)
    )
    return (iw * ih).cast("long")


def box_iou_join(
    boxes: DataFrame,
    iou_threshold: float,
    image_col: str = "image_id",
    box_id: str = "box_id",
) -> DataFrame:
    """All unordered pairs of boxes in the SAME image with
    IoU >= ``iou_threshold``.

    ``boxes``: (image_id, box_id, x0, y0, x1, y1) with integer pixel
    coordinates, x0 < x1, y0 < y1. Returns (image_id, id_a, id_b, inter,
    uni, iou) with id_a < id_b — inter/uni exact int64, iou their rounded
    ratio. The threshold gate compares inter * 1e6 >= t * 1e6 * uni in
    exact integer arithmetic (cross-multiplied), so the decision is
    float-free: a pair at exactly the threshold lands identically on any
    engine.

    Scale: self equi-join on image_id — Catalyst keeps the pair
    enumeration inside the hash-join of one image's boxes; skew (an image
    with 10^5 boxes) is a data bug upstream, not a plan problem, but the
    join accepts the plans/skew salting treatment if needed.
    """
    t_num = int(round(iou_threshold * 1_000_000))
    a = boxes.select(
        F.col(image_col).alias("_img"),
        F.col(box_id).alias("id_a"),
        F.col("x0").alias("_ax0"), F.col("y0").alias("_ay0"),
        F.col("x1").alias("_ax1"), F.col("y1").alias("_ay1"),
    )
    b = boxes.select(
        F.col(image_col).alias("_img"),
        F.col(box_id).alias("id_b"),
        F.col("x0").alias("_bx0"), F.col("y0").alias("_by0"),
        F.col("x1").alias("_bx1"), F.col("y1").alias("_by1"),
    )
    inter = box_intersection(
        F.col("_ax0"), F.col("_ay0"), F.col("_ax1"), F.col("_ay1"),
        F.col("_bx0"), F.col("_by0"), F.col("_bx1"), F.col("_by1"),
    )
    area_a = ((F.col("_ax1") - F.col("_ax0")) * (F.col("_ay1") - F.col("_ay0"))).cast("long")
    area_b = ((F.col("_bx1") - F.col("_bx0")) * (F.col("_by1") - F.col("_by0"))).cast("long")
    uni = area_a + area_b - inter
    return (
        a.join(b, "_img")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("_img").alias(image_col),
            "id_a",
            "id_b",
            inter.alias("inter"),
            uni.alias("uni"),
            F.round(inter.cast("double") / uni.cast("double"), 6).alias("iou"),
        )
        .filter(F.col("inter") * F.lit(1_000_000) >= F.lit(t_num) * F.col("uni"))
    )


def iou_join_sql(
    iou_threshold: float, boxes_cte: str, image_col: str = "image_id"
) -> str:
    """DuckDB twin of box_iou_join over a CTE named ``boxes`` with columns
    (image_id, box_id, x0, y0, x1, y1)."""
    t_num = int(round(iou_threshold * 1_000_000))
    inter = (
        "greatest(0, least(a.x1, b.x1) - greatest(a.x0, b.x0))"
        " * greatest(0, least(a.y1, b.y1) - greatest(a.y0, b.y0))"
    )
    uni = (
        "((a.x1 - a.x0) * (a.y1 - a.y0) + (b.x1 - b.x0) * (b.y1 - b.y0)"
        f" - ({inter}))"
    )
    return f"""
WITH boxes AS ({boxes_cte})
SELECT a.{image_col} AS {image_col},
       a.box_id AS id_a, b.box_id AS id_b,
       CAST({inter} AS BIGINT) AS inter,
       CAST({uni} AS BIGINT) AS uni,
       round(CAST({inter} AS DOUBLE) / CAST({uni} AS DOUBLE), 6) AS iou
FROM boxes a JOIN boxes b
  ON a.{image_col} = b.{image_col} AND a.box_id < b.box_id
WHERE CAST({inter} AS BIGINT) * 1000000 >= {t_num} * CAST({uni} AS BIGINT)
"""


def nms(
    boxes: DataFrame,
    iou_threshold: float,
    image_col: str = "image_id",
    box_id: str = "box_id",
    score_col: str = "score",
) -> DataFrame:
    """Greedy per-image non-max suppression: boxes sorted by (score desc,
    box_id asc — deterministic), each kept box suppresses later boxes
    with IoU > threshold against it. Returns the kept (image_id, box_id)
    rows.

    The greedy scan is inherently sequential PER IMAGE, so it runs as
    grouped applyInPandas — one Arrow batch per image group, vectorized
    IoU against the kept set inside. Cross-image parallelism is total;
    this is the textbook case where per-partition imperative code is the
    right Spark citizen (bounded group, no cross-group state).
    """
    schema = StructType(
        [
            StructField(image_col, boxes.schema[image_col].dataType),
            StructField(box_id, LongType()),
        ]
    )
    t_num = int(round(iou_threshold * 1_000_000))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            [score_col, box_id], ascending=[False, True], kind="mergesort"
        )
        x0 = pdf["x0"].to_numpy(np.int64)
        y0 = pdf["y0"].to_numpy(np.int64)
        x1 = pdf["x1"].to_numpy(np.int64)
        y1 = pdf["y1"].to_numpy(np.int64)
        area = (x1 - x0) * (y1 - y0)
        keep: list[int] = []
        for i in range(len(pdf)):
            if keep:
                k = np.asarray(keep)
                iw = np.minimum(x1[k], x1[i]) - np.maximum(x0[k], x0[i])
                ih = np.minimum(y1[k], y1[i]) - np.maximum(y0[k], y0[i])
                inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
                uni = area[k] + area[i] - inter
                if (inter * 1_000_000 > t_num * uni).any():
                    continue
            keep.append(i)
        out = pdf.iloc[keep]
        return pd.DataFrame(
            {image_col: out[image_col].values, box_id: out[box_id].values}
        )

    return boxes.groupBy(image_col).applyInPandas(kernel, schema)


def mask_iou_join(
    masks: DataFrame,
    band: int = 16,
    grp_col: str = "grp",
    id_col: str = "mask_id",
    start_col: str = "start_pos",
    len_col: str = "run_len",
) -> DataFrame:
    """(grp, id_a, id_b, inter, area_a, area_b, uni, iou) — IoU of
    BINARY SEGMENTATION MASKS computed entirely in the RLE domain
    (COCO maskUtils.iou semantics): masks stay as (start, length) run
    tables (rle_mask's output), pixels are never decoded. The
    label-agreement / duplicate-mask primitive for segmentation corpora.

    All pairs (id_a < id_b) within a group are scored; ``grp`` is the
    comparison bucket (an image key for multi-annotator masks, a dedup
    bucket for cross-image comparison) — the contract is that groups
    are bounded, exactly like box_iou_join's per-image pairs.

    Exactness: intersection = Σ over overlapping run pairs of
    min(ea,eb) − max(sa,sb) — exact int64; areas from Σ run_len; union
    by inclusion-exclusion; only the final iou divides two exact
    integers (round 6). Zero-overlap pairs are emitted with iou 0, so
    the output is the full pair census of each group.

    Scale: run pairs are found with the PBSM reporting-band trick —
    each run explodes to the fixed-width position bands it spans, the
    join keys on (grp, band), and a pair is COUNTED only in the band
    containing max(sa, sb), so no overlap is double-counted and no
    post-join dedup is needed. Band width trades fan-out for candidate
    precision; runs are boundary-sized, so the exploded table is
    O(runs + mask_area/band)."""
    runs = masks.select(
        F.col(grp_col).alias("grp"),
        F.col(id_col).alias("mid"),
        F.col(start_col).cast("long").alias("s"),
        (F.col(start_col) + F.col(len_col)).cast("long").alias("e"),
    )
    bands = runs.select(
        "grp",
        "mid",
        "s",
        "e",
        F.explode(
            F.sequence(
                (F.col("s") / band).cast("long"),
                ((F.col("e") - 1) / band).cast("long"),
            )
        ).alias("band"),
    )
    a = bands.select(
        F.col("grp"),
        F.col("mid").alias("id_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
        "band",
    )
    b = bands.select(
        F.col("grp").alias("grp_b"),
        F.col("mid").alias("id_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
        F.col("band").alias("band_b"),
    )
    ov = (
        a.join(
            b,
            (F.col("grp") == F.col("grp_b"))
            & (F.col("band") == F.col("band_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("sa") < F.col("eb"))
            & (F.col("sb") < F.col("ea"))
            & (
                (F.greatest(F.col("sa"), F.col("sb")) / band).cast("long")
                == F.col("band")
            ),
        )
        .select(
            "grp",
            "id_a",
            "id_b",
            (
                F.least(F.col("ea"), F.col("eb"))
                - F.greatest(F.col("sa"), F.col("sb"))
            ).alias("ov"),
        )
        .groupBy("grp", "id_a", "id_b")
        .agg(F.sum("ov").alias("inter"))
    )
    areas = runs.groupBy("grp", "mid").agg(
        F.sum(F.col("e") - F.col("s")).alias("area")
    )
    aa = areas.select(
        "grp", F.col("mid").alias("id_a"), F.col("area").alias("area_a")
    )
    ab = areas.select(
        F.col("grp").alias("grp_b"),
        F.col("mid").alias("id_b"),
        F.col("area").alias("area_b"),
    )
    pairs = aa.join(
        ab,
        (F.col("grp") == F.col("grp_b")) & (F.col("id_a") < F.col("id_b")),
    ).select("grp", "id_a", "id_b", "area_a", "area_b")
    out = pairs.join(ov, ["grp", "id_a", "id_b"], "left").select(
        "grp",
        "id_a",
        "id_b",
        F.coalesce(F.col("inter"), F.lit(0)).alias("inter"),
        "area_a",
        "area_b",
        (
            F.col("area_a") + F.col("area_b")
            - F.coalesce(F.col("inter"), F.lit(0))
        ).alias("uni"),
    )
    return out.withColumn(
        "iou",
        F.when(
            F.col("uni") > 0,
            F.round(
                F.col("inter").cast("double") / F.col("uni").cast("double"), 6
            ),
        ).otherwise(F.lit(0.0)),
    )


def mask_iou_sql(
    runs_cte: str,
    grp_col: str = "grp",
    id_col: str = "mask_id",
    start_col: str = "start_pos",
    len_col: str = "run_len",
) -> str:
    """DuckDB twin of mask_iou_join — plain interval-overlap join (the
    oracle needs no bands), identical integers and pinned iou."""
    return f"""
WITH runs AS (
  SELECT {grp_col} AS grp, {id_col} AS mid,
         CAST({start_col} AS BIGINT) AS s,
         CAST({start_col} + {len_col} AS BIGINT) AS e
  FROM ({runs_cte})
),
areas AS (
  SELECT grp, mid, CAST(sum(e - s) AS BIGINT) AS area
  FROM runs GROUP BY 1, 2
),
ov AS (
  SELECT a.grp, a.mid AS id_a, b.mid AS id_b,
         CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS inter
  FROM runs a JOIN runs b
    ON a.grp = b.grp AND a.mid < b.mid AND a.s < b.e AND b.s < a.e
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT aa.grp, aa.mid AS id_a, ab.mid AS id_b,
         aa.area AS area_a, ab.area AS area_b
  FROM areas aa JOIN areas ab
    ON aa.grp = ab.grp AND aa.mid < ab.mid
)
SELECT pairs.grp, pairs.id_a, pairs.id_b,
       COALESCE(ov.inter, 0) AS inter,
       pairs.area_a, pairs.area_b,
       (pairs.area_a + pairs.area_b - COALESCE(ov.inter, 0)) AS uni,
       CASE WHEN (pairs.area_a + pairs.area_b - COALESCE(ov.inter, 0)) > 0
            THEN round(
              CAST(COALESCE(ov.inter, 0) AS DOUBLE)
              / CAST(pairs.area_a + pairs.area_b - COALESCE(ov.inter, 0)
                     AS DOUBLE), 6)
            ELSE 0.0
       END AS iou
FROM pairs LEFT JOIN ov
  ON pairs.grp = ov.grp AND pairs.id_a = ov.id_a AND pairs.id_b = ov.id_b
"""


def iou_track(
    dets: DataFrame,
    iou_threshold: float = 0.3,
    max_rounds: int = 8,
    video_col: str = "video_id",
    frame_col: str = "frame",
    box_col: str = "box_id",
) -> DataFrame:
    """(video_id, frame, box_id, track_id) — IOU TRACKING of detections
    across video frames (the data-association core of SORT-style
    trackers): consecutive-frame detection pairs with IoU >= threshold
    are candidate links, the kept links are MUTUAL BEST matches (each
    side is the other's exact-fraction IoU argmax — the deterministic,
    join-expressible sibling of greedy matching; ties break to the
    smaller partner key), and tracks are the connected chains, labeled
    by their smallest video-qualified detection key (= the track's
    first appearance with this fixture's key order).

    All decisions are exact integers: the threshold gate and the argmax
    both compare inter·uni' vs inter'·uni cross-multiplied — no float
    IoU ever orders anything.  Requires integer coords, x0<x1, y0<y1,
    box_id unique within its video and < 100000, video count bounded by
    the int64 key packing (video·1e5 + box_id).

    Scale: candidate links are an equi-join on (video, frame)->(video,
    frame+1) — Catalyst keeps pair enumeration inside one frame-pair's
    hash bucket; the argmax is a bounded self-join over each side's
    candidate list (detections per frame are bounded); chain labeling
    is min-label propagation with pointer doubling (O(log track-length)
    rounds, one shuffle each) via dedup.duplicate_clusters.  10^12
    detections = scan + a handful of natural-key shuffles."""
    from .dedup import duplicate_clusters

    t_num = int(round(iou_threshold * 1_000_000))
    d = dets.select(
        F.col(video_col).alias("vid"),
        F.col(frame_col).cast("long").alias("f"),
        F.col(box_col).cast("long").alias("bid"),
        F.col("x0").cast("long"),
        F.col("y0").cast("long"),
        F.col("x1").cast("long"),
        F.col("y1").cast("long"),
    )
    a = d.select(
        "vid", "f", F.col("bid").alias("ba"),
        F.col("x0").alias("ax0"), F.col("y0").alias("ay0"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
    )
    b = d.select(
        "vid", (F.col("f") - 1).alias("f"), F.col("bid").alias("bb"),
        F.col("x0").alias("bx0"), F.col("y0").alias("by0"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
    )
    iw = F.least("ax1", "bx1") - F.greatest("ax0", "bx0")
    ih = F.least("ay1", "by1") - F.greatest("ay0", "by0")
    inter = F.when((iw > 0) & (ih > 0), iw * ih).otherwise(F.lit(0))
    area_a = (F.col("ax1") - F.col("ax0")) * (F.col("ay1") - F.col("ay0"))
    area_b = (F.col("bx1") - F.col("bx0")) * (F.col("by1") - F.col("by0"))
    cand = (
        a.join(b, ["vid", "f"])
        .withColumn("inter", inter)
        .withColumn("uni", area_a + area_b - inter)
        .filter(F.col("inter") * 1_000_000 >= F.lit(t_num) * F.col("uni"))
        .select("vid", "f", "ba", "bb", "inter", "uni")
    )
    # exact-fraction argmax per side via a beaten-by anti-join
    c2 = cand.select(
        "vid", "f",
        F.col("ba").alias("ba2"), F.col("bb").alias("bb2"),
        F.col("inter").alias("i2"), F.col("uni").alias("u2"),
    )
    beats_a = (F.col("i2") * F.col("uni") > F.col("inter") * F.col("u2")) | (
        (F.col("i2") * F.col("uni") == F.col("inter") * F.col("u2"))
        & (F.col("bb2") < F.col("bb"))
    )
    best_a = cand.join(
        c2,
        (cand["vid"] == c2["vid"]) & (cand["f"] == c2["f"])
        & (cand["ba"] == c2["ba2"]) & (cand["bb"] != c2["bb2"]) & beats_a,
        "left_anti",
    )
    beats_b = (F.col("i2") * F.col("uni") > F.col("inter") * F.col("u2")) | (
        (F.col("i2") * F.col("uni") == F.col("inter") * F.col("u2"))
        & (F.col("ba2") < F.col("ba"))
    )
    best_b = cand.join(
        c2,
        (cand["vid"] == c2["vid"]) & (cand["f"] == c2["f"])
        & (cand["bb"] == c2["bb2"]) & (cand["ba"] != c2["ba2"]) & beats_b,
        "left_anti",
    )
    mutual = best_a.select("vid", "f", "ba", "bb").join(
        best_b.select("vid", "f", "ba", "bb"), ["vid", "f", "ba", "bb"]
    )
    key = lambda v, bid: v * 100000 + bid  # noqa: E731
    verts = d.select(
        "vid", "f", "bid", key(F.col("vid"), F.col("bid")).alias("did")
    )
    edges = mutual.select(
        key(F.col("vid"), F.col("ba")).alias("id_a"),
        key(F.col("vid"), F.col("bb")).alias("id_b"),
    )
    labeled = duplicate_clusters(
        verts.select("did"), edges, id_col="did",
        max_iter=int(max_rounds), shortcut=True,
    ).withColumnRenamed("did", "_ldid")
    return verts.join(
        labeled, verts["did"] == labeled["_ldid"]
    ).select(
        F.col("vid").alias(video_col),
        F.col("f").alias(frame_col),
        F.col("bid").alias(box_col),
        F.col("cluster_id").alias("track_id"),
    )


def iou_track_sql(
    dets_cte: str, iou_threshold: float = 0.3
) -> str:
    """DuckDB twin of iou_track — identical cross-multiplied gate and
    mutual-best anti-joins; chains resolved by a recursive min-label
    closure (tracks are paths, so the recursion is short).
    ``dets_cte`` -> (video_id, frame, box_id, x0, y0, x1, y1)."""
    t_num = int(round(iou_threshold * 1_000_000))
    return f"""
WITH RECURSIVE d AS MATERIALIZED (
  SELECT video_id AS vid, CAST(frame AS BIGINT) AS f,
         CAST(box_id AS BIGINT) AS bid,
         CAST(x0 AS BIGINT) AS x0, CAST(y0 AS BIGINT) AS y0,
         CAST(x1 AS BIGINT) AS x1, CAST(y1 AS BIGINT) AS y1
  FROM ({dets_cte})
),
cand AS MATERIALIZED (
  SELECT a.vid, a.f, a.bid AS ba, b.bid AS bb,
         CASE WHEN least(a.x1, b.x1) - greatest(a.x0, b.x0) > 0
               AND least(a.y1, b.y1) - greatest(a.y0, b.y0) > 0
              THEN (least(a.x1, b.x1) - greatest(a.x0, b.x0))
                   * (least(a.y1, b.y1) - greatest(a.y0, b.y0))
              ELSE 0 END AS inter,
         (a.x1 - a.x0) * (a.y1 - a.y0) + (b.x1 - b.x0) * (b.y1 - b.y0)
           - CASE WHEN least(a.x1, b.x1) - greatest(a.x0, b.x0) > 0
                   AND least(a.y1, b.y1) - greatest(a.y0, b.y0) > 0
                  THEN (least(a.x1, b.x1) - greatest(a.x0, b.x0))
                       * (least(a.y1, b.y1) - greatest(a.y0, b.y0))
                  ELSE 0 END AS uni
  FROM d a JOIN d b ON b.vid = a.vid AND b.f = a.f + 1
  WHERE CASE WHEN least(a.x1, b.x1) - greatest(a.x0, b.x0) > 0
              AND least(a.y1, b.y1) - greatest(a.y0, b.y0) > 0
             THEN (least(a.x1, b.x1) - greatest(a.x0, b.x0))
                  * (least(a.y1, b.y1) - greatest(a.y0, b.y0))
             ELSE 0 END * 1000000
        >= {t_num} * ((a.x1 - a.x0) * (a.y1 - a.y0)
                      + (b.x1 - b.x0) * (b.y1 - b.y0)
                      - CASE WHEN least(a.x1, b.x1) - greatest(a.x0, b.x0) > 0
                              AND least(a.y1, b.y1) - greatest(a.y0, b.y0) > 0
                             THEN (least(a.x1, b.x1) - greatest(a.x0, b.x0))
                                  * (least(a.y1, b.y1) - greatest(a.y0, b.y0))
                             ELSE 0 END)
),
best_a AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand o
    WHERE o.vid = c.vid AND o.f = c.f AND o.ba = c.ba AND o.bb <> c.bb
      AND (o.inter * c.uni > c.inter * o.uni
           OR (o.inter * c.uni = c.inter * o.uni AND o.bb < c.bb))
  )
),
best_b AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand o
    WHERE o.vid = c.vid AND o.f = c.f AND o.bb = c.bb AND o.ba <> c.ba
      AND (o.inter * c.uni > c.inter * o.uni
           OR (o.inter * c.uni = c.inter * o.uni AND o.ba < c.ba))
  )
),
mutual AS (
  SELECT a.vid, a.ba, a.bb FROM best_a a
  JOIN best_b b ON b.vid = a.vid AND b.f = a.f
                AND b.ba = a.ba AND b.bb = a.bb
),
edges AS MATERIALIZED (
  SELECT vid * 100000 + ba AS u, vid * 100000 + bb AS v FROM mutual
  UNION ALL
  SELECT vid * 100000 + bb AS u, vid * 100000 + ba AS v FROM mutual
),
reach(u, lbl) AS (
  SELECT vid * 100000 + bid, vid * 100000 + bid FROM d
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
)
SELECT dd.vid AS video_id, dd.f AS frame, dd.bid AS box_id,
       CAST(min(r.lbl) AS BIGINT) AS track_id
FROM d dd JOIN reach r ON r.u = dd.vid * 100000 + dd.bid
GROUP BY 1, 2, 3
"""


def anchor_assign(
    gts: DataFrame,
    grid: int = 4,
    stride: int = 16,
    asize: int = 16,
    hi_micro: int = 500_000,
    lo_micro: int = 300_000,
    image_col: str = "image_id",
    gt_col: str = "gt_id",
) -> DataFrame:
    """(image_id, ax, ay, gt_id, inter, uni, label) — ANCHOR ASSIGNMENT
    for detector training (the Faster R-CNN / RetinaNet matcher): a
    fixed ``grid``x``grid`` anchor lattice (centers at (i+1/2)·stride,
    square side ``asize``) is labeled against the image's ground-truth
    boxes:

      pos    — the anchor's best-IoU GT clears ``hi`` (or the anchor
               is that GT's best anchor: the force-match rule that
               guarantees every GT at least one positive),
      neg    — best IoU below ``lo`` (or no overlap at all; gt NULL),
      ignore — in between (excluded from the loss).

    Every comparison is exact: gates are cross-multiplied integer
    inequalities, both argmaxes (per-anchor best GT, per-GT best
    anchor) are beaten-by anti-joins with (gt_id) / (ay, ax) tie
    breaks.  One row per anchor — the training-label table.

    Scale: anchors are generated by pure column algebra (explode of
    two small sequences — no data source), the candidate join is an
    equi-join on image_id with per-image GT counts bounded by the
    labeler; everything downstream is anti-joins and one union. The
    10^12-image labeling sweep is scan-shaped."""
    hi, lo = int(hi_micro), int(lo_micro)
    imgs = gts.select(image_col).distinct()
    idx = F.sequence(F.lit(0), F.lit(int(grid) - 1))
    anchors = (
        imgs.withColumn("ax", F.explode(idx))
        .withColumn("ay", F.explode(idx))
        .select(
            image_col,
            "ax",
            "ay",
            (F.col("ax") * stride + stride // 2 - asize // 2).alias("ax0"),
            (F.col("ay") * stride + stride // 2 - asize // 2).alias("ay0"),
            (F.col("ax") * stride + stride // 2 + asize // 2).alias("ax1"),
            (F.col("ay") * stride + stride // 2 + asize // 2).alias("ay1"),
        )
    )
    g = gts.select(
        image_col,
        F.col(gt_col).cast("long").alias("gt_id"),
        F.col("x0").cast("long").alias("gx0"),
        F.col("y0").cast("long").alias("gy0"),
        F.col("x1").cast("long").alias("gx1"),
        F.col("y1").cast("long").alias("gy1"),
    )
    iw = F.least("ax1", "gx1") - F.greatest("ax0", "gx0")
    ih = F.least("ay1", "gy1") - F.greatest("ay0", "gy0")
    inter = F.when((iw > 0) & (ih > 0), iw * ih).otherwise(F.lit(0))
    area_a = F.lit(int(asize) * int(asize))
    area_g = (F.col("gx1") - F.col("gx0")) * (F.col("gy1") - F.col("gy0"))
    cand = (
        anchors.join(g, image_col)
        .withColumn("inter", inter)
        .withColumn("uni", area_a + area_g - inter)
        .filter(F.col("inter") > 0)
        .select(image_col, "ax", "ay", "gt_id", "inter", "uni")
    )
    o = cand.select(
        F.col(image_col).alias("_img2"),
        F.col("ax").alias("ax2"), F.col("ay").alias("ay2"),
        F.col("gt_id").alias("gt2"),
        F.col("inter").alias("i2"), F.col("uni").alias("u2"),
    )
    frac_gt = F.col("i2") * F.col("uni")
    frac_lt = F.col("inter") * F.col("u2")
    best_gt = cand.join(  # per-anchor best GT
        o,
        (cand[image_col] == o["_img2"]) & (cand["ax"] == o["ax2"])
        & (cand["ay"] == o["ay2"]) & (cand["gt_id"] != o["gt2"])
        & ((frac_gt > frac_lt)
           | ((frac_gt == frac_lt) & (o["gt2"] < cand["gt_id"]))),
        "left_anti",
    )
    best_anchor = cand.join(  # per-GT best anchor (force-match rule)
        o,
        (cand[image_col] == o["_img2"]) & (cand["gt_id"] == o["gt2"])
        & ((cand["ax"] != o["ax2"]) | (cand["ay"] != o["ay2"]))
        & ((frac_gt > frac_lt)
           | ((frac_gt == frac_lt)
              & ((o["ay2"] < cand["ay"])
                 | ((o["ay2"] == cand["ay"]) & (o["ax2"] < cand["ax"]))))),
        "left_anti",
    ).select(image_col, "ax", "ay").distinct().withColumn(
        "forced", F.lit(True)
    )
    lab = (
        best_gt.join(best_anchor, [image_col, "ax", "ay"], "left")
        .select(
            image_col, "ax", "ay", "gt_id", "inter", "uni",
            F.when(
                (F.col("inter") * 1_000_000 >= F.lit(hi) * F.col("uni"))
                | F.col("forced").isNotNull(),
                F.lit("pos"),
            )
            .when(
                F.col("inter") * 1_000_000 < F.lit(lo) * F.col("uni"),
                F.lit("neg"),
            )
            .otherwise(F.lit("ignore"))
            .alias("label"),
        )
    )
    empty = anchors.join(
        cand.select(image_col, "ax", "ay").distinct(),
        [image_col, "ax", "ay"],
        "left_anti",
    ).select(
        image_col, "ax", "ay",
        F.lit(None).cast("long").alias("gt_id"),
        F.lit(0).cast("long").alias("inter"),
        F.lit(None).cast("long").alias("uni"),
        F.lit("neg").alias("label"),
    )
    return lab.unionByName(empty)


def anchor_assign_sql(
    gts_cte: str,
    grid: int = 4,
    stride: int = 16,
    asize: int = 16,
    hi_micro: int = 500_000,
    lo_micro: int = 300_000,
) -> str:
    """DuckDB twin of anchor_assign.  ``gts_cte`` -> (image_id, gt_id,
    x0, y0, x1, y1)."""
    hi, lo = int(hi_micro), int(lo_micro)
    half = int(stride) // 2
    ah = int(asize) // 2
    return f"""
WITH g AS MATERIALIZED (
  SELECT image_id, CAST(gt_id AS BIGINT) AS gt_id,
         CAST(x0 AS BIGINT) AS gx0, CAST(y0 AS BIGINT) AS gy0,
         CAST(x1 AS BIGINT) AS gx1, CAST(y1 AS BIGINT) AS gy1
  FROM ({gts_cte})
),
anchors AS MATERIALIZED (
  SELECT i.image_id, xs.ax, ys.ay,
         xs.ax * {stride} + {half} - {ah} AS ax0,
         ys.ay * {stride} + {half} - {ah} AS ay0,
         xs.ax * {stride} + {half} + {ah} AS ax1,
         ys.ay * {stride} + {half} + {ah} AS ay1
  FROM (SELECT DISTINCT image_id FROM g) i
  CROSS JOIN (SELECT unnest(range(0, {int(grid)})) AS ax) xs
  CROSS JOIN (SELECT unnest(range(0, {int(grid)})) AS ay) ys
),
cand AS MATERIALIZED (
  SELECT a.image_id, a.ax, a.ay, g.gt_id,
         (least(a.ax1, g.gx1) - greatest(a.ax0, g.gx0))
           * (least(a.ay1, g.gy1) - greatest(a.ay0, g.gy0)) AS inter,
         {asize * asize} + (g.gx1 - g.gx0) * (g.gy1 - g.gy0)
           - (least(a.ax1, g.gx1) - greatest(a.ax0, g.gx0))
             * (least(a.ay1, g.gy1) - greatest(a.ay0, g.gy0)) AS uni
  FROM anchors a JOIN g ON g.image_id = a.image_id
  WHERE least(a.ax1, g.gx1) - greatest(a.ax0, g.gx0) > 0
    AND least(a.ay1, g.gy1) - greatest(a.ay0, g.gy0) > 0
),
best_gt AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand o
    WHERE o.image_id = c.image_id AND o.ax = c.ax AND o.ay = c.ay
      AND o.gt_id <> c.gt_id
      AND (o.inter * c.uni > c.inter * o.uni
           OR (o.inter * c.uni = c.inter * o.uni AND o.gt_id < c.gt_id))
  )
),
forced AS (
  SELECT DISTINCT c.image_id, c.ax, c.ay FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand o
    WHERE o.image_id = c.image_id AND o.gt_id = c.gt_id
      AND (o.ax <> c.ax OR o.ay <> c.ay)
      AND (o.inter * c.uni > c.inter * o.uni
           OR (o.inter * c.uni = c.inter * o.uni
               AND (o.ay < c.ay OR (o.ay = c.ay AND o.ax < c.ax))))
  )
),
lab AS (
  SELECT b.image_id, b.ax, b.ay, b.gt_id, b.inter, b.uni,
         CASE WHEN b.inter * 1000000 >= {hi} * b.uni
                   OR f.ax IS NOT NULL THEN 'pos'
              WHEN b.inter * 1000000 < {lo} * b.uni THEN 'neg'
              ELSE 'ignore' END AS label
  FROM best_gt b
  LEFT JOIN forced f
    ON f.image_id = b.image_id AND f.ax = b.ax AND f.ay = b.ay
)
SELECT image_id, CAST(ax AS INTEGER) AS ax, CAST(ay AS INTEGER) AS ay,
       gt_id, inter, uni, label
FROM lab
UNION ALL
SELECT a.image_id, CAST(a.ax AS INTEGER), CAST(a.ay AS INTEGER),
       NULL, 0, NULL, 'neg'
FROM anchors a
WHERE NOT EXISTS (
  SELECT 1 FROM cand c
  WHERE c.image_id = a.image_id AND c.ax = a.ax AND c.ay = a.ay
)
"""
