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
