"""End-to-end conversion plan: elements -> GeoJSON features.

Query lifecycle (SURVEY §3): normalize -> resolve ways (join) -> assemble
relations (grouped Arrow kernels) -> used-refs anti join -> ordered feature
emission. This is the Spark re-expression of the reference's
``_json2shapes``/``_json2geojson`` (/root/reference/osm2geojson/main.py:118-180).

Used-ref marking is a *projection of consumption edges* instead of the
reference's in-place ``ref["used"] = id`` mutation (main.py:293,318-320,529,609):

* nodes  — refs resolved by any top-level way's node-chain walk, up to the
  first missing ref (partial marking on failure is reproduced);
* ways   — deref'd members of multipolygon-classified relations (marked even
  when the way later fails to convert);
* rels   — relation-type members of multiline-path relations.

The dedup filter itself is a left **anti join on id only** (not (type, id)) —
faithfully reproducing the reference's cross-type-collision behavior.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geom
from ..functions.classify import polygon_flag_column
from ..operators.assemble import (
    point_gpb_udf,
    resolve_ways,
    assemble_relations,
)
from ..sources.normalize import ElementFrames, normalize_documents, normalize_elements
from ..sources import xml_source


class ConversionError(RuntimeError):
    """strict-mode (raise_on_failure) conversion failure."""


def _props_json(df: DataFrame, etype: str, include_nodes: bool) -> F.Column:
    """GeoJSON properties as a JSON column — fixed-key projection with
    null dropping (main.py:236-238 get_element_props)."""
    fields = [
        F.lit(etype).alias("type"),
        F.col("id").alias("id"),
        F.map_from_entries("tags").alias("tags"),
    ]
    if include_nodes:
        fields.append(F.col("nodes").alias("nodes"))
    fields += [
        F.col("timestamp").alias("timestamp"),
        F.col("user").alias("user"),
        F.col("uid").alias("uid"),
        F.col("version").alias("version"),
    ]
    return F.to_json(F.struct(*fields))


def build_features(
    spark: SparkSession,
    frames: ElementFrames,
    *,
    filter_used_refs: bool = True,
    area_keys: dict | None = None,
    polygon_features: list | None = None,
    materialize: str | None = "localCheckpoint",
) -> tuple[DataFrame, DataFrame]:
    """Returns (features_df, failures_df).

    features_df: seq, etype, id, gpb, props — one row per converted element.
    failures_df: seq, etype, id, reason — unconverted elements (reference
    logs "Element not converted"; strict mode raises on the first).

    ``materialize``: "localCheckpoint" (default — cuts plan lineage, right
    for document-sized conversions), "cache" (scale path: keeps lineage for
    the optimizer, avoids recompute across the three consumers), or None.
    """
    ways = resolve_ways(frames, area_keys, polygon_features)
    # coords_arr duplicates the packed binary `coords` — don't materialize it
    ways = ways.drop("coords_arr")
    if materialize == "localCheckpoint":
        ways = ways.localCheckpoint(eager=False)
    elif materialize == "cache":
        ways = ways.cache()
    rels_flagged = frames.relations.withColumn(
        "is_poly",
        polygon_flag_column(
            F.col("tags"), F.lit(None).cast("boolean"), area_keys, polygon_features
        ),
    )
    if materialize == "localCheckpoint":
        rels_flagged = rels_flagged.localCheckpoint(eager=False)
    rel_shapes = assemble_relations(frames, ways, rels_flagged)

    # the used-refs anti-join distributes over the feature union — applying
    # it per branch lets the node branch (the largest element class) filter
    # BEFORE constructing gpb/props, so dropped nodes never build payloads
    # and the join shuffles slim source rows. The right side stays the FULL
    # used set per branch, preserving the reference's id-only cross-type
    # matching quirk exactly.
    # localCheckpoint: three branch joins consume the used set — materialize
    # its subtree once (slim (doc, id) rows; released with the plan)
    used = (
        used_ref_ids(frames, ways, rels_flagged).localCheckpoint(eager=False)
        if filter_used_refs
        else None
    )

    def _drop_used(df: DataFrame) -> DataFrame:
        if used is None:
            return df
        return df.join(
            used,
            (df["id"] == used["used_id"]) & (df["doc_id"] == used["used_doc"]),
            "left_anti",
        )

    nodes_kept = _drop_used(frames.nodes)
    node_feats = nodes_kept.select(
        "doc_id",
        "seq",
        F.lit("node").alias("etype"),
        "id",
        point_gpb_udf(F.col("lon"), F.col("lat")).alias("gpb"),
        _props_json(nodes_kept, "node", include_nodes=False).alias("props"),
    )

    way_feats = ways.select(
        "doc_id",
        "seq",
        F.lit("way").alias("etype"),
        "id",
        "gpb",
        _props_json(ways, "way", include_nodes=True).alias("props"),
        "reason",
    )

    rel_base = frames.relations
    rel_feats = (
        rel_base.join(
            rel_shapes.withColumnRenamed("rel_id", "id"), ["doc_id", "id"], "left"
        )
        .withColumn(
            "gpb",
            F.when(
                F.col("center").isNotNull(),
                point_gpb_udf(F.col("center.lon"), F.col("center.lat")),
            ).otherwise(F.col("gpb")),
        )
        .withColumn(
            "reason",
            F.when(F.col("center").isNotNull(), F.lit(None).cast("string")).otherwise(
                F.col("reason")
            ),
        )
        .select(
            "doc_id",
            "seq",
            F.lit("relation").alias("etype"),
            "id",
            "gpb",
            _props_json(rel_base, "relation", include_nodes=False).alias("props"),
            "reason",
        )
    )

    other_failures = frames.others.select(
        "doc_id",
        "seq",
        F.col("type").alias("etype"),
        "id",
        F.lit("unsupported_type").alias("reason"),
    )
    failures = (
        way_feats.filter(F.col("gpb").isNull())
        .select("doc_id", "seq", "etype", "id", "reason")
        .unionByName(
            rel_feats.filter(F.col("gpb").isNull()).select(
                "doc_id", "seq", "etype", "id", "reason"
            )
        )
        .unionByName(other_failures)
    )

    features = (
        node_feats.unionByName(
            _drop_used(way_feats.filter(F.col("gpb").isNotNull()).drop("reason"))
        )
        .unionByName(
            _drop_used(rel_feats.filter(F.col("gpb").isNotNull()).drop("reason"))
        )
    )

    return features, failures


def used_ref_ids(
    frames: ElementFrames,
    ways_resolved: DataFrame,
    rels_flagged: DataFrame,
) -> DataFrame:
    """DataFrame with one column ``used_id`` — the consumption-edge
    projection replacing the reference's side-effecting used marks."""
    used_nodes = ways_resolved.select(
        F.col("doc_id").alias("used_doc"),
        F.explode(F.coalesce("used_node_refs", F.array())).alias("used_id"),
    )

    rels = rels_flagged.filter(F.col("center").isNull())
    mem = rels.select("doc_id", "id", "is_poly", F.explode("members").alias("m"))

    way_ids = frames.ways.select("doc_id", F.col("id").alias("ref"))
    # multipolygon way members without inline geometry mark the deref'd way
    used_ways = (
        mem.filter(
            F.col("is_poly")
            & (F.col("m.mtype") == "way")
            & (F.col("m.geometry").isNull() | (F.size("m.geometry") == 0))
        )
        .select("doc_id", F.col("m.ref").alias("ref"))
        .join(way_ids, ["doc_id", "ref"], "leftsemi")
        .select(F.col("doc_id").alias("used_doc"), F.col("ref").alias("used_id"))
    )

    rel_ids = frames.relations.select("doc_id", F.col("id").alias("ref"))
    # multiline relation-type members mark the deref'd relation
    used_rels = (
        mem.filter((~F.col("is_poly")) & (F.col("m.mtype") == "relation"))
        .select("doc_id", F.col("m.ref").alias("ref"))
        .join(rel_ids, ["doc_id", "ref"], "leftsemi")
        .select(F.col("doc_id").alias("used_doc"), F.col("ref").alias("used_id"))
    )

    # NO distinct: the only consumer is a left-anti join, where duplicate
    # keys on the build side are semantically free — a distinct here is a
    # full extra shuffle of the largest intermediate in the pipeline
    return used_nodes.unionByName(used_ways).unionByName(used_rels)


def feature_json_lines(features: DataFrame) -> DataFrame:
    """(doc_id, seq, line): one complete GeoJSON Feature as a compact JSON
    string per row — the distributed serialization the reference performs
    driver-side in one json.dump (main.py:118-133, __main__.py:115-135).

    The serializer is an Arrow-batched pandas UDF (GPB geometry decode +
    props passthrough are per-row ragged work, so this is the sanctioned
    Python path); everything around it stays a DataFrame, so the sink
    scales with executors instead of driver memory."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _fjson(gpb, props):
        import pandas as pd

        out = [None] * len(gpb)
        for i, (g, p) in enumerate(zip(gpb, props)):
            out[i] = json.dumps(
                {
                    "type": "Feature",
                    "properties": json.loads(p),
                    "geometry": geom.to_geojson_geometry(g),
                },
                separators=(",", ":"),
            )
        return pd.Series(out)

    return features.select(
        "doc_id", "seq", _fjson(F.col("gpb"), F.col("props")).alias("line")
    )


def write_geojson_lines(
    features: DataFrame,
    path: str,
    num_files: int | None = None,
    mode: str = "error",
) -> None:
    """Distributed GeoJSON-lines sink (SURVEY §1.2's S10 scale mapping:
    vectorized feature→JSON pandas UDF + ``df.write.text``): one Feature
    per line, directory-partitioned by ``doc_id``, and — because the rows
    are range-repartitioned on (doc_id, seq) and sorted within partitions —
    reading each doc directory's part files in FILENAME order replays the
    exact input-order feature sequence the driver-side sink produces.
    ``num_files`` bounds output file count (defaults to Spark's chosen
    range partitioning); a planet-scale conversion writes through here
    with no driver collect."""
    lines = feature_json_lines(features)
    if num_files:
        lines = lines.repartitionByRange(num_files, "doc_id", "seq")
    else:
        lines = lines.repartitionByRange("doc_id", "seq")
    (
        lines.sortWithinPartitions("doc_id", "seq")
        .select("doc_id", "line")
        .write.mode(mode)
        .partitionBy("doc_id")
        .text(path)
    )


def read_geojson_lines(spark: SparkSession, path: str) -> dict[str, list[dict]]:
    """Driver-side reader for ``write_geojson_lines`` output (tests /
    small corpora): {doc_id: [feature, ...]} with per-doc part files
    replayed in filename order."""
    import glob
    import os

    out: dict[str, list[dict]] = {}
    for doc_dir in sorted(glob.glob(os.path.join(path, "doc_id=*"))):
        doc_id = os.path.basename(doc_dir).split("=", 1)[1]
        feats: list[dict] = []
        for part in sorted(glob.glob(os.path.join(doc_dir, "part-*"))):
            with open(part, encoding="utf-8") as fh:
                for ln in fh:
                    ln = ln.strip()
                    if ln:
                        feats.append(json.loads(ln))
        out[doc_id] = feats
    return out


def collect_features_by_doc(features: DataFrame) -> dict[str, list[dict]]:
    """Driver-side materialization, grouped per document, each in input
    order — the golden-test sink. It delegates serialization to the SAME
    vectorized ``feature_json_lines`` UDF the distributed sink writes
    through, so every golden fixture also pins the scale path's bytes."""
    rows = feature_json_lines(features).collect()
    rows.sort(key=lambda r: (r["doc_id"], r["seq"]))
    out: dict[str, list[dict]] = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(json.loads(r["line"]))
    return out


def collect_features(features: DataFrame) -> list[dict]:
    by_doc = collect_features_by_doc(features)
    if not by_doc:
        return []
    (only,) = by_doc.values()
    return only


def strict_violations(
    frames: ElementFrames,
    ways_resolved: DataFrame,
    rels_flagged: DataFrame,
) -> DataFrame:
    """Member-level failures that raise in strict mode even when the parent
    relation still converts (main.py:540-549, 604-620): unhandled member
    types and missing/unconvertible members. Returns (seq, id, reason)."""
    rels = rels_flagged.filter(F.col("center").isNull())
    mem = rels.select("doc_id", "seq", "id", "is_poly", F.explode("members").alias("m"))
    way_ok = ways_resolved.select(
        F.col("doc_id").alias("wdoc"),
        F.col("id").alias("wref"),
        (F.col("gpb").isNotNull() & (F.col("branch") != "center")).alias("w_ok"),
    )
    rel_ids = frames.relations.select(
        F.col("doc_id").alias("rdoc"), F.col("id").alias("rref"), F.lit(True).alias("r_found")
    )
    m = (
        mem.join(
            way_ok,
            (mem["m.ref"] == way_ok["wref"]) & (mem["doc_id"] == way_ok["wdoc"]),
            "left",
        )
        .join(
            rel_ids,
            (mem["m.ref"] == rel_ids["rref"]) & (mem["doc_id"] == rel_ids["rdoc"]),
            "left",
        )
        .withColumn(
            "inline", F.col("m.geometry").isNotNull() & (F.size("m.geometry") > 0)
        )
    )
    is_way = F.col("m.mtype") == "way"
    is_rel = F.col("m.mtype") == "relation"
    way_missing = is_way & ~F.col("inline") & ~F.coalesce(F.col("w_ok"), F.lit(False))
    unhandled = F.when(
        F.col("is_poly"), ~is_way  # multipolygon: non-way members raise
    ).otherwise(~is_way & ~is_rel)  # multiline: node members raise
    rel_missing = (~F.col("is_poly")) & is_rel & F.col("r_found").isNull()
    reason = (
        F.when(unhandled, "unhandled_member")
        .when(way_missing, "missing_member")
        .when(rel_missing, "missing_member")
    )
    return m.select("doc_id", "seq", "id", reason.alias("reason")).filter(
        F.col("reason").isNotNull()
    )


def convert_elements(
    spark: SparkSession,
    elements: list[dict],
    *,
    filter_used_refs: bool = True,
    area_keys: dict | None = None,
    polygon_features: list | None = None,
    raise_on_failure: bool = False,
) -> list[dict]:
    """elements -> GeoJSON feature dicts (input order)."""
    frames = normalize_elements(spark, elements)
    features, failures = build_features(
        spark,
        frames,
        filter_used_refs=filter_used_refs,
        area_keys=area_keys,
        polygon_features=polygon_features,
    )
    if raise_on_failure:
        ways = resolve_ways(frames, area_keys, polygon_features)
        rels_flagged = frames.relations.withColumn(
            "is_poly",
            polygon_flag_column(
                F.col("tags"), F.lit(None).cast("boolean"), area_keys, polygon_features
            ),
        )
        viol = strict_violations(frames, ways, rels_flagged).select("seq", "id", "reason")
        bad = (
            failures.filter(F.col("reason") != "unsupported_type")
            .select("seq", "id", "reason")
            .unionByName(viol)
            .orderBy("seq")
            .limit(1)
            .collect()
        )
        if bad:
            b = bad[0]
            raise ConversionError(f"Failed to convert element {b['id']}: {b['reason']}")
    return collect_features(features)


def convert_documents(
    spark: SparkSession,
    docs: dict[str, list[dict]],
    *,
    filter_used_refs: bool = True,
    area_keys: dict | None = None,
    polygon_features: list | None = None,
) -> dict[str, list[dict]]:
    """Batch conversion: many documents in ONE Spark job (document-parallel
    — all joins/groupBys are keyed by (doc_id, element id)). Returns
    {doc_id: [feature, ...]}; documents yielding no features map to []."""
    frames = normalize_documents(spark, docs)
    features, _ = build_features(
        spark,
        frames,
        filter_used_refs=filter_used_refs,
        area_keys=area_keys,
        polygon_features=polygon_features,
    )
    out = {doc_id: [] for doc_id in docs}
    out.update(collect_features_by_doc(features))
    return out


def json2geojson(spark, data, **kw) -> dict:
    if isinstance(data, str):
        data = json.loads(data)
    return {
        "type": "FeatureCollection",
        "features": convert_elements(spark, data["elements"], **kw),
    }


def xml2geojson(spark, xml_str: str, **kw) -> dict:
    data = xml_source.parse(xml_str)
    return {
        "type": "FeatureCollection",
        "features": convert_elements(spark, data["elements"], **kw),
    }
