"""Distributed GeoJSON-lines sink (plans/pipeline.write_geojson_lines):
S10's scale path. The reference serializes driver-side in one json.dump
(main.py:118-133); the engine serializes executor-side through a
vectorized pandas UDF and df.write.text — these tests pin that both
sinks produce the identical feature stream."""

from __future__ import annotations

import json
import os

import pytest

from osm2geojson_spark.plans.pipeline import (
    build_features,
    collect_features_by_doc,
    feature_json_lines,
    read_geojson_lines,
    write_geojson_lines,
)
from osm2geojson_spark.sources import xml_source
from osm2geojson_spark.sources.normalize import normalize_documents

DATA = os.path.join(os.path.dirname(__file__), "data")


def _corpus_features(spark):
    docs = {}
    for name in ("way", "map", "relation", "issue-4", "multipolygon"):
        path = os.path.join(DATA, f"{name}.osm")
        if not os.path.exists(path):
            continue
        docs[name] = xml_source.parse(open(path, encoding="utf-8").read())[
            "elements"
        ]
    assert len(docs) >= 3
    frames = normalize_documents(spark, docs)
    features, _ = build_features(spark, frames)
    return features


def test_write_geojson_lines_matches_driver_sink(spark, tmp_path):
    """Multi-document corpus written DISTRIBUTED == the driver-side
    collect_features_by_doc, byte-for-byte per feature (the JSON strings
    come from the same UDF; the file replay must preserve doc grouping
    and input order)."""
    features = _corpus_features(spark).persist()
    want = collect_features_by_doc(features)
    out = str(tmp_path / "sink")
    write_geojson_lines(features, out)
    got = read_geojson_lines(spark, out)
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == want[doc_id], doc_id
    # byte-level: each line is the compact dump of the corresponding dict
    for doc_dir in sorted(os.listdir(out)):
        if not doc_dir.startswith("doc_id="):
            continue
        doc_id = doc_dir.split("=", 1)[1]
        lines = []
        for part in sorted(os.listdir(os.path.join(out, doc_dir))):
            if part.startswith("part-"):
                lines += [
                    ln
                    for ln in open(
                        os.path.join(out, doc_dir, part), encoding="utf-8"
                    ).read().splitlines()
                    if ln
                ]
        assert lines == [
            json.dumps(f, separators=(",", ":")) for f in want[doc_id]
        ], doc_id
    features.unpersist()


def test_write_geojson_lines_many_files_preserves_order(spark, tmp_path):
    """num_files > number of docs: features of one doc span multiple part
    files; filename-order replay must still reconstruct input order."""
    features = _corpus_features(spark).persist()
    want = collect_features_by_doc(features)
    out = str(tmp_path / "sharded")
    write_geojson_lines(features, out, num_files=8)
    got = read_geojson_lines(spark, out)
    for doc_id in want:
        assert got[doc_id] == want[doc_id], doc_id
    features.unpersist()


def test_write_geojson_lines_mode_error_and_overwrite(spark, tmp_path):
    features = _corpus_features(spark).persist()
    out = str(tmp_path / "once")
    write_geojson_lines(features, out)
    with pytest.raises(Exception):
        write_geojson_lines(features, out)  # mode="error" default
    write_geojson_lines(features, out, mode="overwrite")
    assert read_geojson_lines(spark, out)
    features.unpersist()


def test_feature_json_lines_schema(spark):
    df = feature_json_lines(_corpus_features(spark))
    assert [f.name for f in df.schema.fields] == ["doc_id", "seq", "line"]
    row = df.limit(1).collect()[0]
    feat = json.loads(row["line"])
    assert feat["type"] == "Feature" and "geometry" in feat and "properties" in feat
