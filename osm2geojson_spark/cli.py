"""spark-submit job driver — the engine's CLI (reference parity:
/root/reference/osm2geojson/__main__.py:11-135).

    spark-submit --py-files osm2geojson_spark.zip -m osm2geojson_spark.cli \\
        infile outfile [--no-unused-filter] [--areas areas.json]
        [--polygons polygons.json] [-i INDENT] [-f] [-v|-q]
        [--master local[32]] [--shuffle-partitions N]

Reader auto-detected by extension (.osm/.xml -> XML, .json/.geojson ->
Overpass JSON), overwrite guard, rulebook overrides, exit code 1 on failure —
same observable contract as the reference CLI, driven by a SparkSession.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def setup_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="osm2geojson-spark", description=__doc__)
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("--no-unused-filter", action="store_true", dest="no_unused_filter")
    p.add_argument("--areas", help="areaKeys.json override")
    p.add_argument("--polygons", help="polygon-features.json override")
    p.add_argument("-i", "--indent", type=int, default=None)
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--master", default=None, help="Spark master (default: existing session / local[*])")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = setup_parser().parse_args(argv)

    ext = os.path.splitext(args.infile)[1].lower()
    if ext in (".osm", ".xml"):
        mode = "xml"
    elif ext in (".json", ".geojson"):
        mode = "json"
    else:
        print(f"Cannot detect input format from extension: {args.infile}", file=sys.stderr)
        return 1

    if os.path.exists(args.outfile) and not args.force:
        print(f"Output file exists (use -f to overwrite): {args.outfile}", file=sys.stderr)
        return 1

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else (logging.ERROR if args.quiet else logging.WARNING)
    )

    area_keys = None
    polygon_features = None
    try:
        if args.areas:
            with open(args.areas) as f:
                loaded = json.load(f)
            area_keys = loaded.get("areaKeys", loaded) if isinstance(loaded, dict) else loaded
        if args.polygons:
            with open(args.polygons) as f:
                polygon_features = json.load(f)
    except Exception as ex:
        print(f"Failed to load rulebook override: {ex}", file=sys.stderr)
        return 1

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("osm2geojson-spark-cli")
    if args.master:
        builder = builder.master(args.master)
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.config("spark.sql.execution.arrow.pyspark.enabled", "true").getOrCreate()

    import osm2geojson_spark as o2g

    # an outfile ending in .jsonl/.ndjson (or a trailing /) selects the
    # DISTRIBUTED GeoJSON-lines sink: features stream executor-side through
    # write_geojson_lines — no driver collect, the planet-extract path
    distributed = args.outfile != "-" and (
        args.outfile.endswith((".jsonl", ".ndjson")) or args.outfile.endswith(os.sep)
    )
    try:
        with open(args.infile, encoding="utf-8") as f:
            data = f.read()
        if distributed:
            from .plans.pipeline import write_geojson_lines
            from .sources.normalize import normalize_elements
            from .sources import xml_source as XS

            parsed = XS.parse(data) if mode == "xml" else json.loads(data)
            frames = normalize_elements(spark, parsed["elements"])
            features, _ = o2g.build_features(
                spark, frames, filter_used_refs=not args.no_unused_filter,
                area_keys=area_keys, polygon_features=polygon_features,
            )
            write_geojson_lines(
                features, args.outfile,
                mode="overwrite" if args.force else "error",
            )
            return 0
        fn = o2g.xml2geojson if mode == "xml" else o2g.json2geojson
        result = fn(spark, data, filter_used_refs=not args.no_unused_filter,
                    area_keys=area_keys, polygon_features=polygon_features)
        out = json.dumps(result, indent=args.indent)
    except Exception as ex:
        print(f"Conversion failed: {ex}", file=sys.stderr)
        return 1

    if args.outfile == "-":
        print(out)
    else:
        with open(args.outfile, "w", encoding="utf-8") as f:
            f.write(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
