"""spark-submit entry script — the cluster launch shape of the CLI driver
(reference parity: /root/reference/osm2geojson/__main__.py, run distributed):

    python tools/build_pyfiles.py osm2geojson_spark.zip
    spark-submit --master <cluster> --py-files osm2geojson_spark.zip \
        tools/submit_cli.py input.osm output.geojson [cli flags]

The package itself arrives ONLY via ``--py-files`` (spark-submit puts the
zip on the driver's sys.path and ships it to executors), so this script has
no repo-relative imports — it must work from any directory.
"""

import sys

from osm2geojson_spark import cli

if __name__ == "__main__":
    sys.exit(cli.main(sys.argv[1:]))
