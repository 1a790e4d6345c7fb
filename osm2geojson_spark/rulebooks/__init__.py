"""Tag rulebooks driving polygon/line classification.

``polygon-features.json`` (28 rules) and ``areaKeys.json`` (40 keys) are MIT
data files shipped with the reference (/root/reference/osm2geojson/
polygon-features.json, areaKeys.json — themselves derived from the public
tyrasd/osm-polygon-features and ideditor/id-area-keys datasets). They are
configuration data, not code; the engine broadcasts them as literals.

Injection points mirror the reference API (main.py:60-115 ``area_keys=`` /
``polygon_features=`` parameters).
"""

from __future__ import annotations

import json
from functools import lru_cache
from importlib import resources


def _load(name: str):
    # resources (not open(__file__-relative)): the package must also load
    # from inside a spark-submit --py-files zip (zipimport has no real paths)
    return json.loads(resources.files(__package__).joinpath(name).read_text())


@lru_cache(maxsize=1)
def default_polygon_features() -> list[dict]:
    return _load("polygon-features.json")


@lru_cache(maxsize=1)
def default_area_keys() -> dict:
    return _load("areaKeys.json")["areaKeys"]
