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
import os
from functools import lru_cache

_HERE = os.path.dirname(__file__)


@lru_cache(maxsize=1)
def default_polygon_features() -> list[dict]:
    with open(os.path.join(_HERE, "polygon-features.json")) as f:
        return json.load(f)


@lru_cache(maxsize=1)
def default_area_keys() -> dict:
    with open(os.path.join(_HERE, "areaKeys.json")) as f:
        return json.load(f)["areaKeys"]
