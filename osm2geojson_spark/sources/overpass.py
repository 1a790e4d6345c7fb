"""Overpass HTTP source — named NOT-IMPLEMENTED surface.

The reference ships ``overpass_call(query) -> str`` (helpers.py:63-84, with
a 5-attempt HTTPError retry decorator at helpers.py:33-60). This sandbox has
no network access, so the engine cannot implement or test it; a user porting
from the reference should hit a clear error here — not silence — and use the
offline entry points instead (``xml2geojson`` / ``json2geojson`` on fetched
documents, or ``sources.synthetic`` for generated corpora).

A production deployment would implement this as a driver-side fetch (the
query result is one document, not distributed data) with the same retry
loop, then hand the JSON text to ``json2geojson`` — no Spark-side changes
are needed.
"""

from __future__ import annotations

OVERPASS_URL = "https://overpass-api.de/api/interpreter"


def overpass_call(query: str) -> str:
    """Reference-parity signature (helpers.py:63). Always raises here.

    Raises:
        NotImplementedError: this environment has no network access.
    """
    raise NotImplementedError(
        "overpass_call requires network access, which this environment does "
        "not have. Fetch the Overpass response out-of-band and pass its text "
        "to json2geojson(spark, text), or use sources.synthetic for "
        "generated corpora."
    )
