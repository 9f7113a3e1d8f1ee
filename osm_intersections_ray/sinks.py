"""Sinks: canonical partitioned-Parquet output (state/checkpoint.py) plus a
GeoJSON exporter matching the reference's FeatureCollection shape
(makePointFeature/makeFeatureSet, js/geo.js:150-169,1246-1266 — S5) for
conformance diffing against the committed reference outputs."""

from __future__ import annotations

import json


def rows_to_geojson(rows: list[dict]) -> dict:
    """Engine output rows -> the reference's GeoJSON FeatureCollection:
    properties = {streets, nodeId, wayIds, cityName}; coordinates [lon, lat];
    the 'Geom' sentinel restored for geometric-only rows."""
    feats = []
    for r in rows:
        node_id = "Geom" if r["node_id_kind"] == "geom" else int(r["node_id"])
        feats.append({
            "type": "Feature",
            "geometry": {"type": "Point",
                         "coordinates": [r["lon"], r["lat"]]},
            "properties": {"streets": list(r["streets"]), "nodeId": node_id,
                           "wayIds": [int(w) for w in r["way_ids"]],
                           "cityName": r["city"]},
        })
    return {"type": "FeatureCollection", "features": feats}


# write_geojson is the conformance-diff exporter (the reference's own output
# shape) and deliberately materializes driver-side; the cap makes it
# impossible to point at a full-scale dataset by accident — large results
# belong in the partitioned Parquet sink (state/checkpoint.write_partitioned).
MAX_GEOJSON_ROWS = 1_000_000


def write_geojson(ds_or_rows, path: str, max_rows: int = MAX_GEOJSON_ROWS) -> int:
    if isinstance(ds_or_rows, list):
        rows = ds_or_rows
        if len(rows) > max_rows:
            raise ValueError(
                f"write_geojson: {len(rows)} rows exceeds max_rows={max_rows}; "
                "use state.checkpoint.write_partitioned for large outputs")
    else:
        # take_all's own limit raises before the driver materializes more
        # than max_rows — the guard costs nothing on the conformance path
        rows = ds_or_rows.take_all(limit=max_rows)
    gj = rows_to_geojson(rows)
    with open(path, "w") as f:
        json.dump(gj, f, indent=1)
    return len(gj["features"])
