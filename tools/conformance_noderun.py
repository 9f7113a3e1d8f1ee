"""Conformance check: run the REFERENCE's own JS pipeline on the synthetic
fixture and diff its GeoJSON output against this repo's oracle/engine rows.

The reference code is staged into /tmp at runtime (never committed here) with:
* a minimal @turf/turf shim (lineIntersect / booleanPointInPolygon / point /
  feature / lineString) matching turf's observable semantics for
  general-position inputs;
* Set.prototype.intersection/union polyfills (reference needs Node >= 22,
  this container has Node 20).

Usage:  python tools/conformance_noderun.py [sf_dir]
Writes a pass/fail diff summary to stdout and tools/CONFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

REF = "/root/reference"
STAGE = "/tmp/refrun"

TURF_SHIM = r"""
// Minimal @turf/turf shim for geo.js (general-position inputs only).
if (!Set.prototype.intersection) {
  Set.prototype.intersection = function (other) {
    const out = new Set();
    const [small, big] = this.size <= other.size ? [this, other] : [other, this];
    for (const v of small) if (big.has(v)) out.add(v);
    return out;
  };
}
if (!Set.prototype.union) {
  Set.prototype.union = function (other) {
    const out = new Set(this);
    for (const v of other) out.add(v);
    return out;
  };
}

export function point(coords) {
  return { type: "Feature", geometry: { type: "Point", coordinates: coords } };
}
export function feature(geometry) {
  return { type: "Feature", geometry };
}
export function lineString(coords) {
  return { type: "Feature", geometry: { type: "LineString", coordinates: coords } };
}

function segInt(x1, y1, x2, y2, x3, y3, x4, y4) {
  const denom = (y4 - y3) * (x2 - x1) - (x4 - x3) * (y2 - y1);
  if (denom === 0) return null;
  const ua = ((x4 - x3) * (y1 - y3) - (y4 - y3) * (x1 - x3)) / denom;
  const ub = ((x2 - x1) * (y1 - y3) - (y2 - y1) * (x1 - x3)) / denom;
  if (ua >= 0 && ua <= 1 && ub >= 0 && ub <= 1)
    return [x1 + ua * (x2 - x1), y1 + ua * (y2 - y1)];
  return null;
}

export function lineIntersect(f1, f2) {
  const c1 = f1.geometry.coordinates;
  const c2 = f2.geometry.coordinates;
  const feats = [];
  for (let i = 0; i < c1.length - 1; i++)
    for (let j = 0; j < c2.length - 1; j++) {
      const hit = segInt(c1[i][0], c1[i][1], c1[i + 1][0], c1[i + 1][1],
                         c2[j][0], c2[j][1], c2[j + 1][0], c2[j + 1][1]);
      if (hit) feats.push(point(hit));
    }
  return { type: "FeatureCollection", features: feats };
}

function inRing(lon, lat, ring) {
  let inside = false;
  for (let i = 0, j = ring.length - 1; i < ring.length; j = i++) {
    const xi = ring[i][0], yi = ring[i][1];
    const xj = ring[j][0], yj = ring[j][1];
    if (Math.min(xi, xj) <= lon && lon <= Math.max(xi, xj) &&
        Math.min(yi, yj) <= lat && lat <= Math.max(yi, yj)) {
      if ((xj - xi) * (lat - yi) - (yj - yi) * (lon - xi) === 0) return true;
    }
    if ((yi > lat) !== (yj > lat)) {
      const xAt = (xj - xi) * (lat - yi) / (yj - yi) + xi;
      if (lon < xAt) inside = !inside;
      else if (lon === xAt) return true;
    }
  }
  return inside;
}

export function booleanPointInPolygon(pt, polyFeature) {
  const [lon, lat] = pt.geometry.coordinates;
  const g = polyFeature.geometry;
  const polys = g.type === "Polygon" ? [g.coordinates] : g.coordinates;
  for (const rings of polys) {
    if (inRing(lon, lat, rings[0])) {
      let inHole = false;
      for (let h = 1; h < rings.length; h++)
        if (inRing(lon, lat, rings[h])) inHole = true;
      if (!inHole) return true;
    }
  }
  return false;
}
"""


def stage_reference():
    shutil.rmtree(STAGE, ignore_errors=True)
    os.makedirs(os.path.join(STAGE, "js"))
    os.makedirs(os.path.join(STAGE, "data"))
    os.makedirs(os.path.join(STAGE, "input"))
    os.makedirs(os.path.join(STAGE, "output"))
    for f in ("geo.js", "geoturf.js", "gpsBins.js"):
        shutil.copy(os.path.join(REF, "js", f), os.path.join(STAGE, "js", f))
    turf_dir = os.path.join(STAGE, "node_modules", "@turf", "turf")
    os.makedirs(turf_dir)
    with open(os.path.join(turf_dir, "index.js"), "w") as f:
        f.write(TURF_SHIM)
    with open(os.path.join(turf_dir, "package.json"), "w") as f:
        json.dump({"name": "@turf/turf", "version": "0.0.0-shim",
                   "type": "module", "main": "index.js"}, f)
    with open(os.path.join(STAGE, "package.json"), "w") as f:
        json.dump({"type": "module"}, f)


def fixture_to_inputs(fx: str, county: str):
    ways = pq.read_table(os.path.join(fx, "ways.parquet")).to_pylist()
    elements = []
    for w in ways:
        if w["county"] != county:
            continue
        if not w["tagged"]:
            # the reference CRASHES on tag-less ways (js/geo.js:450 reads
            # tags.highway unguarded in the link pass), so its behavior is
            # only defined on tag-complete inputs; untagged ways contribute
            # nothing to the oracle/engine output, so excluding them here is
            # semantics-preserving for the comparison.
            continue
        el = {
            "type": "way",
            "id": w["way_id"],
            "bounds": {"minlat": w["minlat"], "minlon": w["minlon"],
                       "maxlat": w["maxlat"], "maxlon": w["maxlon"]},
            "nodes": w["nodes"],
            "geometry": [{"lat": la, "lon": lo}
                         for la, lo in zip(w["lats"], w["lons"])],
        }
        if w["tagged"]:
            tags = {}
            for k in ("name", "ref", "highway", "bridge", "junction"):
                if w[k] is not None:
                    tags[k] = w[k]
            el["tags"] = tags
        elements.append(el)
    fname = f"ways_{county.replace(' ', '_')}.json"
    with open(os.path.join(STAGE, "input", fname), "w") as f:
        json.dump({"elements": elements}, f)

    cc = pq.read_table(os.path.join(fx, "county_cities.parquet")).to_pylist()
    with open(os.path.join(STAGE, "data", "county_cities.json"), "w") as f:
        json.dump([{"countyName": r["county"], "cityNames": list(r["cities"]),
                    "countCode": r["county_code"]} for r in cc], f)

    bd = pq.read_table(os.path.join(fx, "boundaries.parquet")).to_pylist()
    feats = []
    for r in sorted(bd, key=lambda r: r["file_order"]):
        coords = json.loads(r["geom_json"])
        feats.append({"type": "Feature", "properties": {"name": r["name"]},
                      "geometry": {"type": "Polygon", "coordinates": coords}})
    with open(os.path.join(STAGE, "data",
                           "CaliforniaCountiesAndCitiesMini.geojson"), "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return fname


def run_reference(fname: str) -> list[dict]:
    out = os.path.join(STAGE, "output", "out.json")
    subprocess.run(["node", "js/geo.js", f"input/{fname}", out],
                   cwd=STAGE, check=True, capture_output=True, text=True)
    gj = json.load(open(out))
    rows = []
    for feat in gj["features"]:
        p = feat["properties"]
        lon, lat = feat["geometry"]["coordinates"]
        nid = p["nodeId"]
        rows.append({
            "lat": lat, "lon": lon, "streets": p["streets"],
            "node_id": None if nid == "Geom" else int(nid),
            "node_id_kind": "geom" if nid == "Geom" else "node",
            "way_ids": p["wayIds"], "city": p["cityName"],
        })
    return rows


def run_reference_geoturf(fname: str) -> list[dict]:
    """The geoturf.js VARIANT (geometric-only, raw coords, old schema)."""
    out = os.path.join(STAGE, "output", "out_turf.json")
    subprocess.run(["node", "js/geoturf.js", f"input/{fname}", out],
                   cwd=STAGE, check=True, capture_output=True, text=True)
    gj = json.load(open(out))
    rows = []
    for feat in gj["features"]:
        p = feat["properties"]
        lon, lat = feat["geometry"]["coordinates"]
        nid = p["nodeId"]
        rows.append({
            "lat": lat, "lon": lon, "streets": p["streets"],
            "node_id": None if nid == "Geom" else int(nid),
            "node_id_kind": "geom" if nid == "Geom" else "node",
        })
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from collections import Counter

    from osm_intersections_ray.oracle.reference_oracle import run_oracle
    from osm_intersections_ray.sources.synthetic import ensure_fixtures

    fx = ensure_fixtures(sf_dir)
    stage_reference()
    lines = [f"# CONFORMANCE — reference JS vs oracle on synthetic fixture {os.path.basename(fx)}", ""]
    ok = True
    for county in ("Alpha County", "Beta County"):
        fname = fixture_to_inputs(fx, county)
        ref_rows = run_reference(fname)
        ways = pq.read_table(os.path.join(fx, "ways.parquet"))
        bd = pq.read_table(os.path.join(fx, "boundaries.parquet"))
        cc = pq.read_table(os.path.join(fx, "county_cities.parquet"))
        mine = run_oracle(ways, bd, cc, county)

        def key(r):
            return (r["lat"], r["lon"], tuple(r["streets"]), r["node_id"],
                    r["node_id_kind"], tuple(r["way_ids"]), r["city"])

        rk = Counter(key(r) for r in ref_rows)
        mk = Counter(key(r) for r in mine)
        missing = rk - mk
        extra = mk - rk
        status = "MATCH" if not missing and not extra else "MISMATCH"
        ok = ok and status == "MATCH"
        lines.append(f"* {county}: reference rows={len(ref_rows)} oracle rows={len(mine)} -> **{status}**")
        for k, v in list(missing.items())[:5]:
            lines.append(f"    * missing x{v}: {k}")
        for k, v in list(extra.items())[:5]:
            lines.append(f"    * extra x{v}: {k}")

        # geoturf.js VARIANT: geometric-only, RAW coordinates, old schema —
        # compared against the oracle's raw geometric rows (the engine's
        # geometric_only_pipeline is golden-tested against the same rows)
        import pyarrow.compute as pc

        from osm_intersections_ray.oracle.reference_oracle import (
            GEOM_SENTINEL, ReferenceOracle,
        )

        tref = run_reference_geoturf(fname)
        orc = ReferenceOracle(ways.filter(pc.equal(ways["county"], county)))
        orc.init_way_data()
        tmine = []
        for i in orc.find_intersections_geometric():
            is_geom = i.node_id == GEOM_SENTINEL
            tmine.append({"lat": i.lat, "lon": i.lon,
                          "streets": i.streets.split("/"),
                          "node_id": None if is_geom else int(i.node_id),
                          "node_id_kind": "geom" if is_geom else "node"})

        def tkey(r):
            return (r["lat"], r["lon"], tuple(r["streets"]), r["node_id"],
                    r["node_id_kind"])

        trk = Counter(tkey(r) for r in tref)
        tmk = Counter(tkey(r) for r in tmine)
        tstatus = "MATCH" if trk == tmk else "MISMATCH"
        ok = ok and tstatus == "MATCH"
        lines.append(f"* {county} (geoturf variant): reference rows={len(tref)} "
                     f"oracle rows={len(tmine)} -> **{tstatus}**")
        for k, v in list((trk - tmk).items())[:5]:
            lines.append(f"    * missing x{v}: {k}")
        for k, v in list((tmk - trk).items())[:5]:
            lines.append(f"    * extra x{v}: {k}")
    report = "\n".join(lines) + "\n"
    print(report)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "CONFORMANCE.md"), "w") as f:
        f.write(report)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
