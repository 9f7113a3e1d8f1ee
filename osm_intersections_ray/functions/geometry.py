"""Pure-Python/numpy geometry kernels (no shapely/turf in this environment).

* segment/polyline intersection matching ``turf.lineIntersect`` observable
  semantics as used by the reference (js/geo.js:201-215): the reference keeps
  only ``features[0]`` — the *first* crossing point; we define "first" as the
  lexicographically first (i, j) segment-pair hit, iterating way1 segments
  outer / way2 segments inner.  Fixture ways cross at most once per pair, so
  this matches any turf version's choice.
* point-in-polygon matching ``turf.booleanPointInPolygon`` with
  ``ignoreBoundary=false`` (boundary counts as inside), js/geo.js:60-70.
"""

from __future__ import annotations

import numpy as np


def seg_intersect(
    x1: float, y1: float, x2: float, y2: float,
    x3: float, y3: float, x4: float, y4: float,
) -> tuple[float, float] | None:
    """Intersection point of segments (P1,P2) and (P3,P4), endpoints
    inclusive; ``None`` when parallel/collinear (turf's line-intersect helper
    returns false for a zero denominator) or outside [0,1] parameters."""
    denom = (y4 - y3) * (x2 - x1) - (x4 - x3) * (y2 - y1)
    if denom == 0.0:
        return None
    ua = ((x4 - x3) * (y1 - y3) - (y4 - y3) * (x1 - x3)) / denom
    ub = ((x2 - x1) * (y1 - y3) - (y2 - y1) * (x1 - x3)) / denom
    if 0.0 <= ua <= 1.0 and 0.0 <= ub <= 1.0:
        return (x1 + ua * (x2 - x1), y1 + ua * (y2 - y1))
    return None


def first_line_crossing(
    lons1, lats1, lons2, lats2
) -> tuple[float, float] | None:
    """First crossing point of two polylines as (lon, lat) — the reference's
    ``getIntersection`` keeps ``int.features[0]`` only (js/geo.js:209-214)."""
    n1 = len(lons1)
    n2 = len(lons2)
    # cheap per-segment bbox prefilter on way2, computed once
    for i in range(n1 - 1):
        ax0, ay0, ax1, ay1 = lons1[i], lats1[i], lons1[i + 1], lats1[i + 1]
        alox, ahix = (ax0, ax1) if ax0 <= ax1 else (ax1, ax0)
        aloy, ahiy = (ay0, ay1) if ay0 <= ay1 else (ay1, ay0)
        for j in range(n2 - 1):
            bx0, by0, bx1, by1 = lons2[j], lats2[j], lons2[j + 1], lats2[j + 1]
            if max(bx0, bx1) < alox or min(bx0, bx1) > ahix:
                continue
            if max(by0, by1) < aloy or min(by0, by1) > ahiy:
                continue
            hit = seg_intersect(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
            if hit is not None:
                return hit
    return None


def point_in_ring(lon: float, lat: float, ring: np.ndarray) -> bool:
    """Even-odd ray casting with on-boundary => True.

    ``ring`` is an (n, 2) array of [lon, lat]; closed or open accepted.
    """
    xs = ring[:, 0]
    ys = ring[:, 1]
    n = len(xs)
    inside = False
    j = n - 1
    for i in range(n):
        xi, yi = xs[i], ys[i]
        xj, yj = xs[j], ys[j]
        # boundary check: point on segment (i,j)
        if (min(xi, xj) <= lon <= max(xi, xj)) and (min(yi, yj) <= lat <= max(yi, yj)):
            cross = (xj - xi) * (lat - yi) - (yj - yi) * (lon - xi)
            if cross == 0.0:
                return True
        if (yi > lat) != (yj > lat):
            x_at = (xj - xi) * (lat - yi) / (yj - yi) + xi
            if lon < x_at:
                inside = not inside
            elif lon == x_at:
                return True  # on boundary
        j = i
    return inside


def point_in_polygon(lon: float, lat: float, rings: list[np.ndarray]) -> bool:
    """Polygon = [outer, hole, hole...]; inside iff in outer and in no hole
    (a point ON a hole edge still counts as inside per turf's
    ignoreBoundary=false)."""
    if not rings or not point_in_ring(lon, lat, rings[0]):
        return False
    for hole in rings[1:]:
        if point_in_ring(lon, lat, hole):
            # on the hole boundary counts as polygon boundary => inside
            return _on_ring_boundary(lon, lat, hole)
    return True


def _on_ring_boundary(lon: float, lat: float, ring: np.ndarray) -> bool:
    xs = ring[:, 0]
    ys = ring[:, 1]
    n = len(xs)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        if (min(xi, xj) <= lon <= max(xi, xj)) and (min(yi, yj) <= lat <= max(yi, yj)):
            if (xj - xi) * (lat - yi) - (yj - yi) * (lon - xi) == 0.0:
                return True
        j = i
    return False


def point_in_shape(lon: float, lat: float, polygons: list[list[np.ndarray]]) -> bool:
    """MultiPolygon membership: any polygon contains the point."""
    return any(point_in_polygon(lon, lat, rings) for rings in polygons)


def points_in_ring_np(lons: np.ndarray, lats: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast of many points against one ring.

    Matches :func:`point_in_ring` for all points not exactly on the boundary
    (synthetic/generic coordinates never are); used in the batch hot paths
    (city tagging, pages geotag join refinement)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    inside = np.zeros(len(lons), dtype=bool)
    xs = ring[:, 0]
    ys = ring[:, 1]
    n = len(xs)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        crosses = (yi > lats) != (yj > lats)
        if crosses.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                x_at = (xj - xi) * (lats - yi) / (yj - yi) + xi
            inside ^= crosses & (lons < x_at)
        j = i
    return inside


def points_in_shape_np(
    lons: np.ndarray, lats: np.ndarray, polygons: list[list[np.ndarray]]
) -> np.ndarray:
    """Vectorized MultiPolygon membership (outer ring minus holes, even-odd)."""
    out = np.zeros(len(lons), dtype=bool)
    for rings in polygons:
        m = points_in_ring_np(lons, lats, rings[0])
        for hole in rings[1:]:
            m &= ~points_in_ring_np(lons, lats, hole)
        out |= m
    return out


def first_match_city_np(
    lons: np.ndarray, lats: np.ndarray, city_polys: list[tuple[str, list]]
) -> np.ndarray:
    """First-match-in-file-order city assignment (js/geo.js:60-70):
    for each point, the first city polygon (boundary-file order) containing it,
    else 'Unincorporated' (js/geo.js:1255)."""
    n = len(lons)
    out = np.full(n, "Unincorporated", dtype=object)
    unassigned = np.ones(n, dtype=bool)
    for name, polys in city_polys:
        if not unassigned.any():
            break
        idx = np.nonzero(unassigned)[0]
        hit = points_in_shape_np(np.asarray(lons)[idx], np.asarray(lats)[idx], polys)
        out[idx[hit]] = name
        unassigned[idx[hit]] = False
    return out


def parse_geom_json(geom_json: str) -> list[list[np.ndarray]]:
    """Parse the boundaries table's geometry encoding into polygon lists.

    Encoding: GeoJSON-style nested lists, either Polygon ``[[ [lon,lat].. ]..]``
    or MultiPolygon ``[[[ [lon,lat].. ]..]..]`` — distinguished by nesting
    depth, stored as a JSON string column (no WKB libs in this environment).
    """
    import json

    coords = json.loads(geom_json)

    def depth(c):
        d = 0
        while isinstance(c, (list, tuple)):
            d += 1
            c = c[0]
        return d

    d = depth(coords)
    if d == 3:  # Polygon
        polys = [coords]
    elif d == 4:  # MultiPolygon
        polys = coords
    else:
        raise ValueError(f"bad geometry nesting depth {d}")
    return [[np.asarray(ring, dtype=np.float64) for ring in poly] for poly in polys]
