"""Ring-expansion kNN nearest-way queries (J11, js/geo.js:1305-1361 —
the reference's commented-but-stated-purpose reverse geocoder).

A stateful actor pool holds a per-region cell index of way vertices (built
once per actor from a broadcast vertex table).  A query probes its own 0.01
degree cell, then expands ring by ring (r=1, 2, ...) until the best candidate
distance is <= the L1 lower bound of the next unexplored ring — with the
reference's metric (L1 degrees x 100000, js/geo.js:661-666) the bound for
ring r is r * DELTA * metersPerDegree.

At cluster scale the vertex table shards by region (county/tile) and queries
route to the owning actor; in this sandbox one broadcast index suffices and
the routing is the county column.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..functions.scalar import METERS_PER_DEGREE


def build_vertex_index(ways_ds) -> dict:
    """cell -> (lats, lons, way_ids) numpy arrays, from named tagged ways."""
    from ..functions.scalar import get_way_name

    def explode(b: pa.Table) -> pa.Table:
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        tagged = b["tagged"].to_pylist()
        ids = b["way_id"].to_pylist()
        la, lo, wi = [], [], []
        lats_l = b["lats"].to_pylist()
        lons_l = b["lons"].to_pylist()
        for i in range(b.num_rows):
            if not tagged[i] or not get_way_name(names[i], refs[i]):
                continue
            la.extend(lats_l[i])
            lo.extend(lons_l[i])
            wi.extend([ids[i]] * len(lats_l[i]))
        return pa.table({"lat": pa.array(la, pa.float64()),
                         "lon": pa.array(lo, pa.float64()),
                         "way_id": pa.array(wi, pa.int64())})

    df = ways_ds.map_batches(explode, batch_format="pyarrow").to_pandas()
    cells: dict = {}
    kx = np.floor(df["lon"].to_numpy() * 100).astype(np.int64)
    ky = np.floor(df["lat"].to_numpy() * 100).astype(np.int64)
    for (x, y), idx in df.groupby([kx, ky], sort=False).indices.items():
        cells[(int(x), int(y))] = (
            df["lat"].to_numpy()[idx], df["lon"].to_numpy()[idx],
            df["way_id"].to_numpy()[idx])
    return cells


class NearestWay:
    """Actor: per-batch ring-expansion nearest-vertex queries.  Tie-break on
    (distance, way_id) ascending — matching the SQL oracle's ORDER BY."""

    def __init__(self, index_ref):
        from .common import cached_get

        self.cells = cached_get(index_ref)

    def _query(self, qlat: float, qlon: float) -> int:
        cx = math.floor(qlon * 100)
        cy = math.floor(qlat * 100)
        best_d = math.inf
        best_w = -1
        r = 0
        while True:
            # ring r: cells at Chebyshev distance r from (cx, cy)
            ring = []
            if r == 0:
                ring = [(cx, cy)]
            else:
                for dx in range(-r, r + 1):
                    ring.append((cx + dx, cy - r))
                    ring.append((cx + dx, cy + r))
                for dy in range(-r + 1, r):
                    ring.append((cx - r, cy + dy))
                    ring.append((cx + r, cy + dy))
            for key in ring:
                hit = self.cells.get(key)
                if hit is None:
                    continue
                la, lo, wi = hit
                d = METERS_PER_DEGREE * (np.abs(la - qlat) + np.abs(lo - qlon))
                j = np.lexsort((wi, d))[0]
                if d[j] < best_d or (d[j] == best_d and wi[j] < best_w):
                    best_d = d[j]
                    best_w = int(wi[j])
            # lower bound for ring r+1: any point there is >= r*0.01 deg away
            # in Chebyshev => L1 >= r*0.01
            lb = (r) * 0.01 * METERS_PER_DEGREE
            if best_w != -1 and best_d <= lb:
                break
            r += 1
            if r > 2000:  # empty index guard
                break
        return best_w

    def __call__(self, b: pa.Table) -> pa.Table:
        ks = b["k"].to_pylist()
        qlats = b["qlat"].to_pylist()
        qlons = b["qlon"].to_pylist()
        out = [self._query(la, lo) for la, lo in zip(qlats, qlons)]
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "way_id": pa.array(out, pa.int64())})


def nearest_way_queries(ways_ds, n_queries: int = 20):
    """The benchmark query set: n deterministic probe points (expressible in
    SQL via generate_series)."""
    import ray
    import ray.data as rd

    idx_ref = ray.put(build_vertex_index(ways_ds))
    pts = pa.table({
        "k": pa.array(list(range(n_queries)), pa.int64()),
        "qlat": pa.array([36.92 + k * 0.02 for k in range(n_queries)], pa.float64()),
        "qlon": pa.array([-122.39 + k * 0.04 for k in range(n_queries)], pa.float64()),
    })
    ds = rd.from_arrow(pts)
    return ds.map_batches(NearestWay, batch_format="pyarrow",
                          concurrency=(1, 2), fn_constructor_args=(idx_ref,))


def nearest_way_sql(ways_path: str, n_queries: int = 20) -> str:
    from .queries_spatial import NM_SQL

    return f"""
WITH pts AS (
  SELECT k, 36.92 + k * 0.02 AS qlat, -122.39 + k * 0.04 AS qlon
  FROM UNNEST(generate_series(0, {n_queries - 1})) t(k)
),
raw AS (SELECT *, {NM_SQL} AS nm FROM read_parquet('{ways_path}') WHERE tagged),
named AS (SELECT way_id, lats, lons FROM raw WHERE nm <> ''),
v AS (SELECT way_id, unnest(lats) AS vlat, unnest(lons) AS vlon FROM named),
d AS (SELECT p.k, v.way_id,
             {METERS_PER_DEGREE} * (abs(v.vlat - p.qlat) + abs(v.vlon - p.qlon)) AS dist
      FROM pts p, v),
r AS (SELECT k, way_id,
             row_number() OVER (PARTITION BY k ORDER BY dist, way_id) AS rn
      FROM d)
SELECT k, way_id FROM r WHERE rn = 1
"""
