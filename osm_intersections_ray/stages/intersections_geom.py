"""Geometric segment-crossing join: distributed ``findIntersectionsGeomtric``
(js/geo.js:248-329 + classGpsbins, SURVEY.md J2/J3/T1).

The reference's in-process 0.01-degree grid index becomes a cell-keyed hash
join: both sides explode to one row per bbox-cover cell and meet in a
``groupby(cell)`` — the join IS the shuffle; no shared index object exists.

Exactness notes (all verified against the committed Napa golden output):

* emission is one-directional: way1 iterates wayData in order and must be a
  motorway (the reference's bridge predicate tests ``wayData.bridge`` which
  doesn't exist, so only ``highway == 'motorway'`` passes; and the iterator's
  id-order dedup tests ``pred(raw_way)`` whose ``.highway`` is undefined —
  it never fires).  way2 is ANY named wayData row sharing the cell.
* one output row per shared cover cell per ordered pair — do NOT dedup
  (Napa: 14 ordered pairs x2/x4 cells = 48 rows).
* crossing point = FIRST crossing (turf features[0]); common-node check via
  set intersection ordered by the smaller side (JS Set.prototype.intersection).

Scale design: only cells covered by at least one motorway way can produce
pairs, so the explode is pre-filtered by the (small, broadcast) motorway cell
set — dense urban cells containing zero motorways never shuffle.  Pair work
within a cell is bounded by cell size (0.01 deg); hot cells can be salted by
way1 (each way1's pairs are independent), noted in PipelineConfig.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.cells import cover_cells
from ..functions.geometry import first_line_crossing
from ..functions.scalar import MOTORWAY, check_highway_types, clean_streets
from .intersections_node import SEP

GEOM_SCHEMA = pa.schema(
    [
        ("county", pa.string()),
        ("pos", pa.int64()),
        ("raw", pa.string()),
        ("streets", pa.string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("way_ids", pa.list_(pa.int64())),
        ("node_id", pa.int64()),       # -1 => 'Geom' sentinel
        ("has_node", pa.bool_()),
    ]
)


def motorway_cell_set(waydata_ds) -> set:
    """Distinct (county, cell) covers of motorway ways — the broadcast
    prefilter for the explode (small: motorways are sparse).

    Vectorized with the INTEGER rectangle cover (floor(min*100) ..
    ceil(max*100) inclusive, :func:`..functions.cells.cover_cells_int`),
    which is a superset of the reference's float-accumulation cover (the
    float loop's ``_k`` keys are the same nominal integers; drift can only
    DROP the final row/column, never step outside the rectangle).  A
    superset prefilter is output-identical: a pair row needs the motorway's
    own exploded row at the cell, and :func:`explode_cells` still computes
    each way's cells with the exact float loop — extra prefilter cells that
    no motorway float-cover contains admit only non-motorway rows, which
    the pair kernel (way1 must be motorway) never emits."""
    import pyarrow.compute as pc

    from ..functions.cells import _LAT_OFF, _LNG_OFF

    def cells(b: pa.Table) -> pa.Table:
        sub = b.filter(pc.equal(b["highway"], MOTORWAY))
        n = sub.num_rows
        if n == 0:
            return pa.table({"county": pa.array([], pa.string()),
                             "cell": pa.array([], pa.int64())})
        la0 = np.floor(sub["minlat"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        la1 = np.ceil(sub["maxlat"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        lo0 = np.floor(sub["minlon"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        lo1 = np.ceil(sub["maxlon"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        nla = la1 - la0 + 1
        tot = (lo1 - lo0 + 1) * nla
        total = int(tot.sum())
        widx = np.repeat(np.arange(n, dtype=np.int64), tot)
        off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(tot) - tot, tot)
        klng = lo0[widx] + off // nla[widx]
        klat = la0[widx] + off % nla[widx]
        cell = (klng + _LNG_OFF) * 100000 + (klat + _LAT_OFF)
        t = pa.table({"county": sub["county"].combine_chunks().take(pa.array(widx)),
                      "cell": pa.array(cell, pa.int64())})
        # per-batch dedupe before the driver collect (overlapping bboxes)
        return t.group_by(["county", "cell"]).aggregate([])

    df = waydata_ds.map_batches(cells, batch_format="pyarrow").to_pandas()
    return set(zip(df["county"], df["cell"].astype(int)))


def explode_cells(waydata_ds, mot_cells_ref):
    """One row per (way, cover cell) limited to motorway-covered cells;
    carries the full geometry (the pair kernel needs it, as the reference's
    bins carry way references)."""
    from .common import cached_get

    class Explode:
        def __init__(self):
            self.mot = cached_get(mot_cells_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            """Row replication via Arrow ``take`` (C gather, list columns
            included) — only the cover computation itself is per-way Python
            (it IS the reference's float-accumulation semantics)."""
            import numpy as np

            minlat = b["minlat"].to_numpy(zero_copy_only=False)
            minlon = b["minlon"].to_numpy(zero_copy_only=False)
            maxlat = b["maxlat"].to_numpy(zero_copy_only=False)
            maxlon = b["maxlon"].to_numpy(zero_copy_only=False)
            counties = b["county"].to_pylist()
            idx: list[int] = []
            cells_out: list[int] = []
            gkeys: list[str] = []
            for i in range(b.num_rows):
                c = counties[i]
                hits = [cell for cell in
                        cover_cells(minlat[i], minlon[i], maxlat[i], maxlon[i])
                        if (c, cell) in self.mot]
                if not hits:
                    continue
                idx.extend([i] * len(hits))
                cells_out.extend(hits)
                gkeys.extend(f"{c}{SEP}{cell}" for cell in hits)
            sub = b.select(["county", "data_rank", "way_id", "name", "highway",
                            "nodes", "lats", "lons"]).take(pa.array(idx, pa.int64()))
            return (sub.add_column(0, "gkey", pa.array(gkeys, pa.string()))
                    .add_column(2, "cell", pa.array(cells_out, pa.int64())))

    def explode(b: pa.Table) -> pa.Table:
        return Explode()(b)

    return waydata_ds.map_batches(explode, batch_format="pyarrow")


def _common_nodes(nodes1, nodes2):
    s1 = list(dict.fromkeys(nodes1))
    s2 = list(dict.fromkeys(nodes2))
    if len(s1) <= len(s2):
        other = set(s2)
        return [n for n in s1 if n in other]
    other = set(s1)
    return [n for n in s2 if n in other]


def pair_kernel(df) -> pa.Table:
    """Per-cell pairwise crossing test (J2+J3).  Rows sorted by data_rank =
    bin insertion order; way1 = motorway rows in that order; way2 = all rows."""
    rows = {k: [] for k in ("county", "pos", "raw", "streets", "lat", "lon",
                            "way_ids", "node_id", "has_node")}
    df = df.sort_values("data_rank", kind="stable")
    recs = df.to_dict("records")
    for r1 in recs:
        if r1["highway"] != MOTORWAY or not r1["name"]:
            continue
        for r2 in recs:
            if r2["data_rank"] == r1["data_rank"] or not r2["name"]:
                continue
            hit = first_line_crossing(r1["lons"], r1["lats"], r2["lons"], r2["lats"])
            if hit is None:
                continue
            common = _common_nodes(r1["nodes"], r2["nodes"])
            if not check_highway_types(r1["highway"], r2["highway"], bool(common)):
                continue
            raw = f"{r1['name']}/{r2['name']}"
            rows["county"].append(r1["county"])
            rows["pos"].append(int(r1["data_rank"]))
            rows["raw"].append(raw)
            rows["streets"].append(clean_streets(raw))
            rows["lat"].append(float(hit[1]))
            rows["lon"].append(float(hit[0]))
            rows["way_ids"].append([int(r1["way_id"]), int(r2["way_id"])])
            rows["node_id"].append(int(common[0]) if common else -1)
            rows["has_node"].append(bool(common))
    return pa.table(
        {
            "county": pa.array(rows["county"], pa.string()),
            "pos": pa.array(rows["pos"], pa.int64()),
            "raw": pa.array(rows["raw"], pa.string()),
            "streets": pa.array(rows["streets"], pa.string()),
            "lat": pa.array(rows["lat"], pa.float64()),
            "lon": pa.array(rows["lon"], pa.float64()),
            "way_ids": pa.array(rows["way_ids"], pa.list_(pa.int64())),
            "node_id": pa.array(rows["node_id"], pa.int64()),
            "has_node": pa.array(rows["has_node"], pa.bool_()),
        },
        schema=GEOM_SCHEMA,
    )


def geometric_intersections(waydata_ds, mot_cells_ref):
    exploded = explode_cells(waydata_ds, mot_cells_ref)
    return exploded.groupby("gkey").map_groups(pair_kernel, batch_format="pandas")
