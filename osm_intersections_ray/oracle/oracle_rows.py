"""Materialize the single-process reference oracle's intersection rows as
parquet so the driver can hash-check the flagship pipelines end-to-end.

Until round 4 ``intersections_full`` / ``intersections_geom_only`` were
rows-only for the driver (``no_oracle``): their semantics (driver fixpoint,
greedy clustering, PIP first-match — SURVEY section 2.4-2.6) are not
SQL-expressible directly.  The chain of evidence was golden pytest vs
``reference_oracle.run_oracle`` plus the executed reference JS (4-leg Node
conformance).  This module closes the loop the way the spatial queries
already do for their fixture tables: run the independent single-process
oracle ONCE per fixture scale, write its flattened rows to parquet (atomic,
cached next to the fixture), and express the DuckDB oracle as a plain
projection of that file.  The driver then compares the Ray pipeline's rows
hash-exactly against the reference semantics — float-for-float, because both
sides compute fix6 (js/geo.js:16-18) through identical double arithmetic.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.synthetic import ensure_fixtures
from .reference_oracle import GEOM_SENTINEL, ReferenceOracle, run_oracle

FULL_NAME = "intersections_oracle.parquet"
GEOM_NAME = "intersections_geom_oracle.parquet"

FULL_SCHEMA = pa.schema([
    ("county", pa.string()), ("lat", pa.float64()), ("lon", pa.float64()),
    ("streets", pa.string()), ("node_id", pa.int64()),
    ("node_id_kind", pa.string()), ("way_ids", pa.string()),
    ("city", pa.string()), ("source", pa.string()),
])

GEOM_SCHEMA = pa.schema([
    ("county", pa.string()), ("lat", pa.float64()), ("lon", pa.float64()),
    ("streets", pa.string()), ("node_id", pa.int64()),
    ("node_id_kind", pa.string()),
])


def _counties(ways: pa.Table) -> list[str]:
    return sorted(set(ways["county"].to_pylist()))


def _atomic_write(tbl: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def ensure_intersections_oracle(sf_dir: str) -> tuple[str, str]:
    """Return (full_path, geom_path) of the oracle-row parquet for this
    scale, generating them once from the single-process reference oracle.

    The flattening mirrors queries.py's driver-facing projections exactly
    (streets joined by '/', way_ids comma-joined) so the SQL oracle is a
    bare SELECT."""
    fx = ensure_fixtures(sf_dir)
    full_path = os.path.join(fx, FULL_NAME)
    geom_path = os.path.join(fx, GEOM_NAME)
    if os.path.exists(full_path) and os.path.exists(geom_path):
        return full_path, geom_path

    ways = pq.read_table(os.path.join(fx, "ways.parquet"))
    bd = pq.read_table(os.path.join(fx, "boundaries.parquet"))
    cc = pq.read_table(os.path.join(fx, "county_cities.parquet"))

    full = {k: [] for k in FULL_SCHEMA.names}
    geom = {k: [] for k in GEOM_SCHEMA.names}
    for county in _counties(ways):
        for r in run_oracle(ways, bd, cc, county):
            full["county"].append(county)
            full["lat"].append(r["lat"])
            full["lon"].append(r["lon"])
            full["streets"].append("/".join(r["streets"]))
            full["node_id"].append(r["node_id"])
            full["node_id_kind"].append(r["node_id_kind"])
            full["way_ids"].append(",".join(str(x) for x in r["way_ids"]))
            full["city"].append(r["city"])
            full["source"].append(r["source"])

        # geoturf variant: RAW unrounded coordinates, no fix6, no city/county
        # averaging passes (js/geoturf.js:1151-1168) — same construction as
        # tests/test_golden_intersections.py::test_geometric_only_variant
        orc = ReferenceOracle(ways.filter(pc.equal(ways["county"], county)))
        orc.init_way_data()
        for i in orc.find_intersections_geometric():
            is_geom = i.node_id == GEOM_SENTINEL
            geom["county"].append(county)
            geom["lat"].append(i.lat)
            geom["lon"].append(i.lon)
            geom["streets"].append(i.streets)
            geom["node_id"].append(None if is_geom else int(i.node_id))
            geom["node_id_kind"].append("geom" if is_geom else "node")

    _atomic_write(pa.table(full, schema=FULL_SCHEMA), full_path)
    _atomic_write(pa.table(geom, schema=GEOM_SCHEMA), geom_path)
    return full_path, geom_path


def intersections_full_sql(full_path: str) -> str:
    return (f"SELECT county, lat, lon, streets, node_id, node_id_kind, "
            f"way_ids, city, source FROM read_parquet('{full_path}')")


def intersections_geom_only_sql(geom_path: str) -> str:
    return (f"SELECT county, lat, lon, streets, node_id, node_id_kind "
            f"FROM read_parquet('{geom_path}')")
