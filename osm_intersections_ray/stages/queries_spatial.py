"""Standalone spatial operators with exact DuckDB oracles, over the synthetic
ways table (these are the engine's public building blocks; the
reference-exact pipeline composes their float-loop variants internally).

The SQL strings read the fixture parquet directly (read_parquet on the /tmp
fixture path), since the driver's pre-registered views only cover the TPC-H
tables.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.scalar import MOTORWAY, get_way_name

# getWayName (js/geo.js:171-186) as a SQL fragment
NM_SQL = ("array_to_string(list_concat("
          "CASE WHEN name IS NOT NULL AND name <> '' THEN [name] ELSE []::VARCHAR[] END, "
          "CASE WHEN ref IS NOT NULL AND ref <> '' THEN string_split(ref, ';') "
          "ELSE []::VARCHAR[] END), ';')")


def _named_cte(ways_path: str, cols: str = "way_id, nm, nodes, lats, lons") -> str:
    return (f"WITH raw AS (SELECT *, {NM_SQL} AS nm FROM read_parquet('{ways_path}') "
            f"WHERE tagged), named AS (SELECT {cols}, highway, minlat, minlon, "
            f"maxlat, maxlon FROM raw WHERE nm <> '')")


def way_names(ways_ds):
    """M2: canonical way names of named tagged ways."""

    def fn(b: pa.Table) -> pa.Table:
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        tagged = b["tagged"].to_pylist()
        ids = b["way_id"].to_pylist()
        out_i, out_n = [], []
        for i in range(b.num_rows):
            if not tagged[i]:
                continue
            nm = get_way_name(names[i], refs[i])
            if nm:
                out_i.append(ids[i])
                out_n.append(nm)
        return pa.table({"way_id": pa.array(out_i, pa.int64()),
                         "nm": pa.array(out_n, pa.string())})

    return ways_ds.map_batches(fn, batch_format="pyarrow")


def way_names_sql(ways_path: str) -> str:
    return (f"SELECT way_id, {NM_SQL} AS nm FROM read_parquet('{ways_path}') "
            f"WHERE tagged AND {NM_SQL} <> ''")


def shared_node_candidates(ways_ds):
    """J1 core: nodes touched by >=2 distinct way names (raw names)."""
    from ray.data.aggregate import AggregateFn  # noqa: F401  (doc pointer)

    def explode(b: pa.Table) -> pa.Table:
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        tagged = b["tagged"].to_pylist()
        out_n, out_nm = [], []
        for i, lst in enumerate(b["nodes"].to_pylist()):
            if not tagged[i]:
                continue
            nm = get_way_name(names[i], refs[i])
            if not nm:
                continue
            for n in set(lst):
                out_n.append(n)
                out_nm.append(nm)
        return pa.table({"node": pa.array(out_n, pa.int64()),
                         "nm": pa.array(out_nm, pa.string())})

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        dd = df.drop_duplicates(["node", "nm"])
        cnt = dd.groupby("node", sort=False)["nm"].nunique()
        multi = cnt[cnt > 1]
        if len(multi) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "n_names": pa.array([], pa.int64()),
                             "names": pa.array([], pa.string())})
        dd = dd[dd["node"].isin(multi.index)].sort_values(["node", "nm"], kind="stable")
        names = dd.groupby("node", sort=False)["nm"].agg("/".join)
        nodes = names.index.to_numpy()
        return pa.table({
            "node": pa.array(nodes, pa.int64()),
            "n_names": pa.array([int(multi[n]) for n in nodes], pa.int64()),
            "names": pa.array([names[n] for n in nodes], pa.string()),
        })

    exploded = ways_ds.map_batches(explode, batch_format="pyarrow")
    keyed = exploded.map_batches(
        lambda b: b.append_column(
            "bucket", pa.array((np.asarray(b["node"]) % 64).tolist(), pa.int64())),
        batch_format="pyarrow")
    return keyed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def shared_node_candidates_sql(ways_path: str) -> str:
    return f"""
{_named_cte(ways_path)},
e AS (SELECT nm, unnest(nodes) AS node FROM named)
SELECT node, count(DISTINCT nm)::BIGINT AS n_names,
       array_to_string(list_sort(list(DISTINCT nm)), '/') AS names
FROM e GROUP BY node HAVING count(DISTINCT nm) > 1
"""


def dead_end_rows(ways_ds):
    """T4 as a standalone operator: odd-parity (node, name) endpoint counts."""

    def endpoints(b: pa.Table) -> pa.Table:
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        tagged = b["tagged"].to_pylist()
        out_n, out_nm = [], []
        for i, lst in enumerate(b["nodes"].to_pylist()):
            if not tagged[i] or len(lst) < 2:
                continue
            nm = get_way_name(names[i], refs[i])
            if not nm:
                continue
            out_n.extend([lst[0], lst[-1]])
            out_nm.extend([nm, nm])
        return pa.table({"node": pa.array(out_n, pa.int64()),
                         "name": pa.array(out_nm, pa.string())})

    from ray.data.aggregate import Count

    counted = (ways_ds.map_batches(endpoints, batch_format="pyarrow")
               .groupby(["node", "name"]).aggregate(Count(alias_name="n")))

    def odd(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"])
        return b.filter(pa.array((n % 2 == 1).tolist()))

    return counted.map_batches(odd, batch_format="pyarrow")


def dead_ends_sql(ways_path: str) -> str:
    return f"""
{_named_cte(ways_path)},
ends AS (
  SELECT nm, nodes[1] AS node FROM named WHERE len(nodes) >= 2
  UNION ALL
  SELECT nm, nodes[len(nodes)] AS node FROM named WHERE len(nodes) >= 2
)
SELECT node, nm AS name, count(*)::BIGINT AS n
FROM ends GROUP BY 1, 2 HAVING count(*) % 2 = 1
"""


def cell_cover_stats(ways_ds):
    """A8: per-way cover-cell count (integer-stepped cover, the engine's
    public cover op) — the skew-monitoring metric stage."""

    def fn(b: pa.Table) -> pa.Table:
        tagged = b["tagged"].to_pylist()
        out_id, out_n = [], []
        for i in range(b.num_rows):
            if not tagged[i]:
                continue
            lo0 = math.floor(b["minlon"][i].as_py() * 100)
            lo1 = math.ceil(b["maxlon"][i].as_py() * 100)
            la0 = math.floor(b["minlat"][i].as_py() * 100)
            la1 = math.ceil(b["maxlat"][i].as_py() * 100)
            out_id.append(b["way_id"][i].as_py())
            out_n.append((lo1 - lo0 + 1) * (la1 - la0 + 1))
        return pa.table({"way_id": pa.array(out_id, pa.int64()),
                         "n_cells": pa.array(out_n, pa.int64())})

    return ways_ds.map_batches(fn, batch_format="pyarrow")


def cell_cover_stats_sql(ways_path: str) -> str:
    return f"""
SELECT way_id,
       ((CAST(ceil(maxlon * 100) AS BIGINT) - CAST(floor(minlon * 100) AS BIGINT) + 1)
      * (CAST(ceil(maxlat * 100) AS BIGINT) - CAST(floor(minlat * 100) AS BIGINT) + 1))::BIGINT
       AS n_cells
FROM read_parquet('{ways_path}') WHERE tagged
"""


def cell_population(ways_ds):
    """Per-cell way counts (the bins.stats skew counters, distributed)."""

    def explode(b: pa.Table) -> pa.Table:
        tagged = b["tagged"].to_pylist()
        klngs, klats = [], []
        for i in range(b.num_rows):
            if not tagged[i]:
                continue
            lo0 = math.floor(b["minlon"][i].as_py() * 100)
            lo1 = math.ceil(b["maxlon"][i].as_py() * 100)
            la0 = math.floor(b["minlat"][i].as_py() * 100)
            la1 = math.ceil(b["maxlat"][i].as_py() * 100)
            for x in range(lo0, lo1 + 1):
                for y in range(la0, la1 + 1):
                    klngs.append(x)
                    klats.append(y)
        return pa.table({"klng": pa.array(klngs, pa.int64()),
                         "klat": pa.array(klats, pa.int64())})

    from ray.data.aggregate import Count

    return (ways_ds.map_batches(explode, batch_format="pyarrow")
            .groupby(["klng", "klat"]).aggregate(Count(alias_name="n_ways")))


def cell_population_sql(ways_path: str) -> str:
    return f"""
WITH w AS (SELECT way_id, minlat, minlon, maxlat, maxlon
           FROM read_parquet('{ways_path}') WHERE tagged),
x AS (SELECT way_id, minlat, maxlat,
             unnest(generate_series(CAST(floor(minlon * 100) AS BIGINT),
                                    CAST(ceil(maxlon * 100) AS BIGINT))) AS klng
      FROM w),
xy AS (SELECT way_id, klng,
              unnest(generate_series(CAST(floor(minlat * 100) AS BIGINT),
                                     CAST(ceil(maxlat * 100) AS BIGINT))) AS klat
       FROM x)
SELECT klng, klat, count(*)::BIGINT AS n_ways FROM xy GROUP BY 1, 2
"""


def block_gps_lookup(ways_ds):
    """Block->GPS lookup table (blockGPS.json, FIXTURES.md section 7): the
    reference stores lat/lon AS STRINGS; the engine derives a deterministic
    blocks table from the named ways (street name, block number, '%.6f'
    stringified first-vertex coordinate) and performs the lookup cast
    in-pipeline back to float64 — preserving the string-typed source."""

    def fn(b: pa.Table) -> pa.Table:
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        tagged = b["tagged"].to_pylist()
        ids = b["way_id"].to_pylist()
        lats_l = b["lats"].to_pylist()
        lons_l = b["lons"].to_pylist()
        street, block, lat, lon = [], [], [], []
        for i in range(b.num_rows):
            if not tagged[i]:
                continue
            nm = get_way_name(names[i], refs[i])
            if not nm:
                continue
            alat = f"{lats_l[i][0]:.6f}"   # the string-typed source columns
            alon = f"{lons_l[i][0]:.6f}"
            street.append(nm.upper())
            block.append(str((ids[i] % 90 + 10) * 100))
            lat.append(float(alat))        # cast-in-pipeline
            lon.append(float(alon))
        return pa.table({"street": pa.array(street, pa.string()),
                         "block": pa.array(block, pa.string()),
                         "lat": pa.array(lat, pa.float64()),
                         "lon": pa.array(lon, pa.float64())})

    return ways_ds.map_batches(fn, batch_format="pyarrow")


def block_gps_sql(ways_path: str) -> str:
    return f"""
{_named_cte(ways_path)}
SELECT upper(nm) AS street,
       ((way_id % 90 + 10) * 100)::VARCHAR AS block,
       CAST(printf('%.6f', lats[1]) AS DOUBLE) AS lat,
       CAST(printf('%.6f', lons[1]) AS DOUBLE) AS lon
FROM named
"""


def geom_candidate_pairs(ways_ds):
    """J2 candidate structure: ordered (motorway way1, named way2) pairs with
    shared-cell multiplicity (integer-stepped covers)."""

    def explode(b: pa.Table) -> pa.Table:
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        tagged = b["tagged"].to_pylist()
        hwy = b["highway"].to_pylist()
        cell, wid, mot = [], [], []
        for i in range(b.num_rows):
            if not tagged[i] or not get_way_name(names[i], refs[i]):
                continue
            lo0 = math.floor(b["minlon"][i].as_py() * 100)
            lo1 = math.ceil(b["maxlon"][i].as_py() * 100)
            la0 = math.floor(b["minlat"][i].as_py() * 100)
            la1 = math.ceil(b["maxlat"][i].as_py() * 100)
            for x in range(lo0, lo1 + 1):
                for y in range(la0, la1 + 1):
                    cell.append((x + 20000) * 100000 + (y + 10000))
                    wid.append(b["way_id"][i].as_py())
                    mot.append(hwy[i] == MOTORWAY)
        return pa.table({"cell": pa.array(cell, pa.int64()),
                         "way_id": pa.array(wid, pa.int64()),
                         "is_mot": pa.array(mot, pa.bool_())})

    def per_cell(df: pd.DataFrame) -> pa.Table:
        mots = df[df["is_mot"]]
        if len(mots) == 0:
            return pa.table({"w1": pa.array([], pa.int64()),
                             "w2": pa.array([], pa.int64())})
        w1s, w2s = [], []
        all_ids = df["way_id"].to_numpy()
        for m in mots["way_id"]:
            for o in all_ids:
                if o != m:
                    w1s.append(int(m))
                    w2s.append(int(o))
        return pa.table({"w1": pa.array(w1s, pa.int64()),
                         "w2": pa.array(w2s, pa.int64())})

    from ray.data.aggregate import Count

    exploded = ways_ds.map_batches(explode, batch_format="pyarrow")
    pairs = exploded.groupby("cell").map_groups(per_cell, batch_format="pandas")
    return pairs.groupby(["w1", "w2"]).aggregate(Count(alias_name="n_cells"))


def geom_candidate_pairs_sql(ways_path: str) -> str:
    return f"""
{_named_cte(ways_path)},
x AS (SELECT way_id, highway, minlat, maxlat,
             unnest(generate_series(CAST(floor(minlon * 100) AS BIGINT),
                                    CAST(ceil(maxlon * 100) AS BIGINT))) AS klng
      FROM named),
cov AS (SELECT way_id, highway, klng,
               unnest(generate_series(CAST(floor(minlat * 100) AS BIGINT),
                                      CAST(ceil(maxlat * 100) AS BIGINT))) AS klat
        FROM x)
SELECT a.way_id AS w1, b.way_id AS w2, count(*)::BIGINT AS n_cells
FROM cov a JOIN cov b ON a.klng = b.klng AND a.klat = b.klat AND a.way_id != b.way_id
WHERE a.highway = 'motorway'
GROUP BY 1, 2
"""
