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

    from .common import n_shards

    ns = n_shards()  # cluster-derived (driver-side), shard-count-invariant fold
    exploded = ways_ds.map_batches(explode, batch_format="pyarrow")
    keyed = exploded.map_batches(
        lambda b: b.append_column(
            "bucket", pa.array((np.asarray(b["node"]) % ns).tolist(), pa.int64())),
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


# ---------------------------------------------------------------------------
# raster -> vector (north rule: "raster<->vector"): the occupied-cell raster
# (the same 0.01-degree bbox cover that feeds cell_population) vectorized
# into connected components (4-neighborhood), each reported as a labeled
# region with cell count and bounding rectangle.

RASTER_STRIPE_W = 32          # cells per lon-stripe (the CC shuffle key)
_KOFF_X, _KOFF_Y = 20_000, 10_000   # klng in [-18000,18000], klat in [-9000,9000]
_KMUL = 50_000                # encoded key = (x+OFFX)*KMUL + (y+OFFY), > 0


def _cell_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """int64 encoding of a cell, ordered lexicographically by (klng, klat)."""
    return (x.astype(np.int64) + _KOFF_X) * _KMUL + (y.astype(np.int64) + _KOFF_Y)


def vectorize_raster(ways_ds):
    """Vectorize the occupied-cell raster into 4-connected components.

    Raster side: tagged-way bbox covers explode to cells and dedup through a
    ``groupby`` — the raster is bounded by the GRID (648M cells for the whole
    planet at 0.01 deg), not by the input, so everything downstream of the
    dedup is small no matter how many ways feed it (that bound is why the
    intermediate ``materialize()`` is safe).

    Vector side — the textbook distributed connected-components split:

    1. stripe the grid on ``klng // RASTER_STRIPE_W`` and label each stripe
       INDEPENDENTLY with a fully vectorized min-label propagation
       (searchsorted neighbor edges + ``np.minimum.at`` + pointer jumping,
       O(log diameter) rounds);
    2. only BOUNDARY COLUMNS (2 of every RASTER_STRIPE_W columns) leave the
       stripes: the driver unions local roots across stripe seams with a
       dict union-find over O(boundary) entries;
    3. the root remap broadcasts back (``ray.put``) and a partial-combine
       ``groupby`` reduces per-component stats.

    Component label = lexicographically smallest (klng, klat) member cell.
    Output: (comp_klng, comp_klat, n_cells, min_klng, max_klng, min_klat,
    max_klat), exactly matching the recursive-CTE closure oracle."""
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    def explode_dedup(b: pa.Table) -> pa.Table:
        tagged = b["tagged"].to_numpy(zero_copy_only=False).astype(bool)
        # integer rectangle cover, fully vectorized (np.floor/ceil on float64
        # == math.floor/ceil row-wise — same IEEE operation)
        flo0 = b["minlon"].to_numpy(zero_copy_only=False)[tagged] * 100
        flo1 = b["maxlon"].to_numpy(zero_copy_only=False)[tagged] * 100
        fla0 = b["minlat"].to_numpy(zero_copy_only=False)[tagged] * 100
        fla1 = b["maxlat"].to_numpy(zero_copy_only=False)[tagged] * 100
        for arr in (flo0, flo1, fla0, fla1):
            if not np.isfinite(arr).all():  # loud, like the old per-row loop
                raise ValueError("non-finite bbox value in tagged way row")
        lo0 = np.floor(flo0).astype(np.int64)
        lo1 = np.ceil(flo1).astype(np.int64)
        la0 = np.floor(fla0).astype(np.int64)
        la1 = np.ceil(fla1).astype(np.int64)
        ny = la1 - la0 + 1
        counts = (lo1 - lo0 + 1) * ny
        w = np.repeat(np.arange(len(counts)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        off = np.arange(int(counts.sum())) - starts[w]
        x = lo0[w] + off // ny[w]
        y = la0[w] + off % ny[w]
        _, idx = np.unique(_cell_key(x, y), return_index=True)  # batch combiner
        return pa.table({"klng": pa.array(x[idx]), "klat": pa.array(y[idx])})

    cells = (ways_ds.map_batches(explode_dedup, batch_format="pyarrow")
             .groupby(["klng", "klat"]).aggregate(Count(alias_name="c"))
             .drop_columns(["c"]))

    def add_stripe(b: pa.Table) -> pa.Table:
        stripe = (b["klng"].to_numpy(zero_copy_only=False)
                  // RASTER_STRIPE_W).astype(np.int64)
        return b.replace_schema_metadata(None).append_column(
            "stripe", pa.array(stripe))

    def local_cc(df: pd.DataFrame) -> pa.Table:
        x = df["klng"].to_numpy(np.int64)
        y = df["klat"].to_numpy(np.int64)
        key = _cell_key(x, y)
        order = np.argsort(key)
        x, y, key = x[order], y[order], key[order]
        n = len(key)
        # neighbor edges inside the stripe: (x+1,y) stays in-stripe only off
        # the seam, but a missed seam edge is exactly what step 2 re-adds
        es, ed = [], []
        for nk in (_cell_key(x + 1, y), _cell_key(x, y + 1)):
            pos = np.searchsorted(key, nk)
            ok = pos < n
            ok[ok] &= key[pos[ok]] == nk[ok]
            es.append(np.nonzero(ok)[0])
            ed.append(pos[ok])
        es = np.concatenate(es)
        ed = np.concatenate(ed)
        lab = np.arange(n, dtype=np.int64)
        while True:  # min-label propagation + pointer jumping
            l2 = lab.copy()
            np.minimum.at(l2, ed, lab[es])
            np.minimum.at(l2, es, lab[ed])
            l2 = l2[l2]
            if np.array_equal(l2, lab):
                break
            lab = l2
        return pa.table({"klng": pa.array(x), "klat": pa.array(y),
                         "root": pa.array(key[lab])})

    labeled = (cells.map_batches(add_stripe, batch_format="pyarrow")
               .groupby("stripe").map_groups(local_cc, batch_format="pandas")
               .materialize())  # grid-bounded; read twice below

    def boundary_only(b: pa.Table) -> pa.Table:
        x = b["klng"].to_numpy(zero_copy_only=False)
        m = np.isin(x % RASTER_STRIPE_W, (0, RASTER_STRIPE_W - 1))
        return b.filter(pa.array(m))

    bnd = labeled.map_batches(boundary_only, batch_format="pyarrow").to_pandas()

    # driver-side seam union-find over O(boundary cells) roots
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            hi, lo = max(ra, rb), min(ra, rb)
            parent[hi] = lo

    bx = bnd["klng"].to_numpy(np.int64)
    by = bnd["klat"].to_numpy(np.int64)
    br = bnd["root"].to_numpy(np.int64)
    is_right = bx % RASTER_STRIPE_W == 0  # leftmost column of its stripe
    right = {int(k): int(r) for k, r in
             zip(_cell_key(bx[is_right], by[is_right]), br[is_right])}
    seam = bx % RASTER_STRIPE_W == RASTER_STRIPE_W - 1
    for k, r in zip(_cell_key(bx[seam] + 1, by[seam]), br[seam]):
        nb = right.get(int(k))
        if nb is not None:
            union(int(r), nb)
    remap = {a: find(a) for a in parent}
    remap_ref = ray.put(remap)

    def relabel_partial(b: pa.Table) -> pa.Table:
        from .common import cached_get

        rm = cached_get(remap_ref)
        root = pd.Series(b["root"].to_numpy(zero_copy_only=False))
        comp = root.map(rm).fillna(root).astype(np.int64)
        df = pd.DataFrame({"comp": comp,
                           "x": b["klng"].to_numpy(zero_copy_only=False),
                           "y": b["klat"].to_numpy(zero_copy_only=False)})
        g = df.groupby("comp", sort=False).agg(
            n_cells=("x", "size"), min_klng=("x", "min"), max_klng=("x", "max"),
            min_klat=("y", "min"), max_klat=("y", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_RASTER_PARTIAL_SCHEMA).replace_schema_metadata(None)

    agg = labeled.map_batches(relabel_partial, batch_format="pyarrow").groupby(
        "comp").aggregate(
        Sum("n_cells", alias_name="n_cells"),
        Min("min_klng", alias_name="min_klng"),
        Max("max_klng", alias_name="max_klng"),
        Min("min_klat", alias_name="min_klat"),
        Max("max_klat", alias_name="max_klat"))

    def decode(b: pa.Table) -> pa.Table:
        comp = b["comp"].to_numpy(zero_copy_only=False)
        out = pa.table({
            "comp_klng": pa.array(comp // _KMUL - _KOFF_X),
            "comp_klat": pa.array(comp % _KMUL - _KOFF_Y),
            "n_cells": b["n_cells"], "min_klng": b["min_klng"],
            "max_klng": b["max_klng"], "min_klat": b["min_klat"],
            "max_klat": b["max_klat"],
        })
        return out

    return agg.map_batches(decode, batch_format="pyarrow")


_RASTER_PARTIAL_SCHEMA = pa.schema([
    ("comp", pa.int64()), ("n_cells", pa.int64()),
    ("min_klng", pa.int64()), ("max_klng", pa.int64()),
    ("min_klat", pa.int64()), ("max_klat", pa.int64()),
])


def vectorize_raster_sql(ways_path: str) -> str:
    """Transitive-closure oracle: reach(node, r) enumerates every cell
    reachable from every cell (the UNION dedups per recursion level), label
    = min reachable key — exact, viable at gate scale."""
    key = (f"(klng + {_KOFF_X}) * {_KMUL} + (klat + {_KOFF_Y})")
    return f"""
WITH RECURSIVE
w AS (SELECT minlat, minlon, maxlat, maxlon
      FROM read_parquet('{ways_path}') WHERE tagged),
x AS (SELECT minlat, maxlat,
             unnest(generate_series(CAST(floor(minlon * 100) AS BIGINT),
                                    CAST(ceil(maxlon * 100) AS BIGINT))) AS klng
      FROM w),
xy AS (SELECT klng,
              unnest(generate_series(CAST(floor(minlat * 100) AS BIGINT),
                                     CAST(ceil(maxlat * 100) AS BIGINT))) AS klat
       FROM x),
cells AS (SELECT DISTINCT klng, klat FROM xy),
k AS (SELECT klng, klat, {key} AS key FROM cells),
e AS (
  SELECT a.key AS src, b.key AS dst FROM k a
  JOIN k b ON b.klng = a.klng + 1 AND b.klat = a.klat
  UNION ALL
  SELECT a.key, b.key FROM k a
  JOIN k b ON b.klng = a.klng AND b.klat = a.klat + 1
),
eu AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
reach(node, r) AS (
  SELECT key, key FROM k
  UNION
  SELECT eu.dst, reach.r FROM reach JOIN eu ON reach.node = eu.src
),
lbl AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
cl AS (SELECT k.klng, k.klat, lbl.comp FROM k JOIN lbl ON k.key = lbl.node)
SELECT comp // {_KMUL} - {_KOFF_X} AS comp_klng,
       comp % {_KMUL} - {_KOFF_Y} AS comp_klat,
       count(*)::BIGINT AS n_cells,
       min(klng)::BIGINT AS min_klng, max(klng)::BIGINT AS max_klng,
       min(klat)::BIGINT AS min_klat, max(klat)::BIGINT AS max_klat
FROM cl GROUP BY 1, 2
"""


# --- per-county polyline length stats (integer fix6 L1 meters) ---------------
# The reference measures "Manhattan meters" as (|dlat| + |dlon|) * 100,000
# m/deg (js/geo.js:23 DEGREES_TO_METERS); over fix6 integer coordinates
# (floor(x*1e6 + 0.5), js round — functions/scalar.fix6) a segment's L1
# length in MICRODEGREES is exact int64, so the county aggregate never sums
# floats (0.1 m per unit when a reader wants meters).


def way_l1_lengths(ways_ds):
    """Per-county length census of the tagged road network: way count, total
    and max per-way L1 polyline length in fix6 microdegrees.

    Shape: the vertex lists never explode into per-point rows — each batch
    flattens its Arrow list columns zero-copy, takes one np.diff over the
    flattened fix6 coords with cross-way positions zeroed, reduceat-sums per
    way, and emits ONE partial row per county; the only exchange is the
    final tiny (county) groupby."""
    from ray.data.aggregate import Max, Sum

    part_schema = pa.schema([("county", pa.string()), ("n_ways", pa.int64()),
                             ("total_l1_udeg", pa.int64()),
                             ("max_l1_udeg", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(b["tagged"])
        if t.num_rows == 0:
            return part_schema.empty_table()
        lats = t["lats"].combine_chunks()
        lons = t["lons"].combine_chunks()
        lens = np.asarray(lats.value_lengths(), dtype=np.int64)
        la6 = np.floor(np.asarray(lats.flatten(), dtype=np.float64) * 1e6
                       + 0.5).astype(np.int64)
        lo6 = np.floor(np.asarray(lons.flatten(), dtype=np.float64) * 1e6
                       + 0.5).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)])
        if len(la6) == 0:
            way_sum = np.zeros(len(lens), dtype=np.int64)
        else:
            d = np.abs(np.diff(la6)) + np.abs(np.diff(lo6))
            # zero the diffs that straddle two ways, then segment-sum;
            # reduceat needs strictly valid starts, so clip boundary indices
            # into range and zero out degenerate (<2 point) ways after
            cross = starts[1:-1] - 1
            d[cross[(cross >= 0) & (cross < len(d))]] = 0
            idx = np.minimum(starts[:-1], max(len(d) - 1, 0))
            way_sum = np.add.reduceat(d, idx) if len(d) else np.zeros(
                len(lens), dtype=np.int64)
            way_sum[lens < 2] = 0
            # a way starting at the last diff index shares reduceat output
            # with its predecessor only when it has <2 points — zeroed above
        g = (pd.DataFrame({"county": t["county"].to_pandas(),
                           "l1": way_sum})
             .groupby("county", sort=False)["l1"]
             .agg(n_ways="size", total_l1_udeg="sum", max_l1_udeg="max")
             .reset_index())
        return pa.Table.from_pandas(
            g.astype({"n_ways": np.int64, "total_l1_udeg": np.int64,
                      "max_l1_udeg": np.int64}),
            preserve_index=False, schema=part_schema).replace_schema_metadata(None)

    return (ways_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("county")
            .aggregate(Sum("n_ways", alias_name="n_ways"),
                       Sum("total_l1_udeg", alias_name="total_l1_udeg"),
                       Max("max_l1_udeg", alias_name="max_l1_udeg")))


def way_l1_lengths_sql(ways_path: str) -> str:
    return f"""
WITH pts AS (
  SELECT county, way_id, i AS idx,
         CAST(floor(lats[i] * 1000000 + 0.5) AS BIGINT) AS la6,
         CAST(floor(lons[i] * 1000000 + 0.5) AS BIGINT) AS lo6
  FROM read_parquet('{ways_path}'),
       UNNEST(generate_series(1, len(lats))) AS u(i)
  WHERE tagged
),
seg AS (
  SELECT county, way_id,
         abs(la6 - lag(la6) OVER w) + abs(lo6 - lag(lo6) OVER w) AS d
  FROM pts WINDOW w AS (PARTITION BY way_id ORDER BY idx)
),
wl AS (SELECT county, way_id, COALESCE(SUM(d), 0)::BIGINT AS l1
       FROM seg GROUP BY 1, 2)
SELECT county, COUNT(*)::BIGINT AS n_ways, SUM(l1)::BIGINT AS total_l1_udeg,
       MAX(l1)::BIGINT AS max_l1_udeg
FROM wl GROUP BY county
"""


def _flat6(t: pa.Table):
    """Flatten a ways batch's vertex lists zero-copy into fix6 int arrays +
    per-way lengths/starts (shared by the length/bearing kernels)."""
    lats = t["lats"].combine_chunks()
    lons = t["lons"].combine_chunks()
    lens = np.asarray(lats.value_lengths(), dtype=np.int64)
    la6 = np.floor(np.asarray(lats.flatten(), dtype=np.float64) * 1e6
                   + 0.5).astype(np.int64)
    lo6 = np.floor(np.asarray(lons.flatten(), dtype=np.float64) * 1e6
                   + 0.5).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)])
    return la6, lo6, lens, starts


def way_bearing_octants(ways_ds):
    """Per-county segment-bearing census in 8 integer-exact compass classes.

    True 22.5-degree compass octants need tan(22.5) and floats; instead each
    non-degenerate segment classifies by SIGNS and the |dlat| vs |dlon|
    comparison — boundaries at the axes and 45-degree diagonals, exact in
    int64 and reproduced verbatim by the SQL CASE.  Encoding:
    ``octant = 4*(dlat < 0) + 2*(dlon < 0) + (|dlat| > |dlon|)`` (0-7);
    zero-length segments (both deltas 0 after fix6) are dropped on both
    sides.  One partial row per (county, octant) per batch; the only
    exchange is the tiny final groupby."""
    from ray.data.aggregate import Sum

    part_schema = pa.schema([("county", pa.string()), ("octant", pa.int64()),
                             ("n_segs", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(b["tagged"])
        if t.num_rows == 0:
            return part_schema.empty_table()
        la6, lo6, lens, starts = _flat6(t)
        if len(la6) < 2:
            return part_schema.empty_table()
        dla = np.diff(la6)
        dlo = np.diff(lo6)
        valid = np.ones(len(dla), dtype=bool)
        cross = starts[1:-1] - 1
        valid[cross[(cross >= 0) & (cross < len(dla))]] = False
        valid &= (dla != 0) | (dlo != 0)
        octant = (4 * (dla < 0).astype(np.int64)
                  + 2 * (dlo < 0).astype(np.int64)
                  + (np.abs(dla) > np.abs(dlo)).astype(np.int64))
        # diff i spans flattened points (i, i+1); for the surviving
        # within-way diffs both points share a way, so the point-aligned
        # county repeat (sliced to diff length) labels every valid diff
        county_pt = np.repeat(np.asarray(t["county"].to_pylist(),
                                         dtype=object), lens)
        g = (pd.DataFrame({"county": county_pt[:-1][valid],
                           "octant": octant[valid]})
             .groupby(["county", "octant"], sort=False).size()
             .reset_index(name="n_segs"))
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=part_schema).replace_schema_metadata(None)

    return (ways_ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["county", "octant"])
            .aggregate(Sum("n_segs", alias_name="n_segs")))


def way_bearing_octants_sql(ways_path: str) -> str:
    return f"""
WITH pts AS (
  SELECT county, way_id, i AS idx,
         CAST(floor(lats[i] * 1000000 + 0.5) AS BIGINT) AS la6,
         CAST(floor(lons[i] * 1000000 + 0.5) AS BIGINT) AS lo6
  FROM read_parquet('{ways_path}'),
       UNNEST(generate_series(1, len(lats))) AS u(i)
  WHERE tagged
),
seg AS (
  SELECT county,
         la6 - lag(la6) OVER w AS dla,
         lo6 - lag(lo6) OVER w AS dlo
  FROM pts WINDOW w AS (PARTITION BY way_id ORDER BY idx)
)
SELECT county,
       (4 * CASE WHEN dla < 0 THEN 1 ELSE 0 END
      + 2 * CASE WHEN dlo < 0 THEN 1 ELSE 0 END
      + CASE WHEN abs(dla) > abs(dlo) THEN 1 ELSE 0 END)::BIGINT AS octant,
       count(*)::BIGINT AS n_segs
FROM seg
WHERE dla IS NOT NULL AND (dla <> 0 OR dlo <> 0)
GROUP BY 1, 2
"""


# --- polygon shoelace area census --------------------------------------------
def boundary_areas(bounds_ds):
    """Per-ring shoelace area over the boundary polygons — the polygon-
    geometry AGGREGATE next to the PIP/city-tag ops (J4/T3 consume these
    same polygons as lookup state; this op measures them).  Emits twice the
    SIGNED ring area in (micro-degree)^2 as an EXACT int64: coordinates
    snap to micro-degrees with the shared JS floor(x*1e6 + 0.5) rounding,
    so every cross product is integer (< 2^56) and the sum is
    order-insensitive — bit-exact vs the DuckDB list-lambda oracle.
    Degenerate (<2 point) rings yield NULL, mirroring list_sum([]).

    Scale shape: row-local (one JSON parse + one numpy shoelace per
    polygon), zero shuffle, no state."""
    import json

    _S = pa.schema([("name", pa.string()), ("kind", pa.string()),
                    ("ring", pa.int64()), ("area2_udeg", pa.int64())])

    def shoelace(b: pa.Table) -> pa.Table:
        names, kinds, rings, areas = [], [], [], []
        for name, kind, gj in zip(b["name"].to_pylist(),
                                  b["kind"].to_pylist(),
                                  b["geom_json"].to_pylist()):
            for ri, ring in enumerate(json.loads(gj), 1):
                names.append(name)
                kinds.append(kind)
                rings.append(ri)
                if len(ring) < 2:
                    areas.append(None)  # list_sum([]) is NULL
                    continue
                pts = np.asarray(ring, dtype=np.float64)
                x = np.floor(pts[:, 0] * 1e6 + 0.5).astype(np.int64)
                y = np.floor(pts[:, 1] * 1e6 + 0.5).astype(np.int64)
                areas.append(int(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))
        return pa.table({"name": pa.array(names, pa.string()),
                         "kind": pa.array(kinds, pa.string()),
                         "ring": pa.array(rings, pa.int64()),
                         "area2_udeg": pa.array(areas, pa.int64())}).cast(_S)

    return bounds_ds.map_batches(shoelace, batch_format="pyarrow")


def boundary_areas_sql(bounds_path: str) -> str:
    xi = lambda p: f"CAST(floor({p}[1]*1000000 + 0.5) AS BIGINT)"
    yi = lambda p: f"CAST(floor({p}[2]*1000000 + 0.5) AS BIGINT)"
    return f"""
WITH b AS (
  SELECT name, kind, CAST(geom_json AS DOUBLE[][][]) AS g
  FROM read_parquet('{bounds_path}')
), r AS (
  SELECT name, kind, g, unnest(generate_series(1, len(g))) AS ring FROM b
)
SELECT name, kind, ring::BIGINT AS ring,
       CAST(list_sum(list_transform(range(1, len(g[ring])), i ->
           {xi('g[ring][i]')} * {yi('g[ring][i+1]')}
         - {xi('g[ring][i+1]')} * {yi('g[ring][i]')})) AS BIGINT)
         AS area2_udeg
FROM r
"""


# ---------------------------------------------------------------------------
# vector -> raster (the counterpart of vectorize_raster): exact segment
# SUPERCOVER rasterization.  The bbox cover that feeds the geometric join
# (cell_population, js/gpsBins.js:94-116) over-covers long diagonal ways by
# O(span^2 / span) cells; the supercover touches only the cells the segment
# geometry actually passes through — the honest raster at 100 TB, and the
# cheap one (candidate cells per segment are its bbox cells; the exact test
# trims the corners).

RASTER_CELL_UDEG = 10_000  # 0.01 deg in integer microdegrees


def rasterize_ways(ways_ds):
    """Exact segment-supercover raster over the 0.01-degree grid.

    Per tagged way, every consecutive-vertex segment is snapped to integer
    microdegrees (the shared floor(x*1e6 + 0.5) rounding, so engine and
    oracle agree bit-for-bit) and tested against every candidate grid cell
    with the standard exact segment-vs-AABB predicate: the cell's closed
    square overlaps the segment bbox by candidate construction, and the
    segment's supporting line straddles-or-touches the square iff the four
    integer corner cross-products are not all of one strict sign.  All
    arithmetic is int64 (|cross| <= 3.6e8 * 3.6e8 < 2^63), so the hit set is
    deterministic on any platform and equals the DuckDB oracle's exactly.

    Output per occupied cell: (klng, klat, n_ways, n_segments) where n_ways
    counts distinct tagged ways crossing the cell and n_segments counts
    segment-cell incidences.  Scale shape: one stateless vectorized explode
    (each way is one row, so per-batch (cell, way) rows are globally unique
    already) below ONE grid-bounded groupby — the same bound as
    vectorize_raster: output cardinality is capped by the GRID, not the
    input.
    """
    from ray.data.aggregate import Count, Sum

    S = RASTER_CELL_UDEG

    def explode(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tagged = pc.fill_null(b["tagged"], False).to_numpy(zero_copy_only=False)
        lats = b["lats"].filter(pa.array(tagged))
        lons = b["lons"].filter(pa.array(tagged))
        way_ids = b["way_id"].to_numpy(zero_copy_only=False)[tagged]
        nb = len(way_ids)
        empty = pa.table({"klng": pa.array([], pa.int64()),
                          "klat": pa.array([], pa.int64()),
                          "way_id": pa.array([], pa.int64()),
                          "n_seg": pa.array([], pa.int64())})
        if nb == 0:
            return empty
        la = pc.list_flatten(lats).to_numpy(zero_copy_only=False)
        lo = pc.list_flatten(lons).to_numpy(zero_copy_only=False)
        npts = pc.list_value_length(lats).to_numpy(zero_copy_only=False).astype(np.int64)
        X = np.floor(lo * 1e6 + 0.5).astype(np.int64)
        Y = np.floor(la * 1e6 + 0.5).astype(np.int64)
        # segment start positions: every flat index that is not the last
        # vertex of its way
        starts = np.concatenate(([0], np.cumsum(npts)[:-1]))
        flat_way = np.repeat(np.arange(nb), npts)
        is_last = np.zeros(len(X), dtype=bool)
        is_last[starts + npts - 1] = True
        s_idx = np.nonzero(~is_last)[0]
        if len(s_idx) == 0:
            return empty
        x0, y0 = X[s_idx], Y[s_idx]
        x1, y1 = X[s_idx + 1], Y[s_idx + 1]
        wloc = flat_way[s_idx]
        mnx, mxx = np.minimum(x0, x1), np.maximum(x0, x1)
        mny, mxy = np.minimum(y0, y1), np.maximum(y0, y1)
        # cells whose CLOSED square overlaps the segment bbox:
        # cx_min = ceil(mnx/S) - 1, cx_max = floor(mxx/S)
        cx_min = -((-mnx) // S) - 1
        cx_max = mxx // S
        cy_min = -((-mny) // S) - 1
        cy_max = mxy // S
        ncx = cx_max - cx_min + 1
        ncy = cy_max - cy_min + 1
        counts = ncx * ncy
        p = np.repeat(np.arange(len(counts)), counts)
        off = np.arange(int(counts.sum())) - np.concatenate(
            ([0], np.cumsum(counts)[:-1]))[p]
        cx = cx_min[p] + off // ncy[p]
        cy = cy_min[p] + off % ncy[p]
        dx = (x1 - x0)[p]
        dy = (y1 - y0)[p]
        bx = cx * S - x0[p]
        by = cy * S - y0[p]
        s00 = dx * by - dy * bx
        s10 = dx * by - dy * (bx + S)
        s01 = dx * (by + S) - dy * bx
        s11 = dx * (by + S) - dy * (bx + S)
        lo4 = np.minimum(np.minimum(s00, s10), np.minimum(s01, s11))
        hi4 = np.maximum(np.maximum(s00, s10), np.maximum(s01, s11))
        keep = (lo4 <= 0) & (hi4 >= 0)
        ck = _cell_key(cx[keep], cy[keep])
        combined = ck * nb + wloc[p][keep]
        uniq, n_seg = np.unique(combined, return_counts=True)
        uck = uniq // nb
        return pa.table({
            "klng": pa.array(uck // _KMUL - _KOFF_X),
            "klat": pa.array(uck % _KMUL - _KOFF_Y),
            "way_id": pa.array(way_ids[uniq % nb]),
            "n_seg": pa.array(n_seg.astype(np.int64)),
        })

    return (ways_ds.map_batches(explode, batch_format="pyarrow")
            .groupby(["klng", "klat"])
            .aggregate(Count(alias_name="n_ways"),
                       Sum("n_seg", alias_name="n_segments")))


def rasterize_ways_sql(ways_path: str) -> str:
    """Same snap, candidate range and integer corner predicate in DuckDB
    (`//` truncates toward zero there, so floor division is spelled
    floor(x / S.0) — exact: the operands are integers below 2^53)."""
    S = RASTER_CELL_UDEG
    return f"""
WITH w AS (
  SELECT way_id, lats, lons, len(lats) AS n
  FROM read_parquet('{ways_path}') WHERE tagged AND len(lats) >= 2
), seg0 AS (
  SELECT way_id, unnest(generate_series(1, n - 1)) AS i, lats, lons FROM w
), seg AS (
  SELECT way_id,
         CAST(floor(lons[i] * 1000000 + 0.5) AS BIGINT) AS x0,
         CAST(floor(lats[i] * 1000000 + 0.5) AS BIGINT) AS y0,
         CAST(floor(lons[i + 1] * 1000000 + 0.5) AS BIGINT) AS x1,
         CAST(floor(lats[i + 1] * 1000000 + 0.5) AS BIGINT) AS y1
  FROM seg0
), rng AS (
  SELECT *, least(x0, x1) AS mnx, greatest(x0, x1) AS mxx,
            least(y0, y1) AS mny, greatest(y0, y1) AS mxy
  FROM seg
), cx AS (
  SELECT way_id, x0, y0, x1, y1, mny, mxy,
         unnest(generate_series(-CAST(floor(-mnx / {S}.0) AS BIGINT) - 1,
                                CAST(floor(mxx / {S}.0) AS BIGINT))) AS klng
  FROM rng
), cand AS (
  SELECT way_id, x0, y0, x1, y1, klng,
         unnest(generate_series(-CAST(floor(-mny / {S}.0) AS BIGINT) - 1,
                                CAST(floor(mxy / {S}.0) AS BIGINT))) AS klat
  FROM cx
), sided AS (
  SELECT way_id, klng, klat,
         (x1 - x0) * (klat * {S} - y0) - (y1 - y0) * (klng * {S} - x0) AS s00,
         (x1 - x0) * (klat * {S} - y0) - (y1 - y0) * ((klng + 1) * {S} - x0) AS s10,
         (x1 - x0) * ((klat + 1) * {S} - y0) - (y1 - y0) * (klng * {S} - x0) AS s01,
         (x1 - x0) * ((klat + 1) * {S} - y0) - (y1 - y0) * ((klng + 1) * {S} - x0) AS s11
  FROM cand
), hit AS (
  SELECT way_id, klng, klat FROM sided
  WHERE least(s00, s10, s01, s11) <= 0 AND greatest(s00, s10, s01, s11) >= 0
), per_way AS (
  SELECT klng, klat, way_id, count(*)::BIGINT AS n_seg FROM hit GROUP BY 1, 2, 3
)
SELECT klng, klat, count(*)::BIGINT AS n_ways, sum(n_seg)::BIGINT AS n_segments
FROM per_way GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# geometry simplification (tile-serving LoD): one-pass integer area stencil.

SIMPLIFY_CROSS_MIN = 1_000_000  # |2A| threshold in microdeg^2


def simplify_ways(ways_ds):
    """Area-stencil polyline simplification — the map-only LoD pass a tile
    server runs before rendering low zooms.

    Vertices snap to integer microdegrees (shared floor(x*1e6+0.5) snap);
    an INTERIOR vertex survives iff twice the area of its original-neighbor
    triangle |cross(p_{i-1}, p_i, p_{i+1})| >= {SIMPLIFY_CROSS_MIN} udeg^2;
    endpoints always survive.  One pass over ORIGINAL neighbors (a
    deterministic stencil, not iterative Douglas-Peucker) keeps the kernel
    row-local and bit-exact vs SQL: all arithmetic is int64 (|cross| <=
    2 * 3.6e8^2 < 2^63).  Output per way: vertex counts and an md5 of the
    surviving snapped polyline, so the oracle hash pins the exact kept set.
    Zero shuffle: each way is one row."""
    return ways_ds.map_batches(simplify_batch, batch_format="pyarrow")


def simplify_batch(b: pa.Table) -> pa.Table:
    """simplify_ways' row-local kernel (module-level so the property tests
    drive it without a Ray execution)."""
    import hashlib

    import pyarrow.compute as pc

    lats = b["lats"]
    lons = b["lons"]
    la = pc.list_flatten(lats).to_numpy(zero_copy_only=False)
    lo = pc.list_flatten(lons).to_numpy(zero_copy_only=False)
    npts = pc.list_value_length(lats).to_numpy(
        zero_copy_only=False).astype(np.int64)
    X = np.floor(lo * 1e6 + 0.5).astype(np.int64)
    Y = np.floor(la * 1e6 + 0.5).astype(np.int64)
    n_tot = len(X)
    starts = np.concatenate(([0], np.cumsum(npts)[:-1]))
    ends = starts + npts - 1
    is_end = np.zeros(n_tot, dtype=bool)
    is_end[starts[npts > 0]] = True
    is_end[ends[npts > 0]] = True
    keep = is_end.copy()
    interior = ~is_end
    ii = np.nonzero(interior)[0]
    if len(ii):
        cross = ((X[ii] - X[ii - 1]) * (Y[ii + 1] - Y[ii - 1])
                 - (Y[ii] - Y[ii - 1]) * (X[ii + 1] - X[ii - 1]))
        keep[ii] = np.abs(cross) >= SIMPLIFY_CROSS_MIN
    way_ids = b["way_id"].to_numpy(zero_copy_only=False)
    md5s, n_kept = [], []
    for w in range(len(way_ids)):
        s, e = starts[w], starts[w] + npts[w]
        k = np.nonzero(keep[s:e])[0] + s
        n_kept.append(len(k))
        poly = ";".join(f"{X[j]},{Y[j]}" for j in k)
        md5s.append(hashlib.md5(poly.encode()).hexdigest())
    return pa.table({
        "way_id": b["way_id"],
        "n_points": pa.array(npts),
        "n_kept": pa.array(np.array(n_kept, dtype=np.int64)),
        "kept_md5": pa.array(md5s, pa.string()),
    })


def simplify_ways_sql(ways_path: str) -> str:
    T = SIMPLIFY_CROSS_MIN
    xi = "CAST(floor(lons[{j}]*1000000 + 0.5) AS BIGINT)"
    yi = "CAST(floor(lats[{j}]*1000000 + 0.5) AS BIGINT)"
    x = lambda j: xi.format(j=j)
    y = lambda j: yi.format(j=j)
    return f"""
WITH w AS (
  SELECT way_id, lats, lons, len(lats) AS n FROM read_parquet('{ways_path}')
), k AS (
  SELECT way_id, n, lats, lons,
         list_filter(range(1, n + 1), i -> i = 1 OR i = n OR
           abs(({x('i')} - {x('i-1')}) * ({y('i+1')} - {y('i-1')})
             - ({y('i')} - {y('i-1')}) * ({x('i+1')} - {x('i-1')})) >= {T})
         AS kept
  FROM w
)
SELECT way_id, n::BIGINT AS n_points, len(kept)::BIGINT AS n_kept,
       md5(array_to_string(list_transform(kept, i ->
           {x('i')}::VARCHAR || ',' || {y('i')}::VARCHAR), ';')) AS kept_md5
FROM k
"""


# ---------------------------------------------------------------------------
# boundary topology: polygon adjacency via shared snapped vertices.

def boundary_adjacency(bounds_ds):
    """Pairs of boundary polygons sharing >= 1 snapped vertex (integer
    microdegrees, the shared floor(x*1e6+0.5) snap) — the topology census
    that validates a boundary file (cities tile their county: every city
    should touch its county's ring or a sibling).

    Shape: explode every ring vertex to (vertex_key, name), one
    vertex-keyed groupby, pairs emitted per group (groups are tiny — a
    vertex is shared by a handful of polygons), then a pair-keyed count.
    Orientation name_a < name_b dedups the symmetric pair."""
    import itertools
    import json

    def explode(b: pa.Table) -> pa.Table:
        names, keys = [], []
        for name, gj in zip(b["name"].to_pylist(), b["geom_json"].to_pylist()):
            rings = json.loads(gj)
            seen = set()
            for ring in rings:
                for x, y in ring:
                    k = (int(np.floor(x * 1e6 + 0.5)) * 400_000_000
                         + int(np.floor(y * 1e6 + 0.5)))
                    if k not in seen:
                        seen.add(k)
                        names.append(name)
                        keys.append(k)
        return pa.table({"vkey": pa.array(keys, pa.int64()),
                         "name": pa.array(names, pa.string())})

    def pairs(df: pd.DataFrame) -> pa.Table:
        a_out, b_out = [], []
        for _, g in df.groupby("vkey", sort=False):
            ns = sorted(set(g["name"]))
            for x, y in itertools.combinations(ns, 2):
                a_out.append(x)
                b_out.append(y)
        return pa.table({"name_a": pa.array(a_out, pa.string()),
                         "name_b": pa.array(b_out, pa.string())})

    from ray.data.aggregate import Count

    return (bounds_ds.map_batches(explode, batch_format="pyarrow")
            .groupby("vkey").map_groups(pairs, batch_format="pandas")
            .groupby(["name_a", "name_b"])
            .aggregate(Count(alias_name="n_shared")))


def boundary_adjacency_sql(bounds_path: str) -> str:
    return f"""
WITH b AS (
  SELECT name, CAST(geom_json AS DOUBLE[][][]) AS g
  FROM read_parquet('{bounds_path}')
), v0 AS (
  SELECT name, unnest(g) AS ring FROM b
), v1 AS (
  SELECT name, unnest(ring) AS pt FROM v0
), v AS (
  SELECT DISTINCT name,
         CAST(floor(pt[1] * 1000000 + 0.5) AS BIGINT) * 400000000
           + CAST(floor(pt[2] * 1000000 + 0.5) AS BIGINT) AS vkey
  FROM v1
)
SELECT a.name AS name_a, b.name AS name_b, count(*)::BIGINT AS n_shared
FROM v a JOIN v b ON a.vkey = b.vkey AND a.name < b.name
GROUP BY 1, 2
"""
