"""Shared-node intersection path: the distributed re-expression of
``findintersections`` (js/geo.js:1136-1223) and its coalescing chain
(A2 averageJunctionDuplicates, A4/A5 averageNearbyBoulevardDuplicates,
A6 removeJUNCTIONS, A7 suffix disambiguation — js/geo.js:738-1069).

Shuffle plan (SURVEY.md section 7):

1. explode wayData -> (node, name, rank) rows and tagged ways ->
   (node, way_id, way_rank, highway) rows, unioned into one stream;
2. ``groupby(bucket(node))`` — ONE hash shuffle keyed by node; inside each
   bucket the per-node logic runs vectorized in pandas (not per-node Python
   groups: buckets keep the group-call overhead off the hot path);
3. ``groupby(bucket(streets-base))`` — a second, much smaller shuffle over
   intersection candidates for the order-sensitive ``_2.._9`` suffixing;
4. ``groupby(bucket(streets))`` for the coalescing chain; groups are tiny
   (2-10 rows) by construction.

Order dependence is carried in explicit rank columns: ``emit_rank`` is the
(min) lexicographic (data_rank, position-in-way) of the node's first
appearance in the wayData scan — exactly the JS Map insertion order the
reference iterates in.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.scalar import (
    JUNCTION,
    MOTORWAY,
    MOTORWAY_LINK,
    clean_streets,
    dist_l1_m,
)
from .common import POS_BITS

SEP = "\x00"

CAND_SCHEMA = pa.schema(
    [
        ("county", pa.string()),
        ("node", pa.int64()),
        ("emit_rank", pa.int64()),
        ("base", pa.string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("way_ids", pa.list_(pa.int64())),
    ]
)

INT_SCHEMA = pa.schema(
    [
        ("county", pa.string()),
        ("pos", pa.int64()),
        ("raw", pa.string()),
        ("streets", pa.string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("way_ids", pa.list_(pa.int64())),
        ("node_id", pa.int64()),
    ]
)


def explode_for_join(waydata_ds, ways_ds, n_buckets: int):
    """Union of the two node-keyed exploded streams with an int bucket key.

    Fully vectorized (Arrow list offsets + np.repeat).  The bucket key is
    ``node % n_buckets`` without the county — valid because OSM node ids are
    globally unique (a node belongs to exactly one county), so per-node
    groups inside a bucket never mix counties."""
    from .common import explode_lists

    def explode_names(b: pa.Table) -> pa.Table:
        a = explode_lists(b, ["nodes", "lats", "lons"],
                          ["county", "name", "data_rank"])
        node = a["nodes"]
        n = len(node)
        rank = (a["data_rank"].astype(np.int64) << POS_BITS) | a["pos"]
        return _exploded_table_np(
            bkey=node % n_buckets, county=a["county"], node=node,
            role=np.zeros(n, np.int8), name=a["name"], rank=rank,
            lat=a["lats"], lon=a["lons"],
            way_rank=np.full(n, -1, np.int32), way_id=np.full(n, -1, np.int64),
            highway=np.full(n, None, object))

    def explode_ways(b: pa.Table) -> pa.Table:
        b = b.filter(b["tagged"].combine_chunks()
                     if isinstance(b["tagged"], pa.ChunkedArray) else b["tagged"])
        a = explode_lists(b, ["nodes"],
                          ["county", "way_rank", "way_id", "highway"])
        node = a["nodes"]
        # JS Set semantics: a way joins a node's way-set once (closed loops)
        keep = ~pd.DataFrame({"w": a["way_rank"], "n": node}).duplicated().to_numpy()
        node = node[keep]
        n = len(node)
        return _exploded_table_np(
            bkey=node % n_buckets, county=a["county"][keep], node=node,
            role=np.ones(n, np.int8), name=np.full(n, None, object),
            rank=np.zeros(n, np.int64),
            lat=np.full(n, np.nan), lon=np.full(n, np.nan),
            way_rank=a["way_rank"][keep].astype(np.int32),
            way_id=a["way_id"][keep].astype(np.int64),
            highway=a["highway"][keep])

    names_ds = waydata_ds.map_batches(explode_names, batch_format="pyarrow")
    ways_exp = ways_ds.map_batches(explode_ways, batch_format="pyarrow")
    return names_ds.union(ways_exp)


def _exploded_table_np(**cols) -> pa.Table:
    return pa.table(
        {
            "bkey": pa.array(cols["bkey"].astype(np.int64)),
            "county": pa.array(cols["county"], pa.string()),
            "node": pa.array(cols["node"].astype(np.int64)),
            "role": pa.array(cols["role"]),
            "name": pa.array(cols["name"], pa.string()),
            "rank": pa.array(cols["rank"].astype(np.int64)),
            "lat": pa.array(cols["lat"], pa.float64()),
            "lon": pa.array(cols["lon"], pa.float64()),
            "way_rank": pa.array(cols["way_rank"], pa.int32()),
            "way_id": pa.array(cols["way_id"], pa.int64()),
            "highway": pa.array(cols["highway"], pa.string()),
        }
    )


def eligible_nodes(exploded_ds):
    """Per-bucket vectorized J1+J5+J6: nodes touched by >=2 distinct wayData
    names, not all motorway_links, not all motorway(+links)."""

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        names = df[df["role"] == 0]
        ways = df[df["role"] == 1]
        nn = names.drop_duplicates(["node", "name"])
        cnt = nn.groupby("node", sort=False)["name"].nunique()
        multi = cnt[cnt > 1].index
        if len(multi) == 0:
            return CAND_SCHEMA.empty_table()
        nn = nn[nn["node"].isin(multi)]
        w = ways[ways["node"].isin(multi)]
        hw = w["highway"]
        not_all_links = (hw != MOTORWAY_LINK) | hw.isna()
        g = pd.DataFrame({"node": w["node"], "nal": not_all_links,
                          "aml": hw.isin([MOTORWAY, MOTORWAY_LINK])}).groupby("node", sort=False)
        flags = g.agg(nal=("nal", "any"), aml=("aml", "all"))
        ok_nodes = flags[(flags["nal"]) & (~flags["aml"])].index
        nn = nn[nn["node"].isin(ok_nodes)]
        if len(nn) == 0:
            return CAND_SCHEMA.empty_table()

        ok = names[names["node"].isin(ok_nodes)]
        nn_sorted = nn.sort_values(["node", "name"], kind="stable")
        base = nn_sorted.groupby("node", sort=False)["name"].agg("/".join)
        ranks = ok.groupby("node", sort=False)["rank"].min()
        first = ok.drop_duplicates("node").set_index("node")
        ww = w[w["node"].isin(ok_nodes)].sort_values(["node", "way_rank"], kind="stable")
        wids = ww.groupby("node", sort=False)["way_id"].agg(list)

        nodes = base.index.to_numpy()
        return pa.table(
            {
                "county": pa.array(first["county"].reindex(nodes).tolist(), pa.string()),
                "node": pa.array(nodes, pa.int64()),
                "emit_rank": pa.array(ranks.reindex(nodes).to_numpy().astype("int64")),
                "base": pa.array(base.tolist(), pa.string()),
                "lat": pa.array(first["lat"].reindex(nodes).to_numpy(), pa.float64()),
                "lon": pa.array(first["lon"].reindex(nodes).to_numpy(), pa.float64()),
                "way_ids": pa.array([[int(x) for x in xs] for xs in wids.reindex(nodes)],
                                    pa.list_(pa.int64())),
            }
        )

    return exploded_ds.groupby("bkey").map_groups(per_bucket, batch_format="pandas")


def suffixed(cands_ds, n_buckets: int):
    """A7 suffix disambiguation (js/geo.js:1174-1188): per (county, base),
    in emit_rank order: rank0 -> base, ranks 1..8 -> _2.._9; ranks >=9 silently
    overwrite the base entry (the LAST one wins) while keeping rank0's Map
    position.  Emits the intersection rows (post-``clean``) with ``pos`` =
    Map insertion order."""

    def add_key(b: pa.Table) -> pa.Table:
        key = [f"{c}{SEP}{zlib.crc32(s.encode()) % n_buckets}"
               for c, s in zip(b["county"].to_pylist(), b["base"].to_pylist())]
        return b.append_column("skey", pa.array(key, pa.string()))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        rows = {k: [] for k in ("county", "pos", "raw", "streets", "lat", "lon",
                                "way_ids", "node_id")}

        def emit(county, pos, raw, lat, lon, way_ids, node):
            rows["county"].append(county)
            rows["pos"].append(int(pos))
            rows["raw"].append(raw)
            rows["streets"].append(clean_streets(raw))
            rows["lat"].append(lat)
            rows["lon"].append(lon)
            rows["way_ids"].append([int(x) for x in way_ids])
            rows["node_id"].append(int(node))

        # fast path: (county, base) groups of size 1 (the vast majority) —
        # no suffixing, emitted as one vectorized Arrow table
        sizes = df.groupby(["county", "base"], sort=False)["emit_rank"].transform("size")
        singles = df[sizes == 1]
        fast_tbl = None
        if len(singles):
            bases = singles["base"].tolist()
            fast_tbl = pa.table({
                "county": pa.array(singles["county"].tolist(), pa.string()),
                "pos": pa.array(singles["emit_rank"].to_numpy(), pa.int64()),
                "raw": pa.array(bases, pa.string()),
                "streets": pa.array([clean_streets(s) for s in bases], pa.string()),
                "lat": pa.array(singles["lat"].to_numpy(), pa.float64()),
                "lon": pa.array(singles["lon"].to_numpy(), pa.float64()),
                "way_ids": pa.array(singles["way_ids"].tolist(), pa.list_(pa.int64())),
                "node_id": pa.array(singles["node"].to_numpy(), pa.int64()),
            }, schema=INT_SCHEMA)

        for (_, base), g in df[sizes > 1].groupby(["county", "base"], sort=False):
            g = g.sort_values("emit_rank", kind="stable")
            n = len(g)
            recs = g.to_dict("records")
            first = recs[0]
            # base entry: data from rank0 unless overwritten by ranks >=9
            base_src = first if n <= 9 else recs[-1]
            emit(first["county"], first["emit_rank"], base,
                 base_src["lat"], base_src["lon"], base_src["way_ids"], base_src["node"])
            for k in range(1, min(n, 9)):
                r = recs[k]
                emit(r["county"], r["emit_rank"], f"{base}_{k + 1}",
                     r["lat"], r["lon"], r["way_ids"], r["node"])
        slow_tbl = pa.table(rows, schema=INT_SCHEMA)
        if fast_tbl is None:
            return slow_tbl
        return pa.concat_tables([fast_tbl, slow_tbl])

    with_key = cands_ds.map_batches(add_key, batch_format="pyarrow")
    return with_key.groupby("skey").map_groups(per_bucket, batch_format="pandas")


class Coalescer:
    """Fused A2+A4+A5 per (county, streets) group (one shuffle): junction
    centroid averaging, then greedy 50 m distance clustering with dead-end
    case analysis (js/geo.js:738-766, 827-967).  Dead-end and same-way
    indexes are broadcast SmallState (read once per actor)."""

    def __init__(self, state_ref):
        from .common import cached_get

        st = cached_get(state_ref)
        self.dead_ends = st.dead_ends
        self.neighbors = st.neighbor_index

    def _is_dead(self, county, node) -> bool:
        return node in self.dead_ends.get(county, {})

    def _find_neighbor(self, county, recs, dead_node):
        sets = self.neighbors.get(county, {}).get(dead_node, [])
        for cand in recs:
            for ns in sets:
                if cand["node_id"] in ns:
                    return cand
        return None

    @staticmethod
    def _avg(members):
        lat_sum = lon_sum = 0.0
        way_ids, seen = [], set()
        for m in members:
            lat_sum += m["lat"]
            lon_sum += m["lon"]
            for w in m["way_ids"]:
                if w not in seen:
                    seen.add(w)
                    way_ids.append(int(w))
        f = dict(members[0])
        f.update(lat=lat_sum / len(members), lon=lon_sum / len(members), way_ids=way_ids)
        return f

    def _close_group(self, county, matches):
        if len(matches) <= 1:
            return list(matches)
        dead = sum(1 for m in matches if self._is_dead(county, m["node_id"]))
        if dead == 0:
            return [self._avg(matches)]
        if len(matches) == 2:
            if dead == 1:
                d = dist_l1_m(matches[0]["lat"], matches[0]["lon"],
                              matches[1]["lat"], matches[1]["lon"])
                return [self._avg(matches)] if d < 50 else list(matches)
            if dead == 2:
                return list(matches)
        out = []
        for m in matches:
            if self._is_dead(county, m["node_id"]):
                other = self._find_neighbor(county, matches, m["node_id"])
                if other is not None:
                    return out + [self._avg([other, m])]
                out.append(m)
        return out

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        # fast path: singleton non-JUNCTION streets groups pass through
        # untouched (the vast majority) — emitted as one vectorized table
        sizes = df.groupby(["county", "streets"], sort=False)["pos"].transform("size")
        is_junc = df["streets"].str.contains(JUNCTION, regex=False)
        fast = df[(sizes == 1) & ~is_junc]
        slow = df[(sizes > 1) | is_junc]
        fast_tbl = None
        if len(fast):
            fast_tbl = pa.table({
                "county": pa.array(fast["county"].tolist(), pa.string()),
                "pos": pa.array(fast["pos"].to_numpy(), pa.int64()),
                "raw": pa.array(fast["raw"].tolist(), pa.string()),
                "streets": pa.array(fast["streets"].tolist(), pa.string()),
                "lat": pa.array(fast["lat"].to_numpy(), pa.float64()),
                "lon": pa.array(fast["lon"].to_numpy(), pa.float64()),
                "way_ids": pa.array(fast["way_ids"].tolist(), pa.list_(pa.int64())),
                "node_id": pa.array(fast["node_id"].to_numpy(), pa.int64()),
            }, schema=INT_SCHEMA)
        out_rows = []
        for (county, streets), g in slow.groupby(["county", "streets"], sort=False):
            g = g.sort_values("pos", kind="stable")
            recs = g.to_dict("records")
            if JUNCTION in streets:  # substring test, as in the reference
                out_rows.append(self._avg(recs))
                continue
            if len(recs) == 1:
                out_rows.append(recs[0])
                continue
            matches = recs
            while matches:
                base = matches[0]
                matches = sorted(
                    matches,
                    key=lambda m: dist_l1_m(m["lat"], m["lon"], base["lat"], base["lon"]),
                )
                close = [m for m in matches
                         if dist_l1_m(m["lat"], m["lon"], base["lat"], base["lon"]) < 50]
                out_rows.extend(self._close_group(county, close))
                matches = matches[len(close):]
        slow_tbl = _int_rows_table(out_rows)
        if fast_tbl is None:
            return slow_tbl
        return pa.concat_tables([fast_tbl, slow_tbl])


def _int_rows_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "county": pa.array([r["county"] for r in rows], pa.string()),
            "pos": pa.array([int(r["pos"]) for r in rows], pa.int64()),
            "raw": pa.array([r["raw"] for r in rows], pa.string()),
            "streets": pa.array([r["streets"] for r in rows], pa.string()),
            "lat": pa.array([float(r["lat"]) for r in rows], pa.float64()),
            "lon": pa.array([float(r["lon"]) for r in rows], pa.float64()),
            "way_ids": pa.array([[int(x) for x in r["way_ids"]] for r in rows],
                                pa.list_(pa.int64())),
            "node_id": pa.array([int(r["node_id"]) for r in rows], pa.int64()),
        },
        schema=INT_SCHEMA,
    )


def coalesced(int_ds, state_ref, n_buckets: int):
    def add_key(b: pa.Table) -> pa.Table:
        key = [f"{c}{SEP}{zlib.crc32(s.encode()) % n_buckets}"
               for c, s in zip(b["county"].to_pylist(), b["streets"].to_pylist())]
        return b.append_column("ckey", pa.array(key, pa.string()))

    def run_group(df):
        return Coalescer(state_ref)(df)

    with_key = int_ds.map_batches(add_key, batch_format="pyarrow")
    return with_key.groupby("ckey").map_groups(run_group, batch_format="pandas")


def remove_junctions(ds):
    """A6 (js/geo.js:778-799): drop JUNCTION tokens; keep rows with >=2 real
    street tokens.  Vectorized enough: pure string ops per row."""

    import pyarrow.compute as pc

    def fn(b: pa.Table) -> pa.Table:
        has = pc.match_substring(b["streets"], JUNCTION)
        clean_part = b.filter(pc.invert(has))
        junky = b.filter(has)
        if junky.num_rows == 0:
            return clean_part
        keep, new = [], []
        for s in junky["streets"].to_pylist():
            toks = [t for t in s.split("/") if t != JUNCTION]
            ok = len(toks) > 1
            keep.append(ok)
            new.append("/".join(toks) if ok else s)
        junky = junky.set_column(junky.schema.get_field_index("streets"),
                                 "streets", pa.array(new, pa.string()))
        junky = junky.filter(pa.array(keep))
        return pa.concat_tables([clean_part, junky])

    return ds.map_batches(fn, batch_format="pyarrow")
