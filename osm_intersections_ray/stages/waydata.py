"""wayData construction: naming, motorway_link propagation, fake naming,
dead-end parity — the distributed re-expression of ``initWayData`` +
``findDeadEnds`` (js/geo.js:392-651, SURVEY.md T2/T4/J7/J8).

Scale design
------------
* The **bulk** path (named ways -> wayData rows) is a stateless vectorized
  ``map_batches`` projection — streams at any scale.
* **Link name propagation (J7)** is an iterative fixpoint over unnamed
  motorway_links and the ways touching their endpoints.  Links are a tiny
  fraction of ways (<1% on OSM extracts), so the engine filters that closure
  down distributedly and runs the exact order-sensitive fixpoint on the
  driver, then broadcasts the rename table (``ray.put`` once) into the bulk
  projection.  This is the canonical small-side/broadcast pattern; the filter
  itself is a full scan, not a collect of the input.
* **Fake naming (J8)** needs node->names lookups only at nodes of unnamed
  tagged ways — the same filtered closure provides them.
* **Dead ends (T4)** are an odd-parity count per (county, node, name) over
  way endpoints — a distributed ``groupby().count()`` whose result (a few
  rows per street) is collected and broadcast for the coalescing stage.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.scalar import MOTORWAY, MOTORWAY_LINK, JUNCTION, get_way_name
from .common import RANK_FAKE, RANK_PROPAGATED

WAYS_COLUMNS = [
    "county", "way_id", "way_rank", "minlat", "minlon", "maxlat", "maxlon",
    "nodes", "lats", "lons", "tagged", "name", "ref", "highway", "bridge",
]

WAYDATA_SCHEMA = pa.schema(
    [
        ("county", pa.string()),
        ("data_rank", pa.int64()),
        ("way_id", pa.int64()),
        ("way_rank", pa.int32()),
        ("name", pa.string()),
        ("highway", pa.string()),
        ("minlat", pa.float64()),
        ("minlon", pa.float64()),
        ("maxlat", pa.float64()),
        ("maxlon", pa.float64()),
        ("nodes", pa.list_(pa.int64())),
        ("lats", pa.list_(pa.float64())),
        ("lons", pa.list_(pa.float64())),
    ]
)


@dataclass
class SmallState:
    """Driver-computed small-side state, broadcast into the bulk stages."""

    # (county, way_rank) -> (adopted_name, adoption_seq)  [J7 result]
    renames: dict
    # (county, way_rank) -> fake_name                      [J8 result]
    fake_names: dict
    # county -> {node_id -> set(names)}                    [T4 result]
    dead_ends: dict
    # county -> {dead_node -> list[frozenset(nodes)]} ways containing the dead
    # node whose (propagated) name is in the node's dead-end set — the
    # existence index behind onSameWay/findNeighbor (js/geo.js:359-387)
    neighbor_index: dict


def _live_name(row_name, row_ref, rename) -> str:
    return get_way_name(rename if rename is not None else row_name, row_ref)


def compute_small_state(ways_ds) -> SmallState:
    """Distributed filter -> driver fixpoint.  See module docstring."""
    import pandas  # noqa: F401

    # 1. unnamed tagged ways (links, circles, service stubs) — small
    def keep_unnamed(b: pa.Table) -> pa.Table:
        name = b["name"].to_pylist()
        ref = b["ref"].to_pylist()
        tagged = np.asarray(b["tagged"])
        mask = [bool(tagged[i]) and not get_way_name(name[i], ref[i]) for i in range(b.num_rows)]
        return b.filter(pa.array(mask))

    unnamed = ways_ds.map_batches(keep_unnamed, batch_format="pyarrow").to_pandas()
    unnamed_nodes = set()
    for lst in unnamed["nodes"]:
        unnamed_nodes.update(int(n) for n in lst)

    # 2. tagged ways touching any unnamed-way node (propagation candidates +
    #    fake-name donors) — filtered distributedly, small result
    nodeset = unnamed_nodes

    def keep_touching(b: pa.Table) -> pa.Table:
        tagged = np.asarray(b["tagged"])
        mask = []
        for i, lst in enumerate(b["nodes"].to_pylist()):
            mask.append(bool(tagged[i]) and any(n in nodeset for n in lst))
        return b.filter(pa.array(mask))

    touching = ways_ds.map_batches(keep_touching, batch_format="pyarrow").to_pandas()

    renames: dict = {}
    fake_names: dict = {}
    for county, cdf in touching.groupby("county", sort=False):
        cdf = cdf.sort_values("way_rank")
        # node -> ways (insertion order = way order), restricted closure
        node_ways: dict = {}
        recs = cdf.to_dict("records")
        for r in recs:
            for n in r["nodes"]:
                node_ways.setdefault(n, []).append(r)
        live = {r["way_rank"]: r["name"] for r in recs}

        links = [r for r in recs
                 if r["highway"] == MOTORWAY_LINK and not r["name"]]
        pending = list(links)
        seq = 0
        while pending:
            still = []
            for r in pending:
                adopted = None
                for endpoint in (r["nodes"][0], r["nodes"][-1]):
                    for cand in node_ways.get(endpoint, []):
                        if cand["highway"] == MOTORWAY and cand["ref"]:
                            adopted = cand["ref"]
                            break
                        if cand["highway"] == MOTORWAY_LINK and live[cand["way_rank"]]:
                            adopted = live[cand["way_rank"]]
                            break
                    if adopted is not None:
                        break
                if adopted is None:
                    still.append(r)
                else:
                    live[r["way_rank"]] = adopted
                    renames[(county, int(r["way_rank"]))] = (adopted, seq)
                    seq += 1
            if len(still) == len(pending):
                break
            pending = still

        # node -> names from named (incl. propagated) ways in the closure
        node_names: dict = {}
        for r in recs:
            nm = get_way_name(live[r["way_rank"]], r["ref"])
            if not nm:
                continue
            for n in r["nodes"]:
                node_names.setdefault(n, set()).add(nm)
        for r in recs:
            if get_way_name(live[r["way_rank"]], r["ref"]):
                continue
            seed = {MOTORWAY_LINK} if r["highway"] == MOTORWAY_LINK else {JUNCTION}
            for n in r["nodes"]:
                seed |= node_names.get(n, set())
            fake_names[(county, int(r["way_rank"]))] = "/".join(sorted(seed))

    dead_ends = compute_dead_ends(ways_ds, renames)
    neighbor_index = compute_neighbor_index(ways_ds, renames, dead_ends)
    return SmallState(renames, fake_names, dead_ends, neighbor_index)


def compute_dead_ends(ways_ds, renames: dict) -> dict:
    """Odd-parity endpoint counts -> county -> {node -> set(names)}.

    Distributed: emit (county,node,name) per endpoint occurrence, group+count,
    keep odd (toggleValueSet parity, js/geo.js:599-651); the odd rows are a
    small per-county dimension, collected for broadcast."""

    def endpoints(b: pa.Table) -> pa.Table:
        county, node, name = [], [], []
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        ranks = b["way_rank"].to_pylist()
        counties = b["county"].to_pylist()
        tagged = b["tagged"].to_pylist()
        for i, lst in enumerate(b["nodes"].to_pylist()):
            if not tagged[i] or len(lst) < 2:
                continue
            rn = renames.get((counties[i], ranks[i]))
            nm = _live_name(names[i] if rn is None else rn[0], refs[i], None)
            if not nm:
                continue
            for n in (lst[0], lst[-1]):
                county.append(counties[i])
                node.append(n)
                name.append(nm)
        return pa.table({"county": county,
                         "node": pa.array(node, pa.int64()),
                         "name": name})

    counted = (
        ways_ds.map_batches(endpoints, batch_format="pyarrow")
        .groupby(["county", "node", "name"])
        .count()
        .to_pandas()
    )
    odd = counted[counted["count()"] % 2 == 1]
    out: dict = {}
    for county, node, name in zip(odd["county"], odd["node"], odd["name"]):
        out.setdefault(county, {}).setdefault(int(node), set()).add(name)
    return out


def compute_neighbor_index(ways_ds, renames: dict, dead_ends: dict) -> dict:
    """For each dead-end node, the node-sets of ways containing it whose name
    is one of the names dead-ending there — the only ways ``onSameWay``
    (js/geo.js:359-372) can ever return true through.  Small: O(#dead ends)."""

    def collect(b: pa.Table) -> pa.Table:
        c_out, n_out, ns_out = [], [], []
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        ranks = b["way_rank"].to_pylist()
        counties = b["county"].to_pylist()
        tagged = b["tagged"].to_pylist()
        for i, lst in enumerate(b["nodes"].to_pylist()):
            if not tagged[i]:
                continue
            cd = dead_ends.get(counties[i])
            if not cd:
                continue
            rn = renames.get((counties[i], ranks[i]))
            nm = _live_name(names[i] if rn is None else rn[0], refs[i], None)
            if not nm:
                continue
            for n in lst:
                s = cd.get(n)
                if s and nm in s:
                    c_out.append(counties[i])
                    n_out.append(n)
                    ns_out.append(list(lst))
        return pa.table({"county": c_out,
                         "dead_node": pa.array(n_out, pa.int64()),
                         "way_nodes": pa.array(ns_out, pa.list_(pa.int64()))})

    df = ways_ds.map_batches(collect, batch_format="pyarrow").to_pandas()
    out: dict = {}
    for county, dn, ns in zip(df["county"], df["dead_node"], df["way_nodes"]):
        out.setdefault(county, {}).setdefault(int(dn), []).append(frozenset(int(x) for x in ns))
    return out


class MakeWayData:
    """Projects raw ways to wayData rows with explicit data_rank.  Stateless
    task form: the broadcast SmallState is fetched once per worker process
    via ``cached_get`` (no actor-pool CPU reservation needed for a pure
    lookup table)."""

    def __init__(self, state_ref):
        from .common import cached_get

        st: SmallState = cached_get(state_ref)
        self.renames = st.renames
        self.fake_names = st.fake_names

    def __call__(self, b: pa.Table) -> pa.Table:
        cols = {f.name: [] for f in WAYDATA_SCHEMA}
        names = b["name"].to_pylist()
        refs = b["ref"].to_pylist()
        ranks = b["way_rank"].to_pylist()
        counties = b["county"].to_pylist()
        tagged = b["tagged"].to_pylist()
        hwy = b["highway"].to_pylist()
        way_ids = b["way_id"].to_pylist()
        nodes = b["nodes"].to_pylist()
        lats = b["lats"].to_pylist()
        lons = b["lons"].to_pylist()
        bounds = [b[c].to_pylist() for c in ("minlat", "minlon", "maxlat", "maxlon")]
        for i in range(b.num_rows):
            if not tagged[i]:
                continue
            key = (counties[i], ranks[i])
            rn = self.renames.get(key)
            if rn is not None:
                name = get_way_name(rn[0], refs[i])
                rank = RANK_PROPAGATED + rn[1]
            else:
                name = get_way_name(names[i], refs[i])
                if name:
                    rank = ranks[i]
                else:
                    name = self.fake_names.get(key)
                    if name is None:
                        continue  # untagged handled above; tagged-unnamed must be in fake_names
                    rank = RANK_FAKE + ranks[i]
            cols["county"].append(counties[i])
            cols["data_rank"].append(rank)
            cols["way_id"].append(way_ids[i])
            cols["way_rank"].append(ranks[i])
            cols["name"].append(name)
            cols["highway"].append(hwy[i])
            cols["minlat"].append(bounds[0][i])
            cols["minlon"].append(bounds[1][i])
            cols["maxlat"].append(bounds[2][i])
            cols["maxlon"].append(bounds[3][i])
            cols["nodes"].append(nodes[i])
            cols["lats"].append(lats[i])
            cols["lons"].append(lons[i])
        return pa.table(cols, schema=WAYDATA_SCHEMA)
