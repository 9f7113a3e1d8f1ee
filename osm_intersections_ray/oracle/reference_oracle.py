"""Single-process oracle: a direct, order-faithful reimplementation of the
reference pipeline (jw997/osm-intersections js/geo.js main path, E1 in
SURVEY.md section 3) over one county's ways table.

This is NOT the engine — it is the ground truth the distributed Ray pipeline
is golden-tested against (multiset equality over all output columns).  It
deliberately preserves every order-dependent quirk:

* JS Map/Set insertion order (dicts here);
* motorway_link name propagation fixpoint with in-pass mutation visibility
  (js/geo.js:445-544);
* the `_2`.._9 suffix cap with silent overwrite at >=10 collisions
  (js/geo.js:1174-1188);
* the findNeighbor branch of processCloseGroup that drops non-dead-end
  members and returns after the first averaged pair (js/geo.js:888-901);
* the geometric join's one-row-per-shared-cover-cell multiplicity and
  one-directional emission (way1 = motorway side) — the iterator's id-order
  dedup never fires because it tests `pred(datum.way)` on the RAW way, whose
  `.highway`/`.bridge` attributes don't exist (js/gpsBins.js:216-223), so no
  candidate is ever skipped by id (verified against the committed Napa golden:
  14 ordered pairs, each emitted in exactly one direction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions.cells import cover_cells
from ..functions.geometry import first_line_crossing, parse_geom_json, point_in_shape
from ..functions.scalar import (
    GEOM_SENTINEL,
    JUNCTION,
    MOTORWAY,
    MOTORWAY_LINK,
    check_highway_types,
    clean_streets,
    dist_l1_m,
    fix6,
    get_way_name,
    make_intersection_string,
)


@dataclass
class _Way:
    way_id: int
    nodes: list
    lats: list
    lons: list
    bounds: tuple
    tagged: bool
    name: str | None
    ref: str | None
    highway: str | None
    bridge: str | None

    def live_name(self) -> str:
        return get_way_name(self.name, self.ref)


@dataclass
class _Rec:  # wayData record (js/geo.js:440)
    name: str
    nodes: list
    lats: list
    lons: list
    highway: str | None
    way: _Way
    rank: int = 0


@dataclass
class _Int:
    lat: float
    lon: float
    raw: str
    streets: str
    way_ids: list
    node_id: object  # int or 'Geom'


def _ways_from_table(tbl: pa.Table) -> list[_Way]:
    d = tbl.to_pydict()
    out = []
    for i in range(tbl.num_rows):
        out.append(
            _Way(
                way_id=d["way_id"][i],
                nodes=list(d["nodes"][i]),
                lats=list(d["lats"][i]),
                lons=list(d["lons"][i]),
                bounds=(d["minlat"][i], d["minlon"][i], d["maxlat"][i], d["maxlon"][i]),
                tagged=d["tagged"][i],
                name=d["name"][i],
                ref=d["ref"][i],
                highway=d["highway"][i],
                bridge=d["bridge"][i],
            )
        )
    return out


class ReferenceOracle:
    def __init__(self, ways_table: pa.Table):
        self.ways = _ways_from_table(ways_table)
        # mapNodeIdToWays: ALL tagged ways, insertion order (js/geo.js:394-408)
        self.node_ways: dict[int, list[_Way]] = {}
        for w in self.ways:
            if not w.tagged:
                continue
            for n in w.nodes:
                lst = self.node_ways.setdefault(n, [])
                if not any(x is w for x in lst):  # JS Set: same object added once
                    lst.append(w)
        self.node_gps: dict[int, tuple[float, float]] = {}
        self.node_names: dict[int, set] = {}
        self.way_data: list[_Rec] = []
        self.dead_ends: dict[int, set] = {}

    # --- initWayData (js/geo.js:392-595) -----------------------------------
    def init_way_data(self):
        def note_nodes(w: _Way, name: str):
            for i, n in enumerate(w.nodes):
                self.node_gps[n] = (w.lats[i], w.lons[i])
                self.node_names.setdefault(n, set()).add(name)

        for w in self.ways:
            if not w.tagged:
                continue
            name = w.live_name()
            if not name:
                continue
            note_nodes(w, name)
            self.way_data.append(_Rec(name, w.nodes, w.lats, w.lons, w.highway, w))

        # motorway_link name propagation fixpoint (js/geo.js:445-544)
        links = [w for w in self.ways if w.tagged and w.highway == MOTORWAY_LINK and not w.name]
        pending = list(links)  # JS Set preserves insertion order
        while pending:
            start = len(pending)
            still = []
            for w in pending:
                first_ways = self.node_ways.get(w.nodes[0])
                last_ways = self.node_ways.get(w.nodes[-1])
                adopted = None
                if first_ways:  # reference guards on firstNodeWays only
                    for cand in first_ways:
                        if cand.highway == MOTORWAY and cand.ref:
                            adopted = cand.ref
                            break
                        if cand.highway == MOTORWAY_LINK and cand.name:
                            adopted = cand.name
                            break
                    if adopted is None:
                        for cand in last_ways:
                            if cand.highway == MOTORWAY and cand.ref:
                                adopted = cand.ref
                                break
                            if cand.highway == MOTORWAY_LINK and cand.name:
                                adopted = cand.name
                                break
                if adopted is None:
                    still.append(w)
                    continue
                w.name = adopted  # mutation visible within this pass
                note_nodes(w, adopted)
                self.way_data.append(_Rec(adopted, w.nodes, w.lats, w.lons, w.highway, w))
            pending = still
            if len(pending) == start:
                break

        # fake naming for still-unnamed tagged ways (js/geo.js:554-593)
        for w in self.ways:
            if not w.tagged or w.live_name():
                continue
            fake = {MOTORWAY_LINK} if w.highway == MOTORWAY_LINK else {JUNCTION}
            for i, n in enumerate(w.nodes):
                self.node_gps[n] = (w.lats[i], w.lons[i])
                if n in self.node_names:
                    fake |= self.node_names[n]
            name = "/".join(sorted(fake))
            self.way_data.append(_Rec(name, w.nodes, w.lats, w.lons, w.highway, w))
        for i, rec in enumerate(self.way_data):
            rec.rank = i

    # --- findDeadEnds (js/geo.js:615-651) -----------------------------------
    def find_dead_ends(self):
        def toggle(n, name):
            s = self.dead_ends.setdefault(n, set())
            if name in s:
                s.discard(name)
            else:
                s.add(name)

        for w in self.ways:  # runs AFTER propagation mutated w.name
            if not w.tagged:
                continue
            name = w.live_name()
            if not name or len(w.nodes) < 2:
                continue
            toggle(w.nodes[0], name)
            toggle(w.nodes[-1], name)
        self.dead_ends = {n: s for n, s in self.dead_ends.items() if s}

    def _is_dead_end(self, node_id) -> bool:
        return node_id in self.dead_ends

    def _not_all_motorway_links(self, node) -> bool:
        return any(w.highway != MOTORWAY_LINK for w in self.node_ways[node])

    def _all_motorway_and_links(self, node) -> bool:
        return all(w.highway in (MOTORWAY, MOTORWAY_LINK) for w in self.node_ways[node])

    # --- shared-node path (js/geo.js:1136-1223) ------------------------------
    def find_intersections(self) -> list[_Int]:
        node_name: dict[int, set] = {}
        for rec in self.way_data:
            for n in rec.nodes:
                node_name.setdefault(n, set()).add(rec.name)

        chosen: dict[str, tuple] = {}
        for node, names in node_name.items():
            if len(names) <= 1:
                continue
            if not self._not_all_motorway_links(node):
                continue
            if self._all_motorway_and_links(node):
                continue
            key = make_intersection_string(names)
            if key in chosen:
                for suffix in range(2, 10):
                    cand = f"{key}_{suffix}"
                    if cand not in chosen:
                        key = cand
                        break
                # all taken => key stays base and silently overwrites
            lat, lon = self.node_gps[node]
            chosen[key] = (lat, lon, node)

        out = []
        for key, (lat, lon, node) in chosen.items():
            way_ids = [w.way_id for w in self.node_ways[node]]
            out.append(_Int(lat, lon, key, clean_streets(key), way_ids, node))

        out = self._average_junction_duplicates(out)
        out = self._average_nearby_boulevard_duplicates(out)
        return self._remove_junctions(out)

    @staticmethod
    def _avg(members: list[_Int]) -> _Int:
        lat_sum = 0.0
        lon_sum = 0.0
        way_ids: list = []
        seen = set()
        for m in members:
            lat_sum += m.lat
            lon_sum += m.lon
            for wid in m.way_ids:
                if wid not in seen:
                    seen.add(wid)
                    way_ids.append(wid)
        n = len(members)
        f = members[0]
        return _Int(lat_sum / n, lon_sum / n, f.raw, f.streets, way_ids, f.node_id)

    def _average_junction_duplicates(self, ints: list[_Int]) -> list[_Int]:
        simple = [i for i in ints if JUNCTION not in i.streets]
        junction = sorted([i for i in ints if JUNCTION in i.streets], key=lambda i: i.streets)
        seen = []
        for i in junction:
            if i.streets not in seen:
                seen.append(i.streets)
        for s in seen:
            simple.append(self._avg([i for i in junction if i.streets == s]))
        return simple

    def _find_neighbor(self, node_array: list[_Int], dead_node):
        str_set = self.dead_ends.get(dead_node, set())
        for cand in node_array:
            for rec in self.way_data:
                if cand.node_id in rec.nodes and dead_node in rec.nodes and rec.name in str_set:
                    return cand
        return None

    def _process_close_group(self, matches: list[_Int]) -> list[_Int]:
        if len(matches) <= 1:
            return matches
        dead = sum(1 for m in matches if self._is_dead_end(m.node_id))
        if dead == 0:
            return [self._avg(matches)]
        if len(matches) == 2:
            if dead == 1:
                d = dist_l1_m(matches[0].lat, matches[0].lon, matches[1].lat, matches[1].lon)
                return [self._avg(matches)] if d < 50 else list(matches)
            if dead == 2:
                return list(matches)
        out = []
        for m in matches:
            if self._is_dead_end(m.node_id):
                other = self._find_neighbor(matches, m.node_id)
                if other is not None:
                    return out + [self._avg([other, m])]
                out.append(m)
        return out

    def _average_nearby_boulevard_duplicates(self, ints: list[_Int]) -> list[_Int]:
        counts: dict[str, int] = {}
        for i in ints:
            counts[i.streets] = counts.get(i.streets, 0) + 1
        output = [i for i in ints if counts[i.streets] == 1]
        dupes = []
        for i in ints:
            if counts[i.streets] > 1 and i.streets not in dupes:
                dupes.append(i.streets)
        for s in dupes:
            matches = [i for i in ints if i.streets == s]
            while matches:
                base = matches[0]
                matches.sort(key=lambda m: dist_l1_m(m.lat, m.lon, base.lat, base.lon))
                close = [m for m in matches
                         if dist_l1_m(m.lat, m.lon, base.lat, base.lon) < 50]
                output.extend(self._process_close_group(close))
                matches = matches[len(close):]
        return output

    @staticmethod
    def _remove_junctions(ints: list[_Int]) -> list[_Int]:
        out = []
        for i in ints:
            tokens = [t for t in i.streets.split("/") if t != JUNCTION]
            if len(tokens) > 1:
                i.streets = "/".join(tokens)
                out.append(i)
        return out

    # --- geometric path (js/geo.js:248-329, js/gpsBins.js) -------------------
    def find_intersections_geometric(self) -> list[_Int]:
        bins: dict[int, list[_Rec]] = {}
        for rec in self.way_data:
            for cell in cover_cells(*rec.way.bounds):
                lst = bins.setdefault(cell, [])
                lst.append(rec)
        out = []
        for rec1 in self.way_data:
            if rec1.highway != MOTORWAY:  # wayData has no .bridge attr => motorway only
                continue
            for cell in cover_cells(*rec1.way.bounds):
                for rec2 in bins.get(cell, []):
                    # iterator would apply id-order dedup only when
                    # pred(datum.way) is true — never, see module docstring
                    if rec2 is rec1:
                        continue
                    if not rec1.name or not rec2.name:
                        continue
                    hit = first_line_crossing(rec1.lons, rec1.lats, rec2.lons, rec2.lats)
                    if hit is None:
                        continue
                    common = self._common_nodes(rec1, rec2)
                    if not check_highway_types(rec1.highway, rec2.highway, bool(common)):
                        continue
                    raw = f"{rec1.name}/{rec2.name}"
                    out.append(
                        _Int(hit[1], hit[0], raw, clean_streets(raw),
                             [rec1.way.way_id, rec2.way.way_id],
                             common[0] if common else GEOM_SENTINEL)
                    )
        return self._remove_junctions(out)

    @staticmethod
    def _common_nodes(rec1: _Rec, rec2: _Rec) -> list:
        # JS Set.intersection iterates the smaller set (result order follows it)
        s1 = list(dict.fromkeys(rec1.nodes))
        s2 = list(dict.fromkeys(rec2.nodes))
        if len(s1) <= len(s2):
            other = set(s2)
            return [n for n in s1 if n in other]
        other = set(s1)
        return [n for n in s2 if n in other]

    # --- full pipeline -------------------------------------------------------
    # --- findClosest (js/geo.js:1305-1361, commented reverse geocoder) ------
    def find_closest(self, lat: float, lon: float) -> str:
        """Sequential transliteration of findClosest over wayData, with the
        reference's exact quirks: min1/min2 init 99999999999 (truthy), min2
        updated only for names differing from the CURRENT min1Name, and the
        final ``if (min2)`` JS truthiness (0 => first name alone; never
        updated => '/undefined' via string concat)."""
        min1 = 99999999999.0
        min1_name = None
        min2 = min1
        min2_name = None  # JS undefined
        for rec in self.way_data:
            d = min(100000.0 * (abs(lat - vla) + abs(lon - vlo))
                    for vla, vlo in zip(rec.lats, rec.lons))
            if d < min1:
                if rec.name != min1_name:
                    min2_name = min1_name
                    min2 = min1
                min1_name = rec.name
                min1 = d
                continue
            if d < min2 and rec.name != min1_name:
                min2_name = rec.name
                min2 = d
        if min2:  # JS truthiness: 0.0 is falsy, the infinite init is truthy
            return f"{min1_name}/{'undefined' if min2_name is None else min2_name}"
        return str(min1_name)

    def run(self, city_polygons: list[tuple[str, list]] | None = None) -> list[dict]:
        """city_polygons: [(name, polygons)] in boundary-file order (cities of
        this county only).  Returns output feature rows (FIXTURES.md section 5)."""
        self.init_way_data()
        self.find_dead_ends()
        node_rows = self.find_intersections()
        geom_rows = self.find_intersections_geometric()
        out = []
        for src, rows in (("node", node_rows), ("geom", geom_rows)):
            for i in rows:
                lat = fix6(i.lat)
                lon = fix6(i.lon)
                city = "Unincorporated"
                for cname, polys in city_polygons or []:
                    if point_in_shape(lon, lat, polys):
                        city = cname
                        break
                is_geom = i.node_id == GEOM_SENTINEL
                out.append(
                    {
                        "lat": lat,
                        "lon": lon,
                        "streets": i.streets.split("/"),
                        "node_id": None if is_geom else int(i.node_id),
                        "node_id_kind": "geom" if is_geom else "node",
                        "way_ids": list(i.way_ids),
                        "city": city,
                        "source": src,
                    }
                )
        return out


def run_oracle(ways_table: pa.Table, boundaries: pa.Table | None,
               county_cities: pa.Table | None, county: str) -> list[dict]:
    """Run the oracle for one county: filter ways, select the county's city
    polygons in file order (loadBorders semantics, js/geo.js:72-123)."""
    import pyarrow.compute as pc

    sub = ways_table.filter(pc.equal(ways_table["county"], county))
    city_polys = []
    if boundaries is not None and county_cities is not None:
        cc = county_cities.to_pydict()
        expected = None
        for i, name in enumerate(cc["county"]):
            if name == county:
                expected = set(cc["cities"][i])
        bd = boundaries.to_pydict()
        order = sorted(range(len(bd["name"])), key=lambda i: bd["file_order"][i])
        for i in order:
            if bd["kind"][i] == "city" and bd["name"][i] in (expected or set()):
                city_polys.append((bd["name"][i], parse_geom_json(bd["geom_json"][i])))
    return ReferenceOracle(sub).run(city_polys)
