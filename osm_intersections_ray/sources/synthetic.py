"""Deterministic synthetic world: ways, boundaries, county_cities, pages.

The driver's testdata (/root/testdata/sf*) is TPC-H-shaped and has no spatial
tables, so the OSM-shaped inputs (FIXTURES.md sections 1-4) are synthesized
here, deterministically (fixed seeds, no wall clock), at a scale derived from
the sf directory name.  Layout:

* two counties ("Alpha County", "Beta County") side by side;
* rectangular cities per county, one overlapping pair to pin the
  first-match-in-file-order PIP tie-break (js/geo.js:60-70);
* per city a street grid (vertical "<N>th Street" x horizontal "Avenue <N>")
  chained into multi-vertex ways — the bulk shared-node intersections;
* a fixed set of special constructions in Alpha County exercising every
  coalescing / naming / geometric edge case in SURVEY.md section 2
  (suffix cap, dead-end averaging, offset crossings, traffic circles,
  motorway_link name propagation, motorway flyovers with per-cell
  multiplicity, closed-loop parity, multi-ref names, untagged ways);
* a Common-Crawl-style ``pages`` table (url, warc_ts, html, text, lang) whose
  html embeds the expected text payload inside <article> tags and the page
  coordinate in a geo.position meta tag, so extraction and geotagging have
  exact oracles (BASELINE.json input_hint).

Tables are cached under /tmp/osmray_fixtures/<sf_label>/ and written
atomically (tmp dir + rename) so concurrent callers are safe.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_ROOT = "/tmp/osmray_fixtures_v5"  # v5: pages.parquet is a sharded
                                          # DIRECTORY (file-granular read
                                          # parallelism; same rows, order)
# v4: pages html gains the outlink <p class="links"> section
# v2: parquet written with small row groups so block-split reads parallelize

WORLD = {
    "counties": [
        {
            "name": "Alpha County",
            "code": 1,
            "rect": (36.90, -122.40, 37.40, -121.95),  # minlat, minlon, maxlat, maxlon
            "cities": [
                {"name": "Alphaville", "rect": (37.02, -122.38, 37.20, -122.20), "grid": 1.0},
                {"name": "Alphatown", "rect": (37.02, -122.19, 37.20, -122.01), "grid": 1.0},
                # overlaps Alphaville in lat band [37.19, 37.20] — file order puts
                # Alphaville first, so overlap points resolve to Alphaville.
                {"name": "Alphaburg", "rect": (37.19, -122.38, 37.38, -122.21), "grid": 0.5},
            ],
        },
        {
            "name": "Beta County",
            "code": 2,
            "rect": (36.90, -121.95, 37.40, -121.50),
            "cities": [
                {"name": "Betaville", "rect": (37.02, -121.93, 37.20, -121.75), "grid": 1.0},
                {"name": "Betatown", "rect": (37.02, -121.74, 37.20, -121.56), "grid": 0.5},
            ],
        },
    ]
}

_WORD_POOLS = {
    "en": ("the quick brown fox jumps over a lazy dog and then runs through green "
           "fields while morning light covers quiet streets of this small town with "
           "people walking to work past old houses near river bridges").split(),
    "de": ("der schnelle braune fuchs springt über den faulen hund und läuft durch "
           "grüne felder während morgenlicht die stillen straßen der kleinen stadt "
           "bedeckt mit menschen die zur arbeit gehen").split(),
    "fr": ("le rapide renard brun saute par dessus le chien paresseux et court dans "
           "les champs verts pendant que la lumière du matin couvre les rues calmes "
           "de cette petite ville avec des gens").split(),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso y corre por campos "
           "verdes mientras la luz de la mañana cubre las calles tranquilas de este "
           "pequeño pueblo con gente caminando").split(),
}


def scale_from_sf_dir(sf_dir: str) -> tuple[str, float, int]:
    """Parse 'sf<scale>' or 'sf<scale>r<replicas>' from the directory name.
    Replicas shift the whole two-county world east by 1 degree each (distinct
    county names / way ids / node ids) — used for fair comparisons against
    the reference's one-county-per-process execution model."""
    label = os.path.basename(os.path.normpath(sf_dir))
    if not label.startswith("sf"):
        raise ValueError(f"cannot parse scale from {sf_dir!r}")
    body = label[2:]
    if "r" in body:
        scale_s, _, reps_s = body.partition("r")
        return label, float(scale_s), int(reps_s)
    return label, float(body), 1


def _grid_size(scale: float) -> int:
    return max(6, int(round(math.sqrt(scale * 33600))))


class _WayBuilder:
    """Accumulates way rows with explicit way_rank (input row order)."""

    def __init__(self):
        self.rows: list[dict] = []
        self._next_way_id = 100_000
        self._next_node_id = 2_000_000_000

    def node_id(self) -> int:
        self._next_node_id += 1
        return self._next_node_id

    def add(self, county: str, nodes, lats, lons, *, tags: dict | None, way_id=None):
        assert len(nodes) == len(lats) == len(lons)
        if way_id is None:
            self._next_way_id += 1
            way_id = self._next_way_id
        t = tags or {}
        self.rows.append(
            {
                "county": county,
                "way_id": int(way_id),
                "way_rank": len(self.rows),
                "minlat": float(min(lats)),
                "minlon": float(min(lons)),
                "maxlat": float(max(lats)),
                "maxlon": float(max(lons)),
                "nodes": [int(n) for n in nodes],
                "lats": [float(v) for v in lats],
                "lons": [float(v) for v in lons],
                "tagged": tags is not None,
                "name": t.get("name"),
                "ref": t.get("ref"),
                "highway": t.get("highway"),
                "bridge": t.get("bridge"),
                "junction": t.get("junction"),
            }
        )


def _city_grid(b: _WayBuilder, county: str, city_idx: int, cname: str, rect, g: int):
    """Street grid: vertical '<city> <i+1>th Street' x horizontal
    '<city> Avenue <j+1>', chained into ways of <=4 crossings with one
    midpoint vertex per span."""
    la0, lo0, la1, lo1 = rect
    dx = (lo1 - lo0) / (g + 1)
    dy = (la1 - la0) / (g + 1)
    xs = [lo0 + (i + 1) * dx for i in range(g)]
    ys = [la0 + (j + 1) * dy for j in range(g)]
    base = 1_000_000_000 + city_idx * 1_000_000

    def cnode(i, j):
        return base + i * 10_000 + j * 10

    # vertical streets
    for i in range(g):
        for j0 in range(0, g - 1, 3):
            j1 = min(j0 + 3, g - 1)
            nodes, lats, lons = [], [], []
            for j in range(j0, j1 + 1):
                if j > j0:
                    nodes.append(b.node_id())
                    lats.append((ys[j - 1] + ys[j]) / 2.0)
                    lons.append(xs[i] + dx * 0.03)
                nodes.append(cnode(i, j))
                lats.append(ys[j])
                lons.append(xs[i])
            b.add(county, nodes, lats, lons,
                  tags={"name": f"{cname} {i + 1}th Street", "highway": "residential"})
    # horizontal avenues
    for j in range(g):
        for i0 in range(0, g - 1, 3):
            i1 = min(i0 + 3, g - 1)
            nodes, lats, lons = [], [], []
            for i in range(i0, i1 + 1):
                if i > i0:
                    nodes.append(b.node_id())
                    lats.append(ys[j] + dy * 0.03)
                    lons.append((xs[i - 1] + xs[i]) / 2.0)
                nodes.append(cnode(i, j))
                lats.append(ys[j])
                lons.append(xs[i])
            b.add(county, nodes, lats, lons,
                  tags={"name": f"{cname} Avenue {j + 1}", "highway": "secondary"})


def _specials(b: _WayBuilder, county: str = "Alpha County"):
    """Fixed edge-case constructions (see module docstring); all south of the
    city rectangles (lat < 37.02) => city PIP yields 'Unincorporated'."""
    nid = b.node_id

    # --- S1: street dead-ending at a boulevard, 1 dead end, <50 m => averaged
    blat = 36.9600
    bl_nodes = [nid() for _ in range(6)]
    bl_lons = [-122.3100, -122.3075, -122.30500, -122.30485, -122.3025, -122.3000]
    b.add(county, bl_nodes, [blat] * 6, bl_lons,
          tags={"name": "Special Boulevard", "highway": "primary"})
    u = bl_nodes[2]  # south side street ends here (dead end)
    v = bl_nodes[3]  # north side street passes through here (interior)
    s = nid()
    b.add(county, [s, u], [36.9590, blat], [-122.30500, -122.30500],
          tags={"name": "Side Street", "highway": "residential"})
    a_, b_ = nid(), nid()
    b.add(county, [a_, v, b_], [36.9595, blat, 36.9610],
          [-122.30485, -122.30485, -122.30485],
          tags={"name": "Side Street", "highway": "residential"})

    # --- S2: offset crossing, 2 dead ends, <50 m => both kept
    olat = 36.9560
    ob_nodes = [nid() for _ in range(4)]
    ob_lons = [-122.2950, -122.29300, -122.29280, -122.2910]
    b.add(county, ob_nodes, [olat] * 4, ob_lons,
          tags={"name": "Offset Boulevard", "highway": "primary"})
    s2a, s2b = nid(), nid()
    b.add(county, [s2a, ob_nodes[1]], [36.9550, olat], [-122.29300, -122.29300],
          tags={"name": "Offset Street", "highway": "residential"})
    b.add(county, [ob_nodes[2], s2b], [olat, 36.9572], [-122.29280, -122.29280],
          tags={"name": "Offset Street", "highway": "residential"})

    # --- S3: three same-named crossings close together with one dead end
    # (double-carriageway boulevard) => exercises the findNeighbor branch
    # that drops non-dead-end members (js/geo.js:888-901).
    wlat, elat = 36.9580, 36.9578
    wb = [nid() for _ in range(3)]
    eb = [nid() for _ in range(4)]
    b.add(county, wb, [wlat] * 3, [-122.2820, -122.28000, -122.2780],
          tags={"name": "Double Boulevard", "highway": "primary"})
    b.add(county, eb, [elat] * 4, [-122.2820, -122.28000, -122.27985, -122.2780],
          tags={"name": "Double Boulevard", "highway": "primary"})
    t1, t2, t3 = wb[1], eb[1], eb[2]
    x1, x2 = nid(), nid()
    b.add(county, [x1, t2, t1, x2],
          [36.9570, elat, wlat, 36.9590],
          [-122.28000, -122.28000, -122.28000, -122.28000],
          tags={"name": "Triple Street", "highway": "residential"})
    sp = nid()
    b.add(county, [sp, t3], [36.9570, elat], [-122.27985, -122.27985],
          tags={"name": "Triple Street", "highway": "residential"})

    # --- S4: loop road rejoining far away (>50 m) => _2 suffix kept separate
    cl_nodes = [nid() for _ in range(4)]
    cl_lons = [-122.2700, -122.26800, -122.26200, -122.2600]
    b.add(county, cl_nodes, [36.9520] * 4, cl_lons,
          tags={"name": "Country Lane", "highway": "tertiary"})
    m1, m2 = nid(), nid()
    b.add(county, [cl_nodes[1], m1, m2, cl_nodes[2]],
          [36.9520, 36.9540, 36.9540, 36.9520],
          [-122.26800, -122.26700, -122.26300, -122.26200],
          tags={"name": "Loop Road", "highway": "residential"})

    # --- S5: unnamed traffic circle (closed way) touching three named streets
    clat, clon = 36.9700, -122.2600
    r = [nid() for _ in range(4)]
    ring_nodes = [r[0], r[1], r[2], r[3], r[0]]
    d = 0.00030
    ring_lats = [clat + d, clat, clat - d, clat, clat + d]
    ring_lons = [clon, clon + d, clon, clon - d, clon]
    b.add(county, ring_nodes, ring_lats, ring_lons,
          tags={"highway": "residential"})  # tagged but unnamed => JUNCTION path
    ce, cn, cw = nid(), nid(), nid()
    b.add(county, [ce, r[1]], [clat, clat], [clon + 0.0040, clon + d],
          tags={"name": "Circle East Street", "highway": "residential"})
    b.add(county, [cn, r[0]], [clat + 0.0040, clat + d], [clon, clon],
          tags={"name": "Circle North Street", "highway": "residential"})
    b.add(county, [cw, r[3]], [clat, clat], [clon - 0.0040, clon - d],
          tags={"name": "Circle West Street", "highway": "residential"})

    # --- S6: motorway flyover + link-name propagation chain
    # I 80 (ref only) as three short ways; I 580 (multi-ref) crossing the
    # middle one with no shared node => 'Geom' rows, one per shared cover cell.
    lat0, lon0 = 36.9860, -122.3660
    pts = [(lat0 + k * 0.0050, lon0 + k * 0.0060) for k in range(7)]
    pt_nodes = [nid() for _ in pts]  # consecutive ways share chain nodes
    i80 = pt_nodes
    for k in range(3):
        seg = pts[2 * k : 2 * k + 3]
        nodes = pt_nodes[2 * k : 2 * k + 3]
        b.add(county, nodes, [p[0] for p in seg], [p[1] for p in seg],
              tags={"ref": "I 80", "highway": "motorway"})
    # I 580 crosses near pts[3] diagonally the other way
    c580 = [nid() for _ in range(3)]
    b.add(county, c580,
          [36.9990, pts[3][0] + 0.0004, 36.9930],
          [-122.3520, pts[3][1] + 0.0003, -122.3420],
          tags={"ref": "I 580;US 50", "highway": "motorway", "bridge": "yes"})
    # link chain L0 <- L1 <- I80 (L0 listed first to force a second fixpoint pass)
    j80 = i80[4]  # a node on I 80 (interior of chain)
    l1a = nid()
    l0a = nid()
    frn = nid()
    # L0: touches L1's far end only
    b.add(county, [l0a, l1a], [36.9800, 36.9815], [-122.3560, -122.3570],
          tags={"highway": "motorway_link"})
    # L1: from I 80 node to l1a
    b.add(county, [j80, l1a],
          [pts[4][0], 36.9815], [pts[4][1], -122.3570],
          tags={"highway": "motorway_link"})
    # Frontage Road meets L0's far end
    b.add(county, [frn, l0a], [36.9800, 36.9800], [-122.3545, -122.3560],
          tags={"name": "Frontage Road", "highway": "residential"})
    # L9: orphan link touching nothing named
    b.add(county, [nid(), nid()], [36.9700, 36.9705], [-122.3900, -122.3895],
          tags={"highway": "motorway_link"})
    # L2: REF-ONLY link (ref tag, no name tag) from an I 80 node — the
    # reference keys adoption on tags.name alone (js/geo.js:447), so this
    # link is adopted even though getWayName is nonempty: pass 1 emits a
    # wayData row named "CA 13", adoption emits a SECOND row named "I 80"
    # alone (js/geo.js:533), and findDeadEnds sees getWayName(adopted, ref)
    # = "I 80;CA 13" (mutated tags).
    l2a = nid()
    b.add(county, [i80[2], l2a], [pts[2][0], 36.9832], [pts[2][1], -122.3610],
          tags={"ref": "CA 13", "highway": "motorway_link"})
    # a named street at the link's far end makes the TWO-row semantics
    # output-observable: node names there are {"CA 13", "I 80", "Ramp End
    # Road"} (the un-fixed single-row form would see "I 80;CA 13" instead)
    ren = nid()
    b.add(county, [ren, l2a], [36.9832, 36.9832], [-122.3650, -122.3610],
          tags={"name": "Ramp End Road", "highway": "residential"})

    # --- S8: 12 same-named crossings far apart => suffix cap (_2.._9, >=10 overwrite)
    tl = [nid() for _ in range(14)]
    tlons = [-122.3500 + k * 0.0120 for k in range(14)]
    b.add(county, tl, [36.9450] * 14, tlons,
          tags={"name": "Twisty Trail", "highway": "tertiary"})
    for k in range(1, 13):
        ak, bk = nid(), nid()
        b.add(county, [ak, tl[k], bk],
              [36.9440, 36.9450, 36.9460], [tlons[k]] * 3,
              tags={"name": "Repeat Road", "highway": "residential"})

    # --- S9: three-way node (three distinct names at one node)
    tn = nid()
    b.add(county, [nid(), tn], [36.9760, 36.9750], [-122.2500, -122.2500],
          tags={"name": "Trident North", "highway": "residential"})
    b.add(county, [tn, nid()], [36.9750, 36.9750], [-122.2500, -122.2490],
          tags={"name": "Trident East", "highway": "residential"})
    b.add(county, [tn, nid()], [36.9750, 36.9740], [-122.2500, -122.2500],
          tags={"name": "Trident South", "highway": "residential"})

    # --- S10: unnamed service way bridging two named street ends (JUNCTION join)
    ja, jb = nid(), nid()
    b.add(county, [nid(), ja], [36.9660, 36.9650], [-122.2400, -122.2400],
          tags={"name": "Jay Street", "highway": "residential"})
    b.add(county, [jb, nid()], [36.9650, 36.9660], [-122.2390, -122.2390],
          tags={"name": "Kay Street", "highway": "residential"})
    b.add(county, [ja, jb], [36.9650, 36.9650], [-122.2400, -122.2390],
          tags={"highway": "service"})

    # --- S7: NAMED closed-loop way: endpoint node toggles twice => NOT a
    # dead end (parity semantics of toggleValueSet, js/geo.js:599-610)
    rr = [nid() for _ in range(4)]
    rlat, rlon = 36.9690, -122.2300
    e = 0.00060
    b.add(county, [rr[0], rr[1], rr[2], rr[3], rr[0]],
          [rlat + e, rlat, rlat - e, rlat, rlat + e],
          [rlon, rlon + e, rlon, rlon - e, rlon],
          tags={"name": "Ring Road", "highway": "residential"})
    b.add(county, [nid(), rr[1]], [rlat, rlat], [rlon + 0.0030, rlon + e],
          tags={"name": "Ring Street", "highway": "residential"})

    # --- untagged way (skipped everywhere)
    b.add(county, [nid(), nid()], [36.9400, 36.9405], [-122.3950, -122.3945],
          tags=None)


_WAY_SCHEMA = pa.schema(
    [
        ("county", pa.string()),
        ("way_id", pa.int64()),
        ("way_rank", pa.int32()),
        ("minlat", pa.float64()),
        ("minlon", pa.float64()),
        ("maxlat", pa.float64()),
        ("maxlon", pa.float64()),
        ("nodes", pa.list_(pa.int64())),
        ("lats", pa.list_(pa.float64())),
        ("lons", pa.list_(pa.float64())),
        ("tagged", pa.bool_()),
        ("name", pa.string()),
        ("ref", pa.string()),
        ("highway", pa.string()),
        ("bridge", pa.string()),
        ("junction", pa.string()),
    ]
)


def build_ways(scale: float) -> pa.Table:
    b = _WayBuilder()
    g = _grid_size(scale)
    city_idx = 0
    for county in WORLD["counties"]:
        for city in county["cities"]:
            gg = max(4, int(g * city["grid"]))
            _city_grid(b, county["name"], city_idx, city["name"], city["rect"], gg)
            city_idx += 1
        if county["name"] == "Alpha County":
            _specials(b)
    # re-number way_rank within county (reference: one county = one input file)
    per_county: dict[str, int] = {}
    for row in b.rows:
        r = per_county.get(row["county"], 0)
        row["way_rank"] = r
        per_county[row["county"]] = r + 1
    cols = {f.name: [row[f.name] for row in b.rows] for f in _WAY_SCHEMA}
    return pa.table(cols, schema=_WAY_SCHEMA)


def _rect_ring(rect) -> list[list[float]]:
    la0, lo0, la1, lo1 = rect
    return [[lo0, la0], [lo1, la0], [lo1, la1], [lo0, la1], [lo0, la0]]


def build_boundaries() -> pa.Table:
    names, kinds, orders, geoms = [], [], [], []
    order = 0
    for county in WORLD["counties"]:
        names.append(county["name"])
        kinds.append("county")
        orders.append(order)
        geoms.append(json.dumps([_rect_ring(county["rect"])]))
        order += 1
        for city in county["cities"]:
            names.append(city["name"])
            kinds.append("city")
            orders.append(order)
            geoms.append(json.dumps([_rect_ring(city["rect"])]))
            order += 1
    return pa.table(
        {
            "name": names,
            "kind": kinds,
            "file_order": pa.array(orders, pa.int32()),
            "geom_json": geoms,
        }
    )


def build_county_cities() -> pa.Table:
    return pa.table(
        {
            "county": [c["name"] for c in WORLD["counties"]],
            "cities": [[city["name"] for city in c["cities"]] for c in WORLD["counties"]],
            "county_code": pa.array([c["code"] for c in WORLD["counties"]], pa.int32()),
        }
    )


def build_pages(scale: float) -> pa.Table:
    """Common-Crawl-style pages (BASELINE.json input_hint): url, warc_ts,
    html, text, lang.  html embeds the coordinate (geo.position meta) and the
    exact text payload inside <article>...</article>."""
    n = max(200, int(scale * 1_000_000))
    rng = np.random.default_rng(20260817)
    langs = np.array(["en", "de", "fr", "es"])
    lang_idx = rng.integers(0, 4, n)
    # coordinates: 80% in a city, 15% county-only, 5% outside
    city_rects = [c["rect"] for county in WORLD["counties"] for c in county["cities"]]
    kind = rng.random(n)
    lat = np.empty(n)
    lon = np.empty(n)
    ci = rng.integers(0, len(city_rects), n)
    u1, u2 = rng.random(n), rng.random(n)
    for k, rect in enumerate(city_rects):
        m = ci == k
        la0, lo0, la1, lo1 = rect
        lat[m] = la0 + u1[m] * (la1 - la0)
        lon[m] = lo0 + u2[m] * (lo1 - lo0)
    county_only = kind > 0.80
    lat[county_only] = 36.905 + u1[county_only] * 0.11  # south band, no cities
    lon[county_only] = -122.39 + u2[county_only] * 0.85
    outside = kind > 0.95
    lat[outside] = 35.0 + u1[outside] * 1.0
    lon[outside] = -120.0 + u2[outside] * 1.0

    n_words = np.clip(rng.normal(60, 20, n), 10, 200).astype(int)
    urls, htmls, texts, tss = [], [], [], []
    base_ts = np.datetime64("2025-06-01T00:00:00", "us")
    word_choices = {L: rng.integers(0, len(_WORD_POOLS[L]), size=int(n_words.sum()))
                    for L in _WORD_POOLS}
    offs = {L: 0 for L in _WORD_POOLS}
    # outlink space: targets beyond n are FRONTIER urls (never crawled);
    # pages link with a deterministic LCG walk so the link graph (and every
    # anchor-text / frontier oracle over it) is reproducible from the html
    m_link = n + n // 8 + 1
    for i in range(n):
        L = langs[lang_idx[i]]
        pool = _WORD_POOLS[L]
        k = int(n_words[i])
        idx = word_choices[L][offs[L] : offs[L] + k]
        offs[L] += k
        text = " ".join(pool[w] for w in idx)
        url = f"https://example.org/{L}/page-{i:07d}"
        links = []
        for t in range(1, (i % 4) + 1):
            j = (i * 48271 + 7919 * t) % m_link
            lj = langs[lang_idx[j]] if j < n else "xx"
            anchor = f"{pool[(i + 13 * t) % len(pool)]} {pool[(j + 7) % len(pool)]}"
            links.append(
                f'<a href="https://example.org/{lj}/page-{j:07d}">{anchor}</a>')
        html = (
            f"<html><head><title>Page {i}</title>\n"
            f'<meta name="geo.position" content="{float(lat[i])!r};{float(lon[i])!r}">\n'
            f'<meta name="language" content="{L}">\n'
            f"</head><body>\n<nav>home | about | contact | archive</nav>\n"
            f"<article>{text}</article>\n"
            f'<p class="links">{"".join(links)}</p>\n'
            f"<footer>(c) example.org crawl corpus</footer></body></html>"
        )
        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        tss.append(base_ts + np.timedelta64(int(i) * 977, "s"))
    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": texts,
            "lang": pa.array([str(langs[j]) for j in lang_idx]),
        }
    )


def replicate_world(tbl: pa.Table, replicas: int, kind: str) -> pa.Table:
    """Shift-copy the two-county world east by 1 degree per extra replica.
    Deterministic renames keep counties/ids/urls globally distinct."""
    if replicas <= 1:
        return tbl
    import pyarrow.compute as pc

    parts = [tbl]
    for r in range(1, replicas):
        t = tbl
        shift = float(r) * 1.0
        if kind == "ways":
            cols = {}
            for name in t.schema.names:
                cols[name] = t[name]
            cols["county"] = pa.array([f"{c} r{r}" for c in t["county"].to_pylist()])
            cols["way_id"] = pc.add(t["way_id"], 10_000_000 * r)
            cols["nodes"] = pa.array(
                [[n + 100_000_000_000 * r for n in lst]
                 for lst in t["nodes"].to_pylist()], pa.list_(pa.int64()))
            for c in ("minlon", "maxlon"):
                cols[c] = pc.add(t[c], shift)
            cols["lons"] = pa.array(
                [[x + shift for x in lst] for lst in t["lons"].to_pylist()],
                pa.list_(pa.float64()))
            t = pa.table(cols, schema=t.schema)
        elif kind == "boundaries":
            geoms = []
            for g in t["geom_json"].to_pylist():
                rings = json.loads(g)
                geoms.append(json.dumps(
                    [[[xy[0] + shift, xy[1]] for xy in ring] for ring in rings]))
            t = pa.table({
                "name": [f"{n} r{r}" for n in t["name"].to_pylist()],
                "kind": t["kind"],
                "file_order": pc.add(t["file_order"],
                                     pa.scalar(1000 * r, pa.int32())),
                "geom_json": geoms,
            })
        elif kind == "county_cities":
            t = pa.table({
                "county": [f"{c} r{r}" for c in t["county"].to_pylist()],
                "cities": pa.array(
                    [[f"{x} r{r}" for x in lst] for lst in t["cities"].to_pylist()],
                    pa.list_(pa.string())),
                "county_code": pc.add(t["county_code"],
                                      pa.scalar(100 * r, pa.int32())),
            })
        elif kind == "pages":
            import re as _re

            htmls = []
            for h in t["html"].to_pylist():
                txt = h.decode("utf-8")
                m = _re.search(r'content="([^;]+);([^"]+)"', txt)
                lon = float(m.group(2)) + shift
                txt = txt.replace(m.group(0), f'content="{m.group(1)};{lon!r}"')
                htmls.append(txt.encode("utf-8"))
            t = pa.table({
                "url": [f"{u}?r={r}" for u in t["url"].to_pylist()],
                "warc_ts": t["warc_ts"],
                "html": pa.array(htmls, pa.binary()),
                "text": t["text"],
                "lang": t["lang"],
            })
        parts.append(t)
    return pa.concat_tables(parts)


def ensure_fixtures(sf_dir: str) -> str:
    """Generate (once, cached) the synthetic spatial tables for a scale
    factor; returns the fixture directory containing ways.parquet,
    boundaries.parquet, county_cities.parquet, pages.parquet."""
    label, scale, replicas = scale_from_sf_dir(sf_dir)
    out_dir = os.path.join(FIXTURE_ROOT, label)
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=FIXTURE_ROOT, prefix=f".{label}.")
    try:
        ways = replicate_world(build_ways(scale), replicas, "ways")
        # re-densify way_rank per county after replication (ranks are copies)
        pq.write_table(ways, os.path.join(tmp, "ways.parquet"),
                       row_group_size=4096)
        pq.write_table(replicate_world(build_boundaries(), replicas, "boundaries"),
                       os.path.join(tmp, "boundaries.parquet"))
        pq.write_table(replicate_world(build_county_cities(), replicas, "county_cities"),
                       os.path.join(tmp, "county_cities.parquet"))
        # pages is the CORPUS side: write it as a sharded directory (the
        # production layout — 100 TB of crawl parquet is always many
        # files).  Ray's parquet reader parallelizes at FILE granularity
        # (one read task per file, no intra-file splitting in this
        # version), so a single giant pages file serializes every read —
        # measured at r64: the whole 6.4M-page kNN join fused into ONE
        # read task, ~33 s flat at any CPU count.  Shards are sliced in
        # row order with zero-padded names, so the concatenated read
        # order is identical to the old single file on every reader
        # (ray.data, pyarrow dataset, DuckDB sorted glob).
        pages_tbl = replicate_world(build_pages(scale), replicas, "pages")
        n_shards_out = max(8, -(-pages_tbl.num_rows // 200_000))
        pages_dir = os.path.join(tmp, "pages.parquet")
        os.makedirs(pages_dir)
        step = -(-pages_tbl.num_rows // n_shards_out)
        for si in range(n_shards_out):
            sl = pages_tbl.slice(si * step, step)
            if sl.num_rows == 0:
                break
            pq.write_table(sl, os.path.join(pages_dir, f"part-{si:05d}.parquet"),
                           row_group_size=8192)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        if not os.path.exists(marker):
            os.replace(tmp, out_dir) if not os.path.exists(out_dir) else shutil.rmtree(tmp)
        else:
            shutil.rmtree(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir
