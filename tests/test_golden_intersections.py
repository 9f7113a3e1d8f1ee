"""Golden end-to-end test: the distributed pipeline must equal the
single-process reference-semantics oracle as a multiset over ALL output
columns, including duplicate geometric rows (one per shared cover cell)."""

from collections import Counter

import pyarrow.parquet as pq
import pytest

from osm_intersections_ray.oracle.reference_oracle import run_oracle


def _key(r):
    return (
        r["county"], r["lat"], r["lon"], tuple(r["streets"]), r["node_id"],
        r["node_id_kind"], tuple(int(x) for x in r["way_ids"]), r["city"], r["source"],
    )


@pytest.fixture(scope="module")
def oracle_rows(fixtures_dir):
    ways = pq.read_table(fixtures_dir + "/ways.parquet")
    bd = pq.read_table(fixtures_dir + "/boundaries.parquet")
    cc = pq.read_table(fixtures_dir + "/county_cities.parquet")
    rows = []
    for county in ("Alpha County", "Beta County"):
        for r in run_oracle(ways, bd, cc, county):
            r["county"] = county
            rows.append(r)
    return rows


def test_pipeline_matches_oracle(ray_session, fixtures_dir, oracle_rows):
    from osm_intersections_ray.pipelines.intersections import intersections_pipeline

    rows = intersections_pipeline(fixtures_dir).take_all()
    ek = Counter(_key(r) for r in rows)
    ok = Counter(_key(r) for r in oracle_rows)
    assert sum((ok - ek).values()) == 0, f"missing: {list((ok - ek).items())[:5]}"
    assert sum((ek - ok).values()) == 0, f"extra: {list((ek - ok).items())[:5]}"


def test_oracle_specials(oracle_rows):
    """Pin the edge-case behaviors the fixtures were built to exercise."""
    by_street = {}
    for r in oracle_rows:
        by_street.setdefault("/".join(r["streets"]), []).append(r)

    # dead-end + boulevard <50m: averaged into one row
    assert len(by_street["Side Street/Special Boulevard"]) == 1
    # offset crossing (2 dead ends): both kept
    assert len(by_street["Offset Boulevard/Offset Street"]) == 2
    # findNeighbor quirk: non-dead-end members dropped, one averaged row
    assert len(by_street["Double Boulevard/Triple Street"]) == 1
    # loop road >50m: _2 suffix path, both kept
    assert len(by_street["Country Lane/Loop Road"]) == 2
    # traffic circle: JUNCTION rows averaged then token dropped
    assert len(by_street["Circle East Street/Circle North Street/Circle West Street"]) == 1
    # suffix cap: 12 collisions -> 9 rows (_2.._9 + overwritten base)
    assert len(by_street["Repeat Road/Twisty Trail"]) == 9
    # geometric flyover: both directions x shared cover cells, node_id_kind=geom
    geom = by_street["I 580;US 50/I 80"]
    assert len(geom) == 12 and all(r["node_id_kind"] == "geom" for r in geom)
    # ramp touchdown via propagated link name
    assert len(by_street["Frontage Road/I 80"]) == 1


def test_city_assignment(oracle_rows):
    cities = {r["city"] for r in oracle_rows}
    assert {"Alphaville", "Alphatown", "Alphaburg", "Betaville", "Betatown",
            "Unincorporated"} <= cities
    # overlap strip (lat 37.19-37.20 x lon [-122.38,-122.21]) resolves to the
    # earlier file-order city (Alphaville), never Alphaburg
    for r in oracle_rows:
        if 37.19 < r["lat"] < 37.20 and -122.38 < r["lon"] < -122.21:
            assert r["city"] == "Alphaville"


def test_geometric_only_variant(ray_session, fixtures_dir):
    """The geoturf-variant pipeline equals geoturf's own writer semantics
    (js/geoturf.js:1151-1168): RAW unrounded coordinates + nodeId — built
    here from the oracle's raw geometric rows, NOT the fix6-rounded
    geo.js slice."""
    from collections import Counter

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from osm_intersections_ray.oracle.reference_oracle import (
        GEOM_SENTINEL, ReferenceOracle,
    )
    from osm_intersections_ray.pipelines.intersections import geometric_only_pipeline

    ways = pq.read_table(fixtures_dir + "/ways.parquet")
    want: Counter = Counter()
    for county in ("Alpha County", "Beta County"):
        orc = ReferenceOracle(ways.filter(pc.equal(ways["county"], county)))
        orc.init_way_data()
        for i in orc.find_intersections_geometric():
            is_geom = i.node_id == GEOM_SENTINEL
            want[(county, i.lat, i.lon, tuple(i.streets.split("/")),
                  None if is_geom else int(i.node_id),
                  "geom" if is_geom else "node")] += 1

    rows = geometric_only_pipeline(fixtures_dir).take_all()
    got = Counter((r["county"], r["lat"], r["lon"], tuple(r["streets"]),
                   r["node_id"], r["node_id_kind"]) for r in rows)
    assert got == want and sum(want.values()) > 0
    # raw coordinates: at least one row must carry more precision than fix6
    # (the geoturf variant skips the fix6 rounding, geoturf.js:1151-1168)
    assert any(abs(k[1] * 1e6 - round(k[1] * 1e6)) > 1e-9 for k in got)


def test_find_closest_matches_oracle(ray_session, fixtures_dir):
    """nearest-two reverse geocoder (J11/O4): the engine's ring-expansion
    NearestTwo over the full wayData population must equal the sequential
    findClosest transliteration (js/geo.js:1319-1361) probe-for-probe —
    mirroring the reference's 12 commented acceptance probes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_intersections_ray.oracle.reference_oracle import ReferenceOracle
    from osm_intersections_ray.pipelines.intersections import build_waydata
    from osm_intersections_ray.stages.knn import nearest_two_from_waydata

    county = "Alpha County"
    ways = pq.read_table(fixtures_dir + "/ways.parquet")
    import pyarrow.compute as pc

    orc = ReferenceOracle(ways.filter(pc.equal(ways["county"], county)))
    orc.init_way_data()

    # 12 probe points across the synthetic world (incl. off-grid and
    # far-from-road points, like the reference's commented tp1..tp12)
    pts = [(36.91 + 0.037 * k, -122.41 + 0.051 * k) for k in range(10)]
    pts += [(37.0005, -122.2005), (36.95, -121.9)]  # near-vertex + far east
    probes = pa.table({
        "k": pa.array(range(len(pts)), pa.int64()),
        "qlat": pa.array([p[0] for p in pts], pa.float64()),
        "qlon": pa.array([p[1] for p in pts], pa.float64()),
    })

    waydata_ds = build_waydata(fixtures_dir, [county])
    got = {r["k"]: r["closest"]
           for r in nearest_two_from_waydata(waydata_ds, probes).take_all()}
    for k, (la, lo) in enumerate(pts):
        assert got[k] == orc.find_closest(la, lo), (k, la, lo, got[k])
