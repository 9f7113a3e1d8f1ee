import json
import os

import pyarrow as pa


def _mini_rows():
    return pa.table({
        "county": ["Alpha County"] * 3,
        "lat": [37.0, 37.1, 37.2],
        "lon": [-122.0, -122.1, -122.2],
        "streets": pa.array([["Ashby Avenue", "Main St"],
                             ["Oak St", "Pine St"],
                             ["Ahby Ave", "Elm St"]], pa.list_(pa.string())),
        "node_id": pa.array([1, 2, None], pa.int64()),
        "node_id_kind": ["node", "node", "geom"],
        "way_ids": pa.array([[10, 11], [12], [13, 14]], pa.list_(pa.int64())),
        "city": ["Alphaville", "Alphatown", "Alphaville"],
        "source": ["node", "node", "geom"],
    })


def test_ui_filter(ray_session):
    import ray.data as rd

    from osm_intersections_ray.stages.filters import (
        filter_intersections,
        fuzzy_street_filter,
    )

    ds = rd.from_arrow(_mini_rows())
    assert filter_intersections(ds, "Ashby", "Main").count() == 1
    assert filter_intersections(ds, "Ashby", "Main", city="Alphatown").count() == 0
    # fuzzy synonyms catch the misspelling too (streetArray pattern style)
    assert fuzzy_street_filter(ds, ["Ashby", "Ahby", "Asby"]).count() == 2


def test_anti_join(ray_session):
    import ray.data as rd

    from osm_intersections_ray.stages.filters import customers_without_orders

    cust = rd.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": ["a", "b", "c"],
    }))
    orders = pa.table({"o_custkey": pa.array([1, 3], pa.int64()),
                       "o_orderstatus": ["P", "P"]})
    out = customers_without_orders(cust, orders).take_all()
    assert [r["c_custkey"] for r in out] == [2]


def test_geojson_export(tmp_path):
    from osm_intersections_ray.sinks import rows_to_geojson, write_geojson

    rows = _mini_rows().to_pylist()
    gj = rows_to_geojson(rows)
    assert gj["type"] == "FeatureCollection"
    f = gj["features"][2]
    assert f["properties"]["nodeId"] == "Geom"  # sentinel restored
    assert f["geometry"]["coordinates"] == [-122.2, 37.2]
    p = str(tmp_path / "out.geojson")
    n = write_geojson(rows, p)
    assert n == 3 and json.load(open(p))["features"][0]["properties"]["cityName"] == "Alphaville"
