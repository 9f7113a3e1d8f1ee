"""Unit tests for the scalar kernels (reference semantics, SURVEY.md 2.8)."""

import numpy as np
import pytest

from osm_intersections_ray.functions import cells, scalar
from osm_intersections_ray.functions.geometry import (
    first_line_crossing,
    point_in_ring,
    points_in_ring_np,
    seg_intersect,
)


def test_get_way_name():
    assert scalar.get_way_name("Main St", None) == "Main St"
    assert scalar.get_way_name(None, "I 80") == "I 80"
    assert scalar.get_way_name("Hwy", "CA 1;US 101") == "Hwy;CA 1;US 101"
    assert scalar.get_way_name(None, None) == ""
    assert scalar.get_way_name("", "") == ""  # JS falsy empty strings


def test_clean_streets_first_match_only():
    # /_[0-9]/ without global flag removes only the FIRST underscore+digit
    assert scalar.clean_streets("A_2/B") == "A/B"
    assert scalar.clean_streets("A_2/B_3") == "A/B_3"
    assert scalar.clean_streets("Road_9x") == "Roadx"
    assert scalar.clean_streets("B/A/B") == "A/B"  # dedup + sort


def test_fix6_js_round_semantics():
    # JS Math.round = floor(x+0.5): an exact -0.5 product rounds UP to -0
    # (-5e-7 * 1e6 is exactly -0.5 in float64)
    assert scalar.fix6(-5e-7) == 0.0
    # inexact products follow the float value, same as V8 would see:
    # -1.0000005*1e6 = -1000000.5000000001 -> floor(...+0.5) = -1000001
    assert scalar.fix6(-1.0000005) == -1.000001
    assert scalar.fix6(1.0000005) == 1.000001
    assert scalar.fix6(37.123456789) == 37.123457
    arr = scalar.fix6_np(np.array([1.0000005, -5e-7]))
    assert arr[0] == 1.000001 and arr[1] == 0.0


def test_dist_l1():
    assert scalar.dist_l1_m(37.0, -122.0, 37.0001, -122.0002) == pytest.approx(30.0)


def test_check_highway_types():
    f = scalar.check_highway_types
    assert f("motorway", "motorway", False) is True   # flyover
    assert f("motorway", "motorway", True) is False
    assert f("motorway", "motorway_link", False) is False
    assert f("motorway_link", "residential", True) is True
    assert f("residential", "primary", True) is True


def test_cover_cells_vs_int_version():
    """The float-accumulation loop (exact reference semantics) may DROP the
    last row/column when drift pushes the loop variable past the max bound —
    that loss is part of the reference's observable behavior.  The integer
    version is a superset; any difference sits on the max edges only."""
    rng = np.random.default_rng(5)
    diffs = 0
    for _ in range(300):
        la0, lo0 = 36 + rng.random() * 2, -123 + rng.random() * 2
        la1, lo1 = la0 + rng.random() * 0.05, lo0 + rng.random() * 0.05
        f = set(cells.cover_cells(la0, lo0, la1, lo1))
        i = set(cells.cover_cells_int(la0, lo0, la1, lo1))
        assert f <= i
        for c in i - f:
            klng, klat = cells.unpack_cell(c)
            import math
            assert klng == math.ceil(lo1 * 100) or klat == math.ceil(la1 * 100)
        diffs += bool(i - f)
    assert diffs < 300  # they do agree most of the time


def test_cover_cells_order():
    # lng outer ascending, lat inner ascending (js/gpsBins.js:104-105)
    got = cells.cover_cells(36.995, -122.015, 37.005, -122.005)
    ks = [cells.unpack_cell(c) for c in got]
    assert ks == sorted(ks)


def test_tiles_roundtrip_and_compact():
    t = cells.tile_of(37.1, -122.3, 17)
    assert cells.tile_res(t) == 17
    minlat, minlon, maxlat, maxlon = cells.tile_bounds(t)
    assert minlat <= 37.1 < maxlat and minlon <= -122.3 < maxlon
    p = cells.tile_parent(t, 15)
    assert t in [c for k in cells.tile_children(cells.tile_children(p)[0])
                 for c in [k]] or cells.tile_parent(t, 16) in cells.tile_children(p)
    cover = cells.cover_bbox_tiles(37.0, -122.4, 37.2, -122.2, 12)
    compacted = cells.compact_tiles(cover)
    assert len(compacted) <= len(cover)
    # compacted cover spans the same area: expanding children back gives cover
    expanded = set()
    def expand(c):
        if cells.tile_res(c) == 12:
            expanded.add(c)
        else:
            for ch in cells.tile_children(c):
                expand(ch)
    for c in compacted:
        expand(c)
    assert expanded == set(cover)


def test_seg_intersect_and_first_crossing():
    assert seg_intersect(0, 0, 1, 1, 0, 1, 1, 0) == (0.5, 0.5)
    assert seg_intersect(0, 0, 1, 0, 0, 1, 1, 1) is None  # parallel
    assert seg_intersect(0, 0, 1, 1, 2, 2, 3, 3) is None  # collinear
    # first crossing = first (i,j) segment pair
    hit = first_line_crossing([0, 2, 0], [0, 1, 2], [1, 1], [-1, 3])
    assert hit is not None and hit[0] == 1.0


def test_point_in_ring():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    assert point_in_ring(1, 1, ring)
    assert not point_in_ring(3, 1, ring)
    assert point_in_ring(0, 1, ring)  # boundary counts inside
    m = points_in_ring_np(np.array([1.0, 3.0]), np.array([1.0, 1.0]), ring)
    assert m.tolist() == [True, False]


def test_gmap_url():
    """gmapUrl formatter (js/offset.js:133-137): JS template spacing and JS
    Number stringification (integer-valued doubles lose the '.0')."""
    from osm_intersections_ray.functions.scalar import gmap_url

    assert gmap_url(37.864215, -122.267801) == "   37.864215,-122.267801  "
    assert gmap_url(37.0, -122.0) == "   37,-122  "
