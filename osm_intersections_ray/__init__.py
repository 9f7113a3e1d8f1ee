"""osm_intersections_ray — a from-scratch Ray-Data-native spatial-join + tiling engine.

Re-expresses the semantics of the reference engine (jw997/osm-intersections,
a single-process Node.js pipeline) as distributed Ray Data pipelines:

* ways/nodes become Arrow tables (``ray.data.Dataset``),
* the shared-node intersection join is a ``flat_map`` explode + ``groupby(node_id)``,
* the geometric segment-crossing join is a 0.01-degree cell-keyed hash join
  (``groupby(cell)`` — the spatial grid index of the reference becomes the shuffle key),
* roundabout/boulevard coalescing is a ``groupby(streets)`` with tiny groups,
* city tagging is a broadcast point-in-polygon actor pool,
* the grafted Common-Crawl-style pages table is geotagged and spatial-joined to
  road tiles through the same cell keys.

Order-dependent reference semantics (JS Map insertion order, first-match wins)
are made distribution-safe by carrying explicit rank columns instead of relying
on execution order.  See SURVEY.md for the file:line map into the reference.
"""

__version__ = "0.1.0"
