"""Driver contract for the Ray-Data-native spatial-join + tiling engine.

``entry()``: flagship pipeline (reference-exact intersections over the
deterministic synthetic ways world derived for sf0.001).
``queries()``/``oracle_sql()``: one entry per implemented operator from
SURVEY.md section 2 plus the training-data graft ops; see
``osm_intersections_ray/queries.py``.

Ray is initialized by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: full intersections pipeline at sf0.001 scale."""
    from osm_intersections_ray.pipelines.intersections import intersections_pipeline
    from osm_intersections_ray.sources.synthetic import ensure_fixtures

    fx = ensure_fixtures("/root/testdata/sf0.001")
    return intersections_pipeline(fx)


def queries() -> dict[str, Callable[[str], Any]]:
    from osm_intersections_ray.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from osm_intersections_ray.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
