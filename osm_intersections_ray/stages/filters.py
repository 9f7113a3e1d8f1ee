"""Filter-side operators: the browser UI's street/city filter and the fuzzy
street-synonym matcher, re-expressed as vectorized Dataset filters
(SURVEY.md M14/M15, js/util.js:241-287, js/utils_helper.js:16-494), plus the
coordinate anti-join (J13, js/util.js:388-406).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def filter_intersections(ds, pattern1: str = "", pattern2: str = "",
                         city: str | None = None):
    """Keep intersection rows whose streets contain BOTH substrings and
    (optionally) whose city equals the filter — the UI predicate
    (js/util.js:275-287).  Vectorized with pyarrow match_substring."""

    def fn(b: pa.Table) -> pa.Table:
        streets = pc.binary_join(b["streets"], "/")
        mask = pc.and_(
            pc.match_substring(streets, pattern1) if pattern1 else
            pa.array([True] * b.num_rows),
            pc.match_substring(streets, pattern2) if pattern2 else
            pa.array([True] * b.num_rows),
        )
        if city is not None:
            mask = pc.and_(mask, pc.equal(b["city"], city))
        return b.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def fuzzy_street_filter(ds, synonyms: list[str]):
    """Fuzzy street matcher: a '|'-alternation of synonym spellings
    (the streetArray user-extension surface, js/utils_helper.js:16-494),
    applied as one compiled regex per batch."""
    pattern = "|".join(synonyms)

    def fn(b: pa.Table) -> pa.Table:
        streets = pc.binary_join(b["streets"], "/")
        return b.filter(pc.match_substring_regex(streets, pattern))

    return ds.map_batches(fn, batch_format="pyarrow")


def anti_join_keys(ds, key_col: str, exclude_keys_ref):
    """Generic broadcast anti-join (J13 set-subtract): drop rows whose key is
    in the broadcast exclusion set.  The small side ships once via ray.put;
    no shuffle (ray_guide 'Semi / anti join')."""
    from .common import cached_get

    def fn(b: pa.Table) -> pa.Table:
        exclude = cached_get(exclude_keys_ref)
        keys = b[key_col].to_pylist()
        return b.filter(pa.array([k not in exclude for k in keys]))

    return ds.map_batches(fn, batch_format="pyarrow")


def customers_without_orders(customer_ds, orders_tbl: pa.Table,
                             status: str = "P"):
    """J13 exercised on real tables: customers with no orders of the given
    status (broadcast key-set anti-join; the status filter keeps the result
    non-empty on the testdata)."""
    import ray

    mask = pc.equal(orders_tbl["o_orderstatus"], status)
    keys = set(orders_tbl.filter(mask)["o_custkey"].to_pylist())
    ref = ray.put(keys)
    out = anti_join_keys(customer_ds, "c_custkey", ref)
    return out.select_columns(["c_custkey", "c_name"])


def customers_without_orders_sql(status: str = "P") -> str:
    return ("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS ("
            "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            f"AND o.o_orderstatus = '{status}')")
