"""General relational operators over the TPC-H-shaped testdata — the engine's
groupby-aggregate / broadcast-join / sort-limit building blocks exercised on
real tables (pricing summary, dimension join, top-k).  Aggregates are integer
cents; joins broadcast the small side (ray_guide "Joins and lookups")."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import cap_join_partitions, n_shards

from ..functions.scalar import round_half_away_np

# Partial-aggregate outputs carry a PINNED schema: pandas infers object/float
# dtypes on empty or degenerate batches, and Ray then logs a benign-but-noisy
# "RefBundle with a different schema" warning that would mask real drift.
_PRICING_PARTIAL_SCHEMA = pa.schema([
    ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
    ("n", pa.int64()), ("sum_qty", pa.int64()),
    ("sum_price_cents", pa.int64()), ("sum_disc_cents", pa.int64()),
])


def pricing_summary(ds):
    """TPC-H Q1-shaped: per (returnflag, linestatus): row count, sum qty,
    sum extendedprice cents, sum discounted cents — partial per batch then a
    tiny groupby (the two-phase aggregate pattern)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        px_c = round_half_away_np(px * 100)
        # discounted price in integer cents: round half-away like rint? use
        # floor(x+0.5) farming through rint on positives (prices positive)
        disc_c = round_half_away_np(px * (1 - disc) * 100)
        df = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_pandas(),
            "l_linestatus": b["l_linestatus"].to_pandas(),
            "n": 1,
            "qty": round_half_away_np(qty),
            "price_cents": px_c,
            "disc_cents": disc_c,
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            n=("n", "sum"), sum_qty=("qty", "sum"),
            sum_price_cents=("price_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_PRICING_PARTIAL_SCHEMA).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("sum_disc_cents", alias_name="sum_disc_cents"),
    )


def pricing_summary_sql(table: str = "lineitem") -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       count(*)::BIGINT AS n,
       sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_price_cents,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT AS sum_disc_cents
FROM {table} GROUP BY 1, 2
"""


_REVENUE_PARTIAL_SCHEMA = pa.schema([
    ("n_name", pa.string()), ("n_orders", pa.int64()),
    ("revenue_cents", pa.int64()),
])


def revenue_by_nation(orders_ds, customer_tbl: pa.Table, nation_tbl: pa.Table):
    """Broadcast join: orders x customer x nation (both dims tiny) -> revenue
    cents per nation.  The dims ship once via closure capture (pandas Series
    for vectorized `.map` lookups); orders stream."""
    cust = pd.Series(customer_tbl["c_nationkey"].to_numpy(zero_copy_only=False),
                     index=customer_tbl["c_custkey"].to_numpy(zero_copy_only=False))
    nation = pd.Series(nation_tbl["n_name"].to_pylist(),
                       index=nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False))
    from ray.data.aggregate import Sum

    def join(b: pa.Table) -> pa.Table:
        keys = pd.Series(b["o_custkey"].to_numpy(zero_copy_only=False))
        price = b["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = round_half_away_np(price * 100)
        names = keys.map(cust).map(nation)  # two C-speed hash gathers
        df = pd.DataFrame({"n_name": names.to_numpy(), "cents": cents})
        g = df.groupby("n_name", sort=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_REVENUE_PARTIAL_SCHEMA).replace_schema_metadata(None)

    partials = orders_ds.map_batches(join, batch_format="pyarrow")
    return partials.groupby("n_name").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )


def revenue_by_nation_sql() -> str:
    return """
SELECT n.n_name,
       count(*)::BIGINT AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
"""


def top_parts(ds, k: int = 10):
    """Top-k by retail price with deterministic tie-break (p_partkey asc):
    per-batch local top-k, then a final driver-side merge of k rows/batch —
    never a global sort."""

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["price_cents"] = round_half_away_np(df["p_retailprice"].to_numpy() * 100)
        df = df.sort_values(["price_cents", "p_partkey"],
                            ascending=[False, True], kind="stable").head(k)
        return pa.Table.from_pandas(
            df[["p_partkey", "p_name", "price_cents"]],
            preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["price_cents", "p_partkey"],
                              ascending=[False, True], kind="stable").head(k)
    return parts.reset_index(drop=True)


def top_parts_sql(k: int = 10) -> str:
    return f"""
SELECT p_partkey, p_name,
       CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
FROM part ORDER BY price_cents DESC, p_partkey ASC LIMIT {k}
"""


def top_parts_per_brand(ds, k: int = 3):
    """GROUPED top-k (k per brand) without a global sort: each batch emits
    its local top-k per brand (so the shuffle carries at most
    k x brands x batches rows), then a tiny ``groupby(brand)`` takes the
    final top-k per group.  Tie-break p_partkey asc; rank column included."""

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["price_cents"] = round_half_away_np(df["p_retailprice"].to_numpy() * 100)
        df = df.sort_values(["p_brand", "price_cents", "p_partkey"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("p_brand", sort=False).head(k)
        return pa.Table.from_pandas(
            df[["p_brand", "p_partkey", "p_name", "price_cents"]],
            preserve_index=False).replace_schema_metadata(None)

    def final_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["price_cents", "p_partkey"],
                          ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            g[["p_brand", "p_partkey", "p_name", "price_cents", "rk"]],
            preserve_index=False).replace_schema_metadata(None)

    return (ds.map_batches(local_topk, batch_format="pyarrow")
            .groupby("p_brand").map_groups(final_topk, batch_format="pandas"))


def top_parts_per_brand_sql(k: int = 3) -> str:
    return f"""
WITH r AS (
  SELECT p_brand, p_partkey, p_name,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY CAST(round(p_retailprice * 100) AS BIGINT) DESC,
                                     p_partkey ASC) AS rk
  FROM part
)
SELECT p_brand, p_partkey, p_name, price_cents, rk::BIGINT AS rk
FROM r WHERE rk <= {k}
"""


# --- TPC-H Q3-shaped: 3-table join chain + grouped revenue + top-k -----------
Q3_SEGMENT = "BUILDING"
# cutoff mid-range of the synthetic order/ship dates (1995..2001): both join
# sides stay selective (orders before, shipments after); tz-free epoch-us
Q3_CUTOFF_US = int(np.datetime64("1998-06-01T00:00:00", "us").astype(np.int64))


BROADCAST_CUST_MAX = 2_000_000  # same crossover idea as pages_way_join


def shipping_priority(customer_ds, orders_ds, lineitem_ds, k: int = 10,
                      broadcast_cust_max: int = BROADCAST_CUST_MAX):
    """TPC-H Q3 shape — the canonical 3-table join chain: customers of one
    market segment, their orders placed BEFORE the cutoff, revenue from line
    items shipped AFTER it; top-k open orders by revenue.

    Scale shape, by cardinality (mirroring ``pages_way_join``):

    * customer <= ``broadcast_cust_max``: the segment-filtered custkey set
      collects once (int64 keys only), ships via ``ray.put``, and the
      orders filter applies a vectorized searchsorted semi-join inside its
      own ``map_batches`` — the first join costs zero shuffles;
    * larger customer tables: a hash ``Dataset.join`` on custkey.

    Either way, lineitem is pre-aggregated per batch to (orderkey, cents)
    partials BELOW the orderkey join (the push-the-combiner-below-the-join
    move: the join carries one row per (batch, orderkey), never raw line
    items), the orderkey join is the single all-to-all, and the final
    top-k is local-topk-per-block + a k*blocks-row driver merge — never a
    global sort.  Dates ride as int64 epoch-us; revenue as integer cents."""
    NS = n_shards()  # cluster-derived (VERDICT r3 #3)
    import ray

    from .common import cached_get

    broadcast = customer_ds.count() <= broadcast_cust_max

    def cust_filter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(b["c_mktsegment"], Q3_SEGMENT)
        return pa.table({"o_custkey": b.filter(m)["c_custkey"]})

    cust = customer_ds.map_batches(cust_filter, batch_format="pyarrow")
    keys_ref = None
    if broadcast:
        keys = np.sort(cust.to_pandas()["o_custkey"].to_numpy().astype(np.int64))
        keys_ref = ray.put(keys)

    def ord_filter(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        m = d < Q3_CUTOFF_US
        if keys_ref is not None:  # broadcast semi-join on custkey
            keys = cached_get(keys_ref)
            if keys.size == 0:
                m &= False
            else:
                ck = b["o_custkey"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, ck).clip(0, keys.size - 1)
                m &= keys[pos] == ck
        t = b.filter(pa.array(m))
        out = {
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_orderdate_us": pa.array(d[m], pa.int64()),
            "o_orderpriority": t["o_orderpriority"],
        }
        if keys_ref is not None:
            del out["o_custkey"]  # semi-join done; drop the key column
        return pa.table(out)

    ords = orders_ds.map_batches(ord_filter, batch_format="pyarrow")
    if keys_ref is not None:
        semi = ords
    else:
        semi = ords.join(cust, join_type="inner",
                         num_partitions=cap_join_partitions(16),
                         on=("o_custkey",))

    _LI_PARTIAL_SCHEMA = pa.schema([
        ("o_orderkey", pa.int64()), ("cents", pa.int64())])

    def li_partial(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        m = d > Q3_CUTOFF_US
        key = b["l_orderkey"].to_numpy(zero_copy_only=False)[m]
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[m]
        cents = round_half_away_np(px * (1 - disc) * 100)
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.Table.from_arrays(
            [pa.array(u.astype(np.int64)), pa.array(s)],
            schema=_LI_PARTIAL_SCHEMA)

    li = lineitem_ds.map_batches(li_partial, batch_format="pyarrow")

    # the single all-to-all.  Inputs are map_batches outputs with pinned
    # schemas (empty blocks keep them), so no drop_empty_blocks guard is
    # needed — that hazard is specific to sort/aggregate exchange outputs.
    joined = li.join(semi, join_type="inner",
                     num_partitions=cap_join_partitions(8),
                     on=("o_orderkey",))

    # o_orderdate_us / o_orderpriority are functionally dependent on the
    # orderkey (Min over a per-key constant is exact).  The fold shards by
    # orderkey % 64 (the big_orders move): the exchange sorts 64 shard ids
    # instead of the joined orderkey domain, each shard folds with a C hash
    # groupby.
    def add_shard(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_orderkey" not in b.column_names:
            return pa.schema([
                ("oshard", pa.int64()), ("o_orderkey", pa.int64()),
                ("cents", pa.int64()), ("o_orderdate_us", pa.int64()),
                ("o_orderpriority", pa.string())]).empty_table()
        shard = (np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False))
                 % NS).astype(np.int64)
        return b.add_column(0, "oshard", pa.array(shard))

    def shard_fold(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby("o_orderkey", sort=False)
             .agg(revenue_cents=("cents", "sum"),
                  o_orderdate_us=("o_orderdate_us", "min"),
                  o_orderpriority=("o_orderpriority", "min")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False, schema=pa.schema([
            ("o_orderkey", pa.int64()), ("revenue_cents", pa.int64()),
            ("o_orderdate_us", pa.int64()), ("o_orderpriority", pa.string()),
        ])).replace_schema_metadata(None)

    rev = (joined.map_batches(add_shard, batch_format="pyarrow")
           .groupby("oshard").map_groups(shard_fold, batch_format="pandas"))

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(["revenue_cents", "o_orderkey"],
                            ascending=[False, True], kind="stable").head(k)
        return pa.Table.from_pandas(
            df[["o_orderkey", "revenue_cents", "o_orderdate_us",
                "o_orderpriority"]],
            preserve_index=False).replace_schema_metadata(None)

    top = rev.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    top = top.sort_values(["revenue_cents", "o_orderkey"],
                          ascending=[False, True], kind="stable").head(k)
    top = top.reset_index(drop=True)
    top["rk"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rk", "o_orderkey", "revenue_cents", "o_orderdate_us",
                "o_orderpriority"]].astype(
        {"o_orderkey": "int64", "revenue_cents": "int64",
         "o_orderdate_us": "int64"})


def shipping_priority_sql(k: int = 10) -> str:
    return f"""
WITH rev AS (
  SELECT l.l_orderkey AS o_orderkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))::BIGINT
           AS revenue_cents,
         max(epoch_us(o.o_orderdate))::BIGINT AS o_orderdate_us,
         max(o.o_orderpriority) AS o_orderpriority
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = '{Q3_SEGMENT}'
    AND epoch_us(o.o_orderdate) < {Q3_CUTOFF_US}
    AND epoch_us(l.l_shipdate) > {Q3_CUTOFF_US}
  GROUP BY 1
)
SELECT row_number() OVER (ORDER BY revenue_cents DESC, o_orderkey ASC)::BIGINT AS rk,
       o_orderkey, revenue_cents, o_orderdate_us, o_orderpriority
FROM rev ORDER BY rk LIMIT {k}
"""


# --- TPC-H Q4-shaped: EXISTS semi-join via pre-aggregated extremum -----------
LATE_SHIP_DAYS = 60  # a shipment later than orderdate + this is "late"
_LATE_US = LATE_SHIP_DAYS * 86_400 * 1_000_000
_MAXSHIP_PARTIAL_SCHEMA = pa.schema([
    ("l_orderkey", pa.int64()), ("max_ship_us", pa.int64()),
])


ORDERS_BROADCAST_MAX = 2_000_000  # crossover: above this, hash-join route


def late_shipment_priority(orders_ds, lineitem_ds,
                           broadcast_orders_max: int = ORDERS_BROADCAST_MAX):
    """Orders with at least one late shipment, counted per order priority —
    the TPC-H Q4 shape (EXISTS-correlated semi-join), adapted to this
    schema's columns (l_shipdate vs o_orderdate + {LATE_SHIP_DAYS}d).

    Scale shape, by cardinality (mirroring ``shipping_priority``):

    * orders <= ``broadcast_orders_max``: the (orderkey -> orderdate,
      priority) arrays collect once, ship via ``ray.put``, and EXISTS
      evaluates entirely inside the lineitem map (``any late item`` ORs
      across batches for free) — the only exchange is a dedup groupby over
      the LATE orderkeys, a subset pre-deduped per batch.  Zero joins.
    * larger orders tables: ``EXISTS(l_shipdate > cutoff)`` over a
      per-order row set equals ``max(l_shipdate) > cutoff``, so the fact
      table collapses BEFORE a single (orderkey) hash join — per-batch
      partial max per orderkey, one groupby, one row per order through the
      join.

    A third shape — dissolving the join into one union+groupby Max exchange
    with sentinel rows — was tried and MEASURED SLOWER at sf0.1 (warm
    10.8 s vs 8.8 s): Ray's groupby exchange is sort-based, so pushing both
    tables' rows (with a string Max) through one sorted aggregate costs
    more than the hash join it removed."""
    NS = n_shards()  # cluster-derived (VERDICT r3 #3)
    import ray
    from ray.data.aggregate import Max, Sum

    from .common import cached_get, cap_join_partitions, drop_empty_blocks

    if orders_ds.count() <= broadcast_orders_max:
        odf = orders_ds.map_batches(
            lambda b: pa.table({"okey": b["o_orderkey"],
                                "odate_us": b["o_orderdate"].cast(pa.int64()),
                                "prio": b["o_orderpriority"]}),
            batch_format="pyarrow").to_pandas()
        order = np.argsort(odf["okey"].to_numpy(), kind="stable")
        okeys = odf["okey"].to_numpy(dtype=np.int64)[order]
        odates = odf["odate_us"].to_numpy(dtype=np.int64)[order]
        prios = odf["prio"].to_numpy(dtype=object)[order]
        ref = ray.put((okeys, odates, prios))

        _K = pa.schema([("okey", pa.int64())])

        def late_keys(b: pa.Table) -> pa.Table:
            okeys, odates, _ = cached_get(ref)
            ok = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            ship = b["l_shipdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if okeys.size == 0:
                return _K.empty_table()
            pos = np.searchsorted(okeys, ok).clip(0, okeys.size - 1)
            late = (okeys[pos] == ok) & (ship > odates[pos] + _LATE_US)
            return pa.table({"okey": pa.array(np.unique(ok[late]))},
                            schema=_K)

        _P = pa.schema([("o_orderpriority", pa.string()),
                        ("n_late", pa.int64())])

        def add_shard(b: pa.Table) -> pa.Table:
            shard = (np.asarray(b["okey"].to_numpy(zero_copy_only=False))
                     % NS).astype(np.int64)
            return b.append_column("oshard", pa.array(shard))

        def shard_dedup_count(df: pd.DataFrame) -> pa.Table:
            # the LATE-orderkey dedup folds per okey%64 shard (exchange
            # sorts 64 shard ids, not the late-order domain — the
            # big_orders move) and collapses straight to per-priority
            # partial counts inside the shard
            okeys, _, prios = cached_get(ref)
            ok = np.unique(df["okey"].to_numpy(dtype=np.int64))
            pos = np.searchsorted(okeys, ok)
            g = (pd.DataFrame({"o_orderpriority": prios[pos]})
                 .groupby("o_orderpriority", sort=False).size()
                 .reset_index(name="n_late"))
            return pa.Table.from_pandas(g, preserve_index=False,
                                        schema=_P).replace_schema_metadata(None)

        return (lineitem_ds.map_batches(late_keys, batch_format="pyarrow")
                .map_batches(add_shard, batch_format="pyarrow")
                .groupby("oshard").map_groups(shard_dedup_count,
                                              batch_format="pandas")
                .groupby("o_orderpriority")
                .aggregate(Sum("n_late", alias_name="n_late")))

    def li_partial(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"l_orderkey": ok, "max_ship_us": ship}).groupby(
            "l_orderkey", sort=False)["max_ship_us"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_MAXSHIP_PARTIAL_SCHEMA).replace_schema_metadata(None)

    max_ship = drop_empty_blocks(
        lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(
            Max("max_ship_us", alias_name="max_ship_us")).materialize())

    def ord_project(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["o_orderkey"],
            "o_orderpriority": b["o_orderpriority"],
            "odate_us": b["o_orderdate"].cast(pa.int64()),
        })

    orders = orders_ds.map_batches(ord_project, batch_format="pyarrow")
    joined = orders.join(max_ship, join_type="inner",
                         num_partitions=cap_join_partitions(16),
                         on=("l_orderkey",))

    _P = pa.schema([("o_orderpriority", pa.string()), ("n_late", pa.int64())])

    def late_partial(b: pa.Table) -> pa.Table:
        odate = np.asarray(b["odate_us"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
        ship = np.asarray(b["max_ship_us"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        late = ship > odate + _LATE_US
        g = (pd.DataFrame({"o_orderpriority":
                           b["o_orderpriority"].to_pandas()[late]})
             .groupby("o_orderpriority", sort=False).size()
             .reset_index(name="n_late"))
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_P).replace_schema_metadata(None)

    return (joined.map_batches(late_partial, batch_format="pyarrow")
            .groupby("o_orderpriority").aggregate(Sum("n_late",
                                                      alias_name="n_late")))


def late_shipment_priority_sql() -> str:
    return f"""
WITH ms AS (
  SELECT l_orderkey, max(epoch_us(l_shipdate))::BIGINT AS max_ship_us
  FROM lineitem GROUP BY 1
)
SELECT o_orderpriority, count(*)::BIGINT AS n_late
FROM orders o JOIN ms ON o.o_orderkey = ms.l_orderkey
WHERE ms.max_ship_us > epoch_us(o.o_orderdate) + {_LATE_US}
GROUP BY 1
"""


# --- TPC-H Q14-shaped: promo revenue share per month --------------------------

_PROMO_PARTIAL_SCHEMA = pa.schema([
    ("ym", pa.int64()), ("promo_cents", pa.int64()), ("total_cents", pa.int64()),
])


def promo_revenue(lineitem_ds, part_tbl: pa.Table):
    """TPC-H Q14 shape: monthly promo-revenue share.  The part dim ships
    once as a partkey -> is-PROMO boolean Series (vectorized ``.map``
    gather, like revenue_by_nation — part is the declared-small side; at
    planet scale route through a partkey hash join exactly like
    shipping_priority's customer side); lineitem streams with per-batch
    (year*100+month) partials, one tiny groupby, and the share computed as
    exact integer ppm so the oracle matches bit-for-bit."""
    import pandas as pd

    from ray.data.aggregate import Sum

    is_promo = pd.Series(
        np.fromiter((1 if t.startswith("PROMO") else 0
                     for t in part_tbl["p_type"].to_pylist()), np.int64,
                    part_tbl.num_rows),
        index=part_tbl["p_partkey"].to_numpy(zero_copy_only=False))

    def partial(b: pa.Table) -> pa.Table:
        s = b["l_shipdate"].to_pandas()
        ym = (s.dt.year * 100 + s.dt.month).to_numpy(dtype=np.int64)
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = round_half_away_np(px * (1 - disc) * 100)
        promo = pd.Series(
            b["l_partkey"].to_numpy(zero_copy_only=False)).map(is_promo).to_numpy(
            dtype=np.int64)
        df = pd.DataFrame({"ym": ym, "promo_cents": cents * promo,
                           "total_cents": cents})
        g = df.groupby("ym", sort=False).agg(
            promo_cents=("promo_cents", "sum"),
            total_cents=("total_cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_PROMO_PARTIAL_SCHEMA
                                    ).replace_schema_metadata(None)

    agg = (lineitem_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("ym").aggregate(Sum("promo_cents", alias_name="promo_cents"),
                                    Sum("total_cents", alias_name="total_cents")))

    def finalize(b: pa.Table) -> pa.Table:
        p = np.asarray(b["promo_cents"].to_numpy(zero_copy_only=False), np.int64)
        t = np.asarray(b["total_cents"].to_numpy(zero_copy_only=False), np.int64)
        share = p * 1_000_000 // np.maximum(t, 1)
        return b.append_column("promo_ppm", pa.array(share, pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def promo_revenue_sql() -> str:
    return """
WITH l AS (
  SELECT (year(l_shipdate) * 100 + month(l_shipdate))::BIGINT AS ym,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
         CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo
  FROM lineitem JOIN part p ON p.p_partkey = l_partkey
)
SELECT ym, sum(cents * promo)::BIGINT AS promo_cents,
       sum(cents)::BIGINT AS total_cents,
       (sum(cents * promo) * 1000000 // greatest(sum(cents), 1))::BIGINT AS promo_ppm
FROM l GROUP BY 1
"""


# --- TPC-H Q18-shaped: HAVING-filtered aggregate joined back to its source ---
BIG_ORDER_QTY = 250  # total rounded quantity above which an order is "big"


def big_orders(orders_ds, lineitem_ds, customer_tbl: pa.Table):
    """TPC-H Q18 shape — the groupby-HAVING join-back: orders whose total
    line-item quantity exceeds ``BIG_ORDER_QTY``, with customer name and
    order header attached.

    Scale shape: lineitem pre-aggregates to (orderkey, qty) partials per
    batch (the shuffle carries one row per batch-orderkey, never raw
    lines), ONE orderkey groupby applies the HAVING filter distributedly,
    and the surviving big-order rows — output-sized by construction, the
    HAVING selects the extreme tail — hash-join orders on the int orderkey.
    Customer is the declared-small dim here and ships once as a
    custkey -> name Series (vectorized ``.map``, like revenue_by_nation);
    at planet scale route it through a custkey hash join exactly like
    shipping_priority's customer side."""
    NS = n_shards()  # cluster-derived (VERDICT r3 #3)
    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks

    _QTY_PARTIAL_SCHEMA = pa.schema([
        ("o_orderkey", pa.int64()), ("qty", pa.int64())])

    def li_partial(b: pa.Table) -> pa.Table:
        key = b["l_orderkey"].to_numpy(zero_copy_only=False)
        qty = round_half_away_np(b["l_quantity"].to_numpy(zero_copy_only=False))
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, qty)
        return pa.Table.from_arrays([pa.array(u.astype(np.int64)), pa.array(s)],
                                    schema=_QTY_PARTIAL_SCHEMA)

    # the HAVING groupby shards by orderkey % 64 instead of sorting the full
    # orderkey domain through Ray's sort-based aggregate exchange: same ONE
    # all-to-all, but the exchange sorts 64 shard ids and each shard folds
    # its orderkeys with a C hash groupby + applies HAVING locally (the
    # sessionize layout; measured 7.0 -> ~4 s at sf0.1's 5.3M partial rows)
    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False))
                 % NS).astype(np.int64)
        return b.append_column("oshard", pa.array(shard))

    def shard_having(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby("o_orderkey", sort=False)["qty"].sum().reset_index())
        g = g[g["qty"] > BIG_ORDER_QTY]
        return pa.table({
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy(), pa.int64()),
            "total_qty": pa.array(g["qty"].to_numpy(), pa.int64())})

    big = drop_empty_blocks(
        lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("oshard").map_groups(shard_having, batch_format="pandas")
        .materialize())

    cname = pd.Series(customer_tbl["c_name"].to_pylist(),
                      index=customer_tbl["c_custkey"].to_numpy(zero_copy_only=False))

    def ord_proj(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        cents = round_half_away_np(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100)
        return pa.table({
            "o_orderkey": b["o_orderkey"], "o_custkey": b["o_custkey"],
            "o_orderdate_us": pa.array(d, pa.int64()),
            "o_totalprice_cents": pa.array(cents, pa.int64())})

    # cardinality-routed join-back: the HAVING tail is output-sized (the
    # extreme-quantity extreme of the orderkey domain), so below the
    # crossover it broadcasts as two sorted int64 arrays and the join-back
    # is a vectorized searchsorted filter inside the orders stream — the
    # native hash join (whose aggregator-actor ramp dominates seconds-long
    # jobs) only runs when the tail is genuinely big.
    n_big = big.count()
    if n_big <= ORDERS_BROADCAST_MAX:
        import ray as _ray

        bdf = big.to_pandas()  # bounded by the crossover
        bk = bdf["o_orderkey"].to_numpy()
        order = np.argsort(bk, kind="stable")
        big_ref = _ray.put((bk[order], bdf["total_qty"].to_numpy()[order]))

        from .common import cached_get

        def ord_join(b: pa.Table) -> pa.Table:
            ks, qs = cached_get(big_ref)
            proj = ord_proj(b)
            ok = proj["o_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, ok)
            m = (pos < len(ks))
            m[m] = ks[pos[m]] == ok[m]
            kept = proj.take(pa.array(np.nonzero(m)[0].astype(np.int64)))
            return kept.append_column(
                "total_qty", pa.array(qs[pos[m]], pa.int64()))

        joined = orders_ds.map_batches(ord_join, batch_format="pyarrow")
    else:
        joined = big.join(
            orders_ds.map_batches(ord_proj, batch_format="pyarrow"),
            join_type="inner", num_partitions=cap_join_partitions(8),
            on=("o_orderkey",))

    def attach_name(b: pa.Table) -> pa.Table:
        names = pd.Series(
            b["o_custkey"].to_numpy(zero_copy_only=False)).map(cname)
        return pa.table({
            "o_orderkey": b["o_orderkey"], "total_qty": b["total_qty"],
            "o_custkey": b["o_custkey"],
            "c_name": pa.array(names.to_numpy(dtype=object), pa.string()),
            "o_orderdate_us": b["o_orderdate_us"],
            "o_totalprice_cents": b["o_totalprice_cents"]})

    return joined.map_batches(attach_name, batch_format="pyarrow")


def big_orders_sql() -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey AS o_orderkey,
         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {BIG_ORDER_QTY}
)
SELECT b.o_orderkey, b.total_qty, o.o_custkey, c.c_name,
       epoch_us(o.o_orderdate)::BIGINT AS o_orderdate_us,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
FROM big b
JOIN orders o ON o.o_orderkey = b.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


# --- TPC-H Q22-shaped: scalar-subquery broadcast + anti-join -------------------
COLD_ORDER_STATUS = "O"  # "no OPEN orders" keeps the result non-empty on
                         # the testdata (every custkey has SOME order)


def cold_customers(customer_ds, orders_ds):
    """TPC-H Q22 shape — the scalar-subquery broadcast: customers whose
    account balance exceeds the average POSITIVE balance and who placed no
    open (status ``COLD_ORDER_STATUS``) orders, counted per nation.

    Scale shape, in three bounded moves:

    1. the scalar subquery (avg positive acctbal) is a partial-combine
       Sum/Sum over integer cents — two int64s reach the driver, nothing
       else; the comparison ``bal > avg`` is then evaluated as the exact
       integer cross-multiplication ``bal_cents * n_pos > sum_pos_cents``
       (no float division on either side, so the oracle matches bit-exact);
    2. the anti-join against orders is a hash ``Dataset.join`` left_outer
       on custkey + null filter — o_custkey is pre-deduped per batch so the
       join's order side carries at most one row per (batch, custkey), and
       no process holds the order-customer key set (contrast
       customers_without_orders, which demonstrates the broadcast-key-set
       variant for declared-small sides);
    3. the per-nation rollup is the usual partial-combine + tiny groupby.

    Output: (c_nationkey, n_cust, sum_acctbal_cents) for qualifying
    customers.
    """
    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks

    _BAL_PARTIAL_SCHEMA = pa.schema([
        ("one", pa.int64()), ("n_pos", pa.int64()), ("sum_pos_cents", pa.int64())])

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = round_half_away_np(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100)
        pos = cents > 0
        return pa.Table.from_arrays(
            [pa.array([np.int64(1)]), pa.array([np.int64(pos.sum())]),
             pa.array([np.int64(cents[pos].sum())])],
            schema=_BAL_PARTIAL_SCHEMA)

    avg_row = (customer_ds.map_batches(bal_partial, batch_format="pyarrow")
               .groupby("one").aggregate(
                   Sum("n_pos", alias_name="n_pos"),
                   Sum("sum_pos_cents", alias_name="sum_pos_cents"))
               .take_all())  # exactly one tiny row: the broadcast scalar
    n_pos = int(avg_row[0]["n_pos"]) or 1
    sum_pos = int(avg_row[0]["sum_pos_cents"])

    def rich(b: pa.Table) -> pa.Table:
        cents = round_half_away_np(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100)
        keep = cents * n_pos > sum_pos  # bal > avg, exact in integers
        return pa.table({
            "c_custkey": pa.array(
                b["c_custkey"].to_numpy(zero_copy_only=False)[keep]),
            "c_nationkey": pa.array(b["c_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]),
            "bal_cents": pa.array(cents[keep])})

    def ord_keys(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["o_orderstatus"], COLD_ORDER_STATUS))
        u = np.unique(b["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"c_custkey": pa.array(u.astype(np.int64)),
                         "has_order": pa.array(np.ones(u.size, np.int8))})

    rich_ds = drop_empty_blocks(customer_ds.map_batches(
        rich, batch_format="pyarrow").materialize())
    orders_keys = drop_empty_blocks(orders_ds.map_batches(
        ord_keys, batch_format="pyarrow").materialize())
    joined = rich_ds.join(orders_keys, join_type="left_outer",
                          num_partitions=cap_join_partitions(8),
                          on=("c_custkey",))

    _COLD_PARTIAL_SCHEMA = pa.schema([
        ("c_nationkey", pa.int64()), ("n_cust", pa.int64()),
        ("sum_acctbal_cents", pa.int64())])

    def cold_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_null(b["has_order"]))
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        bal = b["bal_cents"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(nk, return_inverse=True)
        n = np.zeros(u.size, dtype=np.int64)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, bal)
        return pa.Table.from_arrays(
            [pa.array(u.astype(np.int64)), pa.array(n), pa.array(s)],
            schema=_COLD_PARTIAL_SCHEMA)

    return (joined.map_batches(cold_partial, batch_format="pyarrow")
            .groupby("c_nationkey").aggregate(
                Sum("n_cust", alias_name="n_cust"),
                Sum("sum_acctbal_cents", alias_name="sum_acctbal_cents")))


def cold_customers_sql() -> str:
    # the engine compares in exact integer cents (cross-multiplied), so the
    # oracle does the same instead of a float AVG()
    return f"""
WITH c AS (SELECT c_custkey, c_nationkey::BIGINT AS c_nationkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
s AS (SELECT count(*)::BIGINT AS n_pos, sum(cents)::BIGINT AS sum_pos
      FROM c WHERE cents > 0)
SELECT c.c_nationkey, count(*)::BIGINT AS n_cust,
       sum(c.cents)::BIGINT AS sum_acctbal_cents
FROM c, s
WHERE c.cents * s.n_pos > s.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = '{COLD_ORDER_STATUS}')
GROUP BY 1
"""


# --- cumulative window function (SUM OVER partition ORDER BY) ------------------
N_CUST_SHARDS = 64


def running_order_total(orders_ds):
    """The classic analytic window — ``SUM(total) OVER (PARTITION BY custkey
    ORDER BY orderdate, orderkey)`` plus ``ROW_NUMBER`` — per-customer
    running revenue.

    Scale shape: the shuffle key is ``o_custkey % N_CUST_SHARDS`` (the
    sessionize layout — one exchange, no per-GROUP Python at customer
    cardinality); each shard sorts once by (custkey, date, key) and computes
    every customer's cumulative sum in ONE vectorized pass: a global cumsum
    minus the per-customer base (``np.maximum.accumulate`` of the segment
    starts) — no Python loop, no per-customer groupby.  Output is
    row-per-order, i.e. a true window function, not an aggregate."""
    N_CUST_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3)

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False))
                 % N_CUST_SHARDS).astype(np.int64)
        cents = round_half_away_np(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100)
        d = b["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            "cshard": pa.array(shard), "o_custkey": b["o_custkey"],
            "o_orderkey": b["o_orderkey"],
            "o_orderdate_us": pa.array(d, pa.int64()),
            "cents": pa.array(cents)})

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["o_custkey", "o_orderdate_us", "o_orderkey"],
                            kind="stable")
        cust = df["o_custkey"].to_numpy()
        cents = df["cents"].to_numpy()
        n = len(df)
        csum = np.cumsum(cents)
        start = np.ones(n, dtype=bool)
        start[1:] = cust[1:] != cust[:-1]
        # base[i] = csum just BEFORE this customer's first row
        base = np.maximum.accumulate(np.where(start, csum - cents, 0))
        running = csum - base
        idx = np.arange(1, n + 1, dtype=np.int64)
        row_base = np.maximum.accumulate(np.where(start, idx - 1, 0))
        return pa.table({
            "o_custkey": pa.array(cust, pa.int64()),
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
            "o_orderdate_us": pa.array(df["o_orderdate_us"].to_numpy(), pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "running_cents": pa.array(running, pa.int64()),
            "rn": pa.array(idx - row_base, pa.int64())})

    return (orders_ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("cshard").map_groups(per_shard, batch_format="pandas"))


def running_order_total_sql() -> str:
    return """
SELECT o_custkey, o_orderkey, epoch_us(o_orderdate)::BIGINT AS o_orderdate_us,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w::BIGINT AS running_cents,
       row_number() OVER w::BIGINT AS rn
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --- TPC-H Q17-shaped: correlated per-group average ----------------------------
SMALL_QTY_NUM = 1   # the "small" threshold is qty < (NUM/DEN) * avg(qty)
SMALL_QTY_DEN = 5   # i.e. 0.2 x the part's average, as in Q17


def small_qty_revenue(lineitem_ds, part_tbl: pa.Table, stats_lineitem_ds=None):
    """TPC-H Q17 shape — the correlated per-group scalar subquery: revenue
    from line items whose quantity is below 0.2x their OWN part's average
    quantity, rolled up per brand.

    ``stats_lineitem_ds``: optional separate read for the stats pass, pruned
    to (l_partkey, l_quantity) — the extendedprice column never leaves
    storage on pass 1 (prune-at-the-read; defaults to ``lineitem_ds``).

    Scale shape: pass 1 folds lineitem to per-part (n, sum_qty) via
    per-batch partials + ONE partkey groupby (output bounded by |part|, the
    declared-small dim in this schema); the stats collect as three sorted
    int64 arrays and ship once via ``ray.put``.  Pass 2 streams lineitem
    again: a vectorized searchsorted gather evaluates the correlated
    predicate as the EXACT integer cross-multiplication
    ``qty * SMALL_QTY_DEN * n < sum_qty`` (no float division on either
    side), the brand attaches through the same broadcast, and per-brand
    (count, cents) partials feed one tiny groupby.  At planet-scale part
    cardinality route both lookups through a partkey hash ``Dataset.join``
    exactly like shipping_priority's customer side."""
    import ray
    from ray.data.aggregate import Sum

    from .common import cached_get

    _STATS_PARTIAL_SCHEMA = pa.schema([
        ("l_partkey", pa.int64()), ("n", pa.int64()), ("sq", pa.int64())])

    def qty_partial(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False)
        qty = round_half_away_np(b["l_quantity"].to_numpy(zero_copy_only=False))
        u, inv = np.unique(key, return_inverse=True)
        n = np.zeros(u.size, dtype=np.int64)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, qty)
        return pa.Table.from_arrays(
            [pa.array(u.astype(np.int64)), pa.array(n), pa.array(s)],
            schema=_STATS_PARTIAL_SCHEMA)

    stats_src = (stats_lineitem_ds if stats_lineitem_ds is not None
                 else lineitem_ds)
    partials = stats_src.map_batches(qty_partial, batch_format="pyarrow")
    if part_tbl.num_rows <= BROADCAST_CUST_MAX:
        # part is the declared-small dim and the folded stats broadcast
        # anyway — fold the (blocks x <=|part|)-row partials on the driver
        # instead of paying a sort exchange for a table we then collect
        # (measured 5-10 s -> ~1 s at sf0.1's 20k parts x 48 blocks)
        stats = (partials.to_pandas().groupby("l_partkey", sort=True)
                 .sum().reset_index())
    else:  # planet-scale part: distributed groupby; the broadcast below
        # then needs the hash-join route instead (shipping_priority's move)
        stats = (partials.groupby("l_partkey").aggregate(
            Sum("n", alias_name="n"), Sum("sq", alias_name="sq"))
            .to_pandas())
    order = np.argsort(stats["l_partkey"].to_numpy(), kind="stable")
    pkeys = stats["l_partkey"].to_numpy(dtype=np.int64)[order]
    ns = stats["n"].to_numpy(dtype=np.int64)[order]
    sqs = stats["sq"].to_numpy(dtype=np.int64)[order]
    brand = pd.Series(part_tbl["p_brand"].to_pylist(),
                      index=part_tbl["p_partkey"].to_numpy(zero_copy_only=False))
    ref = ray.put((pkeys, ns, sqs))

    _REV_PARTIAL_SCHEMA = pa.schema([
        ("p_brand", pa.string()), ("n_small", pa.int64()),
        ("revenue_cents", pa.int64())])

    def small_partial(b: pa.Table) -> pa.Table:
        pkeys, ns, sqs = cached_get(ref)
        pk = np.asarray(b["l_partkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        qty = round_half_away_np(b["l_quantity"].to_numpy(zero_copy_only=False))
        cents = round_half_away_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100)
        if pkeys.size == 0:
            return _REV_PARTIAL_SCHEMA.empty_table()
        pos = np.searchsorted(pkeys, pk).clip(0, pkeys.size - 1)
        hit = pkeys[pos] == pk  # every lineitem partkey has stats; belt only
        small = hit & (qty * SMALL_QTY_DEN * ns[pos] < SMALL_QTY_NUM * sqs[pos])
        g = (pd.DataFrame({
            "p_brand": pd.Series(pk[small]).map(brand).to_numpy(dtype=object),
            "cents": cents[small]})
            .groupby("p_brand", sort=False).agg(
                n_small=("cents", "size"),
                revenue_cents=("cents", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_REV_PARTIAL_SCHEMA
                                    ).replace_schema_metadata(None)

    return (lineitem_ds.map_batches(small_partial, batch_format="pyarrow")
            .groupby("p_brand").aggregate(
                Sum("n_small", alias_name="n_small"),
                Sum("revenue_cents", alias_name="revenue_cents")))


def small_qty_revenue_sql() -> str:
    return f"""
WITH s AS (
  SELECT l_partkey, count(*)::BIGINT AS n,
         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sq
  FROM lineitem GROUP BY 1
)
SELECT p.p_brand, count(*)::BIGINT AS n_small,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT AS revenue_cents
FROM lineitem l
JOIN s ON s.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE CAST(round(l.l_quantity) AS BIGINT) * {SMALL_QTY_DEN} * s.n
      < {SMALL_QTY_NUM} * s.sq
GROUP BY 1
"""


# --- skyline / Pareto frontier (dominance filter) ------------------------------


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean mask of Pareto-optimal rows minimizing (price, size): a row is
    dominated iff some other row is <= on both axes and strictly < on one.
    Exact duplicates of a surviving pair all survive (no strict difference).
    Vectorized: lexsort by (price, size), per-price-group min-s, running min
    across groups — O(n log n), no pairwise compare."""
    n = price.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((size, price))
    sp, ss = price[order], size[order]
    starts = np.ones(n, dtype=bool)
    starts[1:] = sp[1:] != sp[:-1]
    gid = np.cumsum(starts) - 1
    group_min = ss[starts]  # sorted by s within a price group: first is min
    prev_min = np.concatenate((
        [np.iinfo(np.int64).max],
        np.minimum.accumulate(group_min)[:-1]))
    keep_sorted = (group_min < prev_min)[gid] & (ss == group_min[gid])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def pareto_parts(ds):
    """Skyline query — the Pareto frontier of parts minimizing
    (retail price, size): no other part is cheaper-or-equal AND
    smaller-or-equal with one strict.

    Scale shape: dominance is transitive, so every GLOBAL skyline point is
    also a LOCAL skyline point of whatever batch holds it — each batch
    emits only its local frontier (frontier-sized, typically O(log n) of
    the batch for independent dims), the union repartitions into one block
    (frontier-of-frontiers is tiny by the same argument), and the SAME
    vectorized kernel finishes.  Nothing corpus-sized moves or
    materializes; the only all-to-all is over local-frontier rows."""

    _F = pa.schema([("p_partkey", pa.int64()), ("price_cents", pa.int64()),
                    ("p_size", pa.int64())])

    def local_front(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "p_partkey" not in b.column_names:
            return _F.empty_table()
        price = round_half_away_np(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100)
        size = np.asarray(b["p_size"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        m = _skyline_mask(price, size)
        return pa.Table.from_arrays(
            [pa.array(b["p_partkey"].to_numpy(zero_copy_only=False)[m]
                      .astype(np.int64)),
             pa.array(price[m]), pa.array(size[m])], schema=_F)

    def final_front(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "p_partkey" not in b.column_names:
            return _F.empty_table()
        m = _skyline_mask(
            np.asarray(b["price_cents"].to_numpy(zero_copy_only=False)),
            np.asarray(b["p_size"].to_numpy(zero_copy_only=False)))
        return b.filter(pa.array(m))

    return (ds.map_batches(local_front, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final_front, batch_format="pyarrow",
                         batch_size=None))


def pareto_parts_sql() -> str:
    return """
WITH q AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         p_size::BIGINT AS p_size
  FROM part
)
SELECT p_partkey, price_cents, p_size FROM q p1
WHERE NOT EXISTS (
  SELECT 1 FROM q p2
  WHERE p2.price_cents <= p1.price_cents AND p2.p_size <= p1.p_size
    AND (p2.price_cents < p1.price_cents OR p2.p_size < p1.p_size))
"""


# --- TPC-H Q19-shaped: disjunctive multi-predicate broadcast join --------------
Q19_CASES = (  # (brand, qty_lo, qty_hi, size_hi) OR-branches, as in Q19
    ("Brand#12", 1, 11, 5),
    ("Brand#23", 10, 20, 10),
    ("Brand#21", 20, 30, 15),  # testdata brands run #1-#25 (Q19's #34 is absent)
)


def disjunctive_revenue(lineitem_ds, part_tbl: pa.Table):
    """TPC-H Q19 shape — the disjunctive (OR-of-ANDs) predicate join:
    revenue from line items matching ANY of the ``Q19_CASES`` branches,
    each a conjunction over part attributes (brand, size) and line-item
    quantity; reported per branch plus the overall distinct-match rollup
    (a row matching two branches counts once in ``total``).

    Scale shape: part ships once as two broadcast Series (partkey ->
    branch-relevant brand id, size); lineitem streams ONE pass evaluating
    all branches vectorized — the OR never becomes a union of scans (the
    classic Q19 trap: three scans + union re-reads the fact table three
    times).  Per-batch (branch, count, cents) partials, one tiny groupby."""
    from ray.data.aggregate import Sum

    brand_ids = {b: i for i, (b, *_rest) in enumerate(Q19_CASES)}
    bid = pd.Series(
        np.fromiter((brand_ids.get(b, -1)
                     for b in part_tbl["p_brand"].to_pylist()), np.int64,
                    part_tbl.num_rows),
        index=part_tbl["p_partkey"].to_numpy(zero_copy_only=False))
    psize = pd.Series(
        part_tbl["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
        index=part_tbl["p_partkey"].to_numpy(zero_copy_only=False))

    _P = pa.schema([("branch", pa.string()), ("n", pa.int64()),
                    ("revenue_cents", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        pk = pd.Series(b["l_partkey"].to_numpy(zero_copy_only=False))
        qty = round_half_away_np(b["l_quantity"].to_numpy(zero_copy_only=False))
        cents = round_half_away_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100)
        row_bid = pk.map(bid).to_numpy(dtype=np.int64)
        row_size = pk.map(psize).to_numpy(dtype=np.int64)
        rows = []
        any_m = np.zeros(len(pk), dtype=bool)
        for i, (name, lo, hi, size_hi) in enumerate(Q19_CASES):
            m = (row_bid == i) & (qty >= lo) & (qty <= hi) & (row_size <= size_hi)
            any_m |= m
            rows.append((name, int(m.sum()), int(cents[m].sum())))
        rows.append(("total", int(any_m.sum()), int(cents[any_m].sum())))
        return pa.Table.from_arrays(
            [pa.array([r[0] for r in rows], pa.string()),
             pa.array([r[1] for r in rows], pa.int64()),
             pa.array([r[2] for r in rows], pa.int64())], schema=_P)

    return (lineitem_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("branch").aggregate(
                Sum("n", alias_name="n"),
                Sum("revenue_cents", alias_name="revenue_cents")))


def disjunctive_revenue_sql() -> str:
    branch_case = []
    conds = []
    for name, lo, hi, size_hi in Q19_CASES:
        c = (f"(p.p_brand = '{name}' AND q.qty BETWEEN {lo} AND {hi} "
             f"AND p.p_size <= {size_hi})")
        conds.append(c)
        branch_case.append(
            f"SELECT '{name}' AS branch, count(*) FILTER (WHERE {c})::BIGINT AS n, "
            f"coalesce(sum(q.cents) FILTER (WHERE {c}), 0)::BIGINT AS revenue_cents "
            f"FROM q JOIN part p ON p.p_partkey = q.l_partkey")
    any_c = " OR ".join(conds)
    branch_case.append(
        f"SELECT 'total' AS branch, count(*) FILTER (WHERE {any_c})::BIGINT AS n, "
        f"coalesce(sum(q.cents) FILTER (WHERE {any_c}), 0)::BIGINT AS revenue_cents "
        f"FROM q JOIN part p ON p.p_partkey = q.l_partkey")
    stack = "\nUNION ALL\n".join(branch_case)
    return f"""
WITH q AS (
  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
)
{stack}
"""


# --- bounded-frame window (ROWS BETWEEN k PRECEDING AND CURRENT ROW) -----------
ROLLING_FRAME = 3  # window width in rows (current + 2 preceding)


def rolling_order_sum(orders_ds):
    """The bounded-frame analytic window — ``SUM(cents) OVER (PARTITION BY
    custkey ORDER BY orderdate, orderkey ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW)`` — completing the window family next to the lag
    (user_event_gaps), unbounded-cumulative (running_order_total) and rank
    (quality_rank) shapes.

    Scale shape: the running_order_total layout (custkey % 64 shard
    exchange, one sort per shard) with the frame computed as a cumsum
    DIFFERENCE — ``csum[i] - csum[i-k]`` with the lagged index clamped to
    each customer's segment start — fully vectorized, no per-customer
    Python."""
    N_CUST_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3)

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False))
                 % N_CUST_SHARDS).astype(np.int64)
        cents = round_half_away_np(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100)
        d = b["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            "cshard": pa.array(shard), "o_custkey": b["o_custkey"],
            "o_orderkey": b["o_orderkey"],
            "o_orderdate_us": pa.array(d, pa.int64()),
            "cents": pa.array(cents)})

    k = ROLLING_FRAME

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["o_custkey", "o_orderdate_us", "o_orderkey"],
                            kind="stable")
        cust = df["o_custkey"].to_numpy()
        cents = df["cents"].to_numpy()
        n = len(df)
        csum = np.cumsum(cents)
        start_mask = np.ones(n, dtype=bool)
        start_mask[1:] = cust[1:] != cust[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(start_mask, idx, 0))
        lo = np.maximum(idx - k + 1, seg_start)  # frame start, clamped
        # sum over [lo, i] = csum[i] - csum[lo-1]; csum[-1] treated as 0
        base = np.where(lo > 0, csum[np.maximum(lo - 1, 0)], 0)
        base[lo == 0] = 0
        rolling = csum - base
        return pa.table({
            "o_custkey": pa.array(cust, pa.int64()),
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
            "o_orderdate_us": pa.array(df["o_orderdate_us"].to_numpy(),
                                       pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "rolling_cents": pa.array(rolling, pa.int64())})

    return (orders_ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("cshard").map_groups(per_shard, batch_format="pandas"))


def rolling_order_sum_sql() -> str:
    return f"""
SELECT o_custkey, o_orderkey, epoch_us(o_orderdate)::BIGINT AS o_orderdate_us,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN {ROLLING_FRAME - 1} PRECEDING AND CURRENT ROW
       )::BIGINT AS rolling_cents
FROM orders
"""


# --- TPC-H Q15-shaped: aggregate + scalar-max equality (top supplier) ----------
Q15_T0_US = int(np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64))
Q15_T1_US = int(np.datetime64("1997-04-01T00:00:00", "us").astype(np.int64))


def top_supplier(lineitem_ds, supplier_tbl: pa.Table):
    """TPC-H Q15 shape — the view-max equality: per-supplier revenue inside
    a shipping quarter, keeping every supplier whose revenue EQUALS the
    global maximum (ties survive, as in the spec).

    Scale shape: per-batch (suppkey, cents) partials -> one suppkey%64
    shard fold (supplier-domain bounded); the scalar max is a per-block
    local max + a <=1-row-per-block driver merge (never a global sort), and
    the equality filter streams with the max broadcast by closure.  The
    supplier dim ships once as a name Series; at planet scale route it
    through a suppkey hash join like shipping_priority's customer side."""
    NS = n_shards()  # cluster-derived (VERDICT r3 #3)
    _P = pa.schema([("sshard", pa.int64()), ("l_suppkey", pa.int64()),
                    ("cents", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        m = (d >= Q15_T0_US) & (d < Q15_T1_US)
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[m]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[m]
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        cents = round_half_away_np(px * (1 - disc) * 100)
        u, inv = np.unique(sk, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.Table.from_arrays(
            [pa.array((u % NS).astype(np.int64)), pa.array(u), pa.array(s)],
            schema=_P)

    def shard_fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("l_suppkey", sort=False)["cents"].sum().reset_index()
        return pa.Table.from_pandas(g.rename(columns={"cents": "total_cents"}),
                                    preserve_index=False, schema=pa.schema([
                                        ("l_suppkey", pa.int64()),
                                        ("total_cents", pa.int64()),
                                    ])).replace_schema_metadata(None)

    rev = (lineitem_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("sshard").map_groups(shard_fold, batch_format="pandas")
           .materialize())  # supplier-domain bounded; read twice below

    def local_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "total_cents" not in b.column_names:
            return pa.schema([("m", pa.int64())]).empty_table()
        return pa.table({"m": pa.array(
            [int(np.max(b["total_cents"].to_numpy(zero_copy_only=False)))],
            pa.int64())})

    tops = rev.map_batches(local_max, batch_format="pyarrow").to_pandas()
    best = int(tops["m"].max()) if len(tops) else 0

    sname = pd.Series(supplier_tbl["s_name"].to_pylist(),
                      index=supplier_tbl["s_suppkey"].to_numpy(
                          zero_copy_only=False))

    def keep_best(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["total_cents"], best))
        names = pd.Series(
            b["l_suppkey"].to_numpy(zero_copy_only=False)).map(sname)
        return pa.table({
            "s_suppkey": b["l_suppkey"],
            "s_name": pa.array(names.to_numpy(dtype=object), pa.string()),
            "total_cents": b["total_cents"]})

    return rev.map_batches(keep_best, batch_format="pyarrow")


def top_supplier_sql() -> str:
    return f"""
WITH r AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             )::BIGINT AS total_cents
  FROM lineitem
  WHERE epoch_us(l_shipdate) >= {Q15_T0_US} AND epoch_us(l_shipdate) < {Q15_T1_US}
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_cents = (SELECT max(total_cents) FROM r)
"""


# --- TPC-H Q21-shaped: multi-correlated EXISTS via per-group stats -------------


def waiting_suppliers(lineitem_ds, orders_tbl: pa.Table,
                      supplier_tbl: pa.Table):
    """TPC-H Q21 shape — suppliers who kept multi-supplier orders waiting:
    count, per supplier, the orders where that supplier shipped late
    (shipdate > orderdate + {LATE_SHIP_DAYS}d), at least one OTHER supplier
    participated, and NO other supplier was late.

    The three correlated (NOT) EXISTS of Q21 collapse to per-order STATS —
    (distinct suppliers, distinct late suppliers) — so the engine never
    evaluates a correlated subquery: per-batch (orderkey, suppkey,
    any_late) dedup partials, ONE okey%64 shard exchange, and inside each
    shard a hash fold derives the stats and the qualification
    (late AND n_supp >= 2 AND n_late == 1) in one pass, emitting
    per-supplier partial counts.  The orderdate lookup broadcasts (orders
    is the declared-small header side here; at planet scale ship it
    through the orderkey hash join exactly like late_shipment_priority's
    above-crossover route)."""
    NS = n_shards()  # cluster-derived (VERDICT r3 #3)
    from ray.data.aggregate import Sum

    okeys = orders_tbl["o_orderkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(okeys, kind="stable")
    okeys_s = okeys[order].astype(np.int64)
    odates_s = orders_tbl["o_orderdate"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").astype(np.int64)[order]

    _P = pa.schema([("oshard", pa.int64()), ("ok", pa.int64()),
                    ("sk", pa.int64()), ("late", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if okeys_s.size == 0:  # no order headers: nothing can qualify
            return _P.empty_table()
        ok = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        pos = np.searchsorted(okeys_s, ok).clip(0, okeys_s.size - 1)
        late = (ship > odates_s[pos] + _LATE_US).astype(np.int64)
        df = (pd.DataFrame({"ok": ok, "sk": sk, "late": late})
              .groupby(["ok", "sk"], sort=False)["late"].max().reset_index())
        return pa.Table.from_arrays(
            [pa.array((df["ok"].to_numpy() % NS).astype(np.int64)),
             pa.array(df["ok"].to_numpy(), pa.int64()),
             pa.array(df["sk"].to_numpy(), pa.int64()),
             pa.array(df["late"].to_numpy(), pa.int64())], schema=_P)

    _W = pa.schema([("s_suppkey", pa.int64()), ("numwait", pa.int64())])

    def shard_fold(df: pd.DataFrame) -> pa.Table:
        ls = df.groupby(["ok", "sk"], sort=False)["late"].max().reset_index()
        os_ = ls.groupby("ok", sort=False)["late"].agg(
            n_supp="size", n_late="sum").reset_index()
        m = ls.merge(os_, on="ok")
        q = m[(m["late"] == 1) & (m["n_supp"] >= 2) & (m["n_late"] == 1)]
        g = q.groupby("sk", sort=False).size().reset_index(name="numwait")
        return pa.Table.from_arrays(
            [pa.array(g["sk"].to_numpy(), pa.int64()),
             pa.array(g["numwait"].to_numpy(), pa.int64())], schema=_W)

    agg = (lineitem_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("oshard").map_groups(shard_fold, batch_format="pandas")
           .groupby("s_suppkey").aggregate(Sum("numwait",
                                               alias_name="numwait")))

    sname = pd.Series(supplier_tbl["s_name"].to_pylist(),
                      index=supplier_tbl["s_suppkey"].to_numpy(
                          zero_copy_only=False))

    def attach(b: pa.Table) -> pa.Table:
        names = pd.Series(
            b["s_suppkey"].to_numpy(zero_copy_only=False)).map(sname)
        return pa.table({
            "s_suppkey": b["s_suppkey"],
            "s_name": pa.array(names.to_numpy(dtype=object), pa.string()),
            "numwait": b["numwait"]})

    return agg.map_batches(attach, batch_format="pyarrow")


def waiting_suppliers_sql() -> str:
    return f"""
WITH l AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
         CASE WHEN epoch_us(l_shipdate) > epoch_us(o.o_orderdate) + {_LATE_US}
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders o ON o.o_orderkey = l_orderkey
),
ls AS (SELECT ok, sk, max(late) AS late FROM l GROUP BY 1, 2),
os AS (SELECT ok, count(*)::BIGINT AS n_supp, sum(late)::BIGINT AS n_late
       FROM ls GROUP BY 1)
SELECT s.s_suppkey, s.s_name, count(*)::BIGINT AS numwait
FROM ls JOIN os USING (ok) JOIN supplier s ON s.s_suppkey = ls.sk
WHERE ls.late = 1 AND os.n_supp >= 2 AND os.n_late = 1
GROUP BY 1, 2
"""


# --- exact continuous quantiles (unbounded domain, no global sort) -------------
QUANT_PCTS = (50, 90, 99)   # percentile_disc targets, as integer percents
QUANT_SHIFT = 10            # bucket = cents >> SHIFT (~$10.24 buckets)


def acctbal_quantiles(customer_ds):
    """EXACT percentile_disc over a CONTINUOUS unbounded column (account
    balance cents, negatives included) with no global sort — the order-
    statistics shape token_quantiles can't cover (its histogram needs a
    bounded integer domain).

    Two passes:

    1. per-batch sparse bucket histogram (``cents >> QUANT_SHIFT`` —
       arithmetic shift keeps bucket order == value order for negatives),
       one (bucket) groupby bounded by the VALUE RANGE / 2^shift, and a
       driver fold locates the bucket + within-bucket offset of each target
       (percentile_disc rule: smallest value with cum*100 >= pct*N, the
       token_quantiles convention);
    2. ONLY the <=len(QUANT_PCTS) target buckets' values collect (bucket
       population sized — the histogram proves the bound before the
       collect), sort locally, and the offsets read off the answer.

    Pathological mass concentration (one bucket holding ~everything) would
    make pass 2 collect large: recurse with a finer shift on just that
    bucket in that case (asserted here, implemented when a real
    distribution needs it)."""
    from ray.data.aggregate import Sum

    _H = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])

    def hist_partial(b: pa.Table) -> pa.Table:
        cents = round_half_away_np(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100)
        bucket = cents >> QUANT_SHIFT
        u, c = np.unique(bucket, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(np.int64)), pa.array(c.astype(np.int64))],
            schema=_H)

    hist = (customer_ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    if "bucket" not in hist.columns:  # empty input: schema-less aggregate
        hist = pd.DataFrame({"bucket": [], "n": []})
    hist = hist.sort_values("bucket", kind="stable")
    counts = hist["n"].to_numpy(dtype=np.int64)
    buckets = hist["bucket"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        # empty input: percentile_disc over zero rows is NULL in the oracle
        # (ADVICE r3 — the fall-through dereferenced buckets[0])
        return pd.DataFrame({"pct": pd.array(QUANT_PCTS, dtype="int64"),
                             "value_cents": np.full(len(QUANT_PCTS), np.nan)})
    targets = {}  # bucket -> [(pct, offset_within_bucket)]
    for pct in QUANT_PCTS:
        # smallest value whose cumulative count*100 >= pct*N
        k = int(np.searchsorted(cum * 100, pct * total, side="left"))
        before = int(cum[k - 1]) if k > 0 else 0
        # percentile_disc = the ceil(pct*N/100)-th smallest (1-based), i.e.
        # the first value whose cumulative fraction reaches pct
        gidx = 0 if total == 0 else max(
            (pct * total + 99) // 100 - 1, 0)
        targets.setdefault(int(buckets[k]), []).append(
            (pct, int(gidx - before)))
    want = sorted(targets)
    bound = int(sum(counts[np.isin(buckets, want)])) if total else 0
    assert bound <= max(1_000_000, total // 10 + 1), \
        "degenerate mass concentration: recurse with a finer QUANT_SHIFT"

    def in_targets(b: pa.Table) -> pa.Table:
        cents = round_half_away_np(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100)
        m = np.isin(cents >> QUANT_SHIFT, np.asarray(want, dtype=np.int64))
        return pa.table({"cents": pa.array(cents[m], pa.int64())})

    vals = np.sort(customer_ds.map_batches(
        in_targets, batch_format="pyarrow").to_pandas()["cents"].to_numpy())
    # map each target's (bucket, offset) onto the collected sorted values
    out = []
    vb = vals >> QUANT_SHIFT
    for bk in want:
        seg = vals[vb == bk]
        for pct, off in targets[bk]:
            out.append((pct, int(seg[off]) if seg.size else 0))
    out.sort()
    return pd.DataFrame(out, columns=["pct", "value_cents"]).astype(
        {"pct": "int64", "value_cents": "int64"})


def acctbal_quantiles_sql() -> str:
    cols = ",\n".join(
        f"SELECT {p}::BIGINT AS pct, percentile_disc({p / 100}) WITHIN GROUP "
        f"(ORDER BY CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS "
        f"value_cents FROM customer" for p in QUANT_PCTS)
    return "\nUNION ALL\n".join(cols.split(",\n"))


# --- TPC-H Q5-shaped: local-supplier revenue per nation in a region ------------
Q5_REGION = "ASIA"
Q5_T0_US = int(np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64))
Q5_T1_US = int(np.datetime64("1998-01-01T00:00:00", "us").astype(np.int64))


def local_supplier_revenue(lineitem_ds, orders_tbl: pa.Table,
                           customer_tbl: pa.Table, supplier_tbl: pa.Table,
                           nation_tbl: pa.Table, region_tbl: pa.Table):
    """TPC-H Q5 — the six-table chain with the query's distinctive twist:
    revenue counts only when the CUSTOMER and the SUPPLIER sit in the SAME
    nation (local fulfilment), rolled up per nation of one region inside an
    order-date window.

    Scale shape: every non-fact side is a broadcast header/dim — region ->
    nation set (a handful of ints), nation names, customer -> nationkey,
    supplier -> nationkey, and the (orderkey -> custkey, orderdate) header
    arrays (the late_shipment broadcast move; above the crossover route
    the header through an orderkey hash join).  Lineitem streams ONCE:
    three vectorized searchsorted/map gathers resolve both nationkeys and
    the date filter, the same-nation equality is a vector compare, and
    (nation) partials feed one tiny groupby."""
    from ray.data.aggregate import Sum

    rkey = {r: k for k, r in zip(
        region_tbl["r_regionkey"].to_pylist(),
        region_tbl["r_name"].to_pylist())}[Q5_REGION]
    nk = np.asarray(nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    nreg = np.asarray(nation_tbl["n_regionkey"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    in_region = set(nk[nreg == rkey].tolist())
    nname = pd.Series(nation_tbl["n_name"].to_pylist(), index=nk)

    cust_nat = pd.Series(
        customer_tbl["c_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64),
        index=customer_tbl["c_custkey"].to_numpy(zero_copy_only=False))
    supp_nat = pd.Series(
        supplier_tbl["s_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64),
        index=supplier_tbl["s_suppkey"].to_numpy(zero_copy_only=False))

    okeys = orders_tbl["o_orderkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(okeys, kind="stable")
    okeys_s = okeys[order].astype(np.int64)
    ocust_s = orders_tbl["o_custkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)[order]
    odate_s = orders_tbl["o_orderdate"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").astype(np.int64)[order]

    _P = pa.schema([("n_name", pa.string()), ("n_orders", pa.int64()),
                    ("revenue_cents", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if okeys_s.size == 0:
            return _P.empty_table()
        ok = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        pos = np.searchsorted(okeys_s, ok).clip(0, okeys_s.size - 1)
        m = (okeys_s[pos] == ok) & (odate_s[pos] >= Q5_T0_US) & \
            (odate_s[pos] < Q5_T1_US)
        cnat = pd.Series(ocust_s[pos][m]).map(cust_nat).to_numpy(np.int64)
        snat = pd.Series(np.asarray(
            b["l_suppkey"].to_numpy(zero_copy_only=False),
            dtype=np.int64)[m]).map(supp_nat).to_numpy(np.int64)
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[m]
        cents = round_half_away_np(px * (1 - disc) * 100)
        keep = (cnat == snat) & np.isin(cnat, list(in_region))
        g = (pd.DataFrame({
            "n_name": pd.Series(cnat[keep]).map(nname).to_numpy(object),
            "cents": cents[keep]})
            .groupby("n_name", sort=False).agg(
                n_orders=("cents", "size"),
                revenue_cents=("cents", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_P).replace_schema_metadata(None)

    return (lineitem_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("n_name").aggregate(
                Sum("n_orders", alias_name="n_orders"),
                Sum("revenue_cents", alias_name="revenue_cents")))


def local_supplier_revenue_sql() -> str:
    return f"""
SELECT n.n_name, count(*)::BIGINT AS n_orders,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT))::BIGINT AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE s.s_nationkey = c.c_nationkey
  AND r.r_name = '{Q5_REGION}'
  AND epoch_us(o.o_orderdate) >= {Q5_T0_US}
  AND epoch_us(o.o_orderdate) < {Q5_T1_US}
GROUP BY 1
"""


# --- TPC-H Q2-shaped: groupwise argmin over a derived part-supplier bridge -----
Q2_SIZE_MOD = 10  # parts with p_size % 10 == 0 (the Q2 size predicate stand-in)


def min_cost_supplier(lineitem_ds, part_tbl: pa.Table, supplier_tbl: pa.Table,
                      nation_tbl: pa.Table):
    """TPC-H Q2 shape — the correlated-min subquery: for each qualifying
    part, the supplier offering the minimum observed unit cost, ties broken
    by the smaller suppkey (the spec's deterministic ORDER BY stand-in).
    The testdata carries no partsupp table, so the part<->supplier bridge is
    DERIVED from lineitem: cost(part, supp) = min discounted-price cents
    over their lineitems (reference parity note: the reference engine's
    min-distance "closest pair" scan in geo.js:788-816 is the same
    groupwise-argmin shape over a derived pair table).

    Scale shape: per-batch (partkey, suppkey, min-cents) partials collapse
    duplicate pairs before the exchange; ONE partkey-sharded fold computes
    the per-part argmin locally (never a global sort of the pair domain);
    the part filter and the supplier/nation attach are broadcast dims
    (part and supplier are the declared-small sides; at planet scale route
    them through partkey/suppkey hash joins like shipping_priority)."""
    NS = n_shards()  # cluster-derived
    keep_parts = part_tbl.to_pandas()
    keep_parts = keep_parts[keep_parts["p_size"] % Q2_SIZE_MOD == 0]
    part_keys = np.sort(keep_parts["p_partkey"].to_numpy(dtype=np.int64))
    brand = pd.Series(keep_parts["p_brand"].to_numpy(dtype=object),
                      index=keep_parts["p_partkey"].to_numpy())
    sup = supplier_tbl.to_pandas().set_index("s_suppkey")
    nname = pd.Series(nation_tbl["n_name"].to_pylist(),
                      index=nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False))

    _P = pa.schema([("pshard", pa.int64()), ("p_partkey", pa.int64()),
                    ("s_suppkey", pa.int64()), ("cost_cents", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["l_partkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        m = _isin_sorted(part_keys, pk)  # safe when no part survives the filter
        pk = pk[m]
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[m]
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[m]
        cents = round_half_away_np(px * (1 - disc) * 100)
        df = pd.DataFrame({"p": pk, "s": sk, "c": cents})
        g = df.groupby(["p", "s"], sort=False)["c"].min().reset_index()
        return pa.Table.from_arrays(
            [pa.array((g["p"].to_numpy() % NS).astype(np.int64)),
             pa.array(g["p"].to_numpy(), pa.int64()),
             pa.array(g["s"].to_numpy(), pa.int64()),
             pa.array(g["c"].to_numpy(), pa.int64())], schema=_P)

    def shard_argmin(df: pd.DataFrame) -> pa.Table:
        # per (part, supp) the true min, then per part the (cost, suppkey)
        # lexicographic argmin — the oracle's ORDER BY cost, suppkey LIMIT 1
        ps = df.groupby(["p_partkey", "s_suppkey"], sort=False)[
            "cost_cents"].min().reset_index()
        ps = ps.sort_values(["p_partkey", "cost_cents", "s_suppkey"],
                            kind="stable")
        best = ps.drop_duplicates("p_partkey", keep="first")
        return pa.table({
            "p_partkey": pa.array(best["p_partkey"].to_numpy(), pa.int64()),
            "s_suppkey": pa.array(best["s_suppkey"].to_numpy(), pa.int64()),
            "cost_cents": pa.array(best["cost_cents"].to_numpy(), pa.int64())})

    def attach(b: pa.Table) -> pa.Table:
        pk = pd.Series(b["p_partkey"].to_numpy(zero_copy_only=False))
        sk = pd.Series(b["s_suppkey"].to_numpy(zero_copy_only=False))
        return pa.table({
            "p_partkey": b["p_partkey"],
            "p_brand": pa.array(pk.map(brand).to_numpy(dtype=object), pa.string()),
            "s_suppkey": b["s_suppkey"],
            "s_name": pa.array(sk.map(sup["s_name"]).to_numpy(dtype=object),
                               pa.string()),
            "n_name": pa.array(sk.map(sup["s_nationkey"]).map(nname)
                               .to_numpy(dtype=object), pa.string()),
            "cost_cents": b["cost_cents"]})

    return (lineitem_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("pshard").map_groups(shard_argmin, batch_format="pandas")
            .map_batches(attach, batch_format="pyarrow"))


def min_cost_supplier_sql() -> str:
    return f"""
WITH cost AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         min(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             )::BIGINT AS cost_cents
  FROM lineitem
  JOIN part p ON p.p_partkey = l_partkey AND p.p_size % {Q2_SIZE_MOD} = 0
  GROUP BY 1, 2
),
best AS (
  SELECT p_partkey, s_suppkey, cost_cents,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY cost_cents, s_suppkey) AS rn
  FROM cost
)
SELECT b.p_partkey, p.p_brand, b.s_suppkey, s.s_name, n.n_name, b.cost_cents
FROM best b
JOIN part p ON p.p_partkey = b.p_partkey
JOIN supplier s ON s.s_suppkey = b.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE b.rn = 1
"""


# --- TPC-H Q10-shaped: returned-item revenue, top-k customers -------------------
Q10_TOP_K = 20


def returned_item_revenue(lineitem_ds, orders_ds, customer_tbl: pa.Table,
                          nation_tbl: pa.Table, k: int = Q10_TOP_K):
    """TPC-H Q10 shape — revenue lost to returns, per customer, top ``k``:
    lineitems with ``l_returnflag = 'R'`` roll up to their order, join to
    the order header for the customer, roll up per customer, keep the k
    biggest (ties by the smaller custkey).

    Scale shape: the lineitem side pre-aggregates per (batch, orderkey)
    before its ONE hash join against the orderkey-projected orders stream;
    the per-customer rollup is a custkey-sharded fold; top-k is per-shard
    k rows then a (shards x k)-row driver merge — never a global sort.
    Customer/nation attach is a broadcast dim lookup."""
    NS = n_shards()
    from .common import drop_empty_blocks

    _L = pa.schema([("o_orderkey", pa.int64()), ("rev_cents", pa.int64())])

    def li_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        key = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = round_half_away_np(px * (1 - disc) * 100)
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.Table.from_arrays([pa.array(u), pa.array(s)], schema=_L)

    def ord_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"]})

    li = drop_empty_blocks(
        lineitem_ds.map_batches(li_partial, batch_format="pyarrow").materialize())
    joined = li.join(orders_ds.map_batches(ord_proj, batch_format="pyarrow"),
                     join_type="inner", num_partitions=cap_join_partitions(8),
                     on=("o_orderkey",))

    _C = pa.schema([("cshard", pa.int64()), ("c_custkey", pa.int64()),
                    ("rev_cents", pa.int64())])

    def cust_partial(b: pa.Table) -> pa.Table:
        ck = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        rv = b["rev_cents"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(ck, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, rv)
        return pa.Table.from_arrays(
            [pa.array((u % NS).astype(np.int64)), pa.array(u), pa.array(s)],
            schema=_C)

    def shard_topk(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("c_custkey", sort=False)["rev_cents"].sum().reset_index()
        g = g.sort_values(["rev_cents", "c_custkey"],
                          ascending=[False, True], kind="stable").head(k)
        return pa.table({
            "c_custkey": pa.array(g["c_custkey"].to_numpy(), pa.int64()),
            "rev_cents": pa.array(g["rev_cents"].to_numpy(), pa.int64())})

    cand = (joined.map_batches(cust_partial, batch_format="pyarrow")
            .groupby("cshard").map_groups(shard_topk, batch_format="pandas")
            .to_pandas())  # <= NS * k rows: the bounded driver merge
    cand = cand.sort_values(["rev_cents", "c_custkey"],
                            ascending=[False, True], kind="stable").head(k)

    cust = customer_tbl.to_pandas().set_index("c_custkey")
    nname = pd.Series(nation_tbl["n_name"].to_pylist(),
                      index=nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False))
    ck = cand["c_custkey"]
    out = pa.table({
        "c_custkey": pa.array(ck.to_numpy(), pa.int64()),
        "c_name": pa.array(ck.map(cust["c_name"]).to_numpy(dtype=object),
                           pa.string()),
        "n_name": pa.array(ck.map(cust["c_nationkey"]).map(nname)
                           .to_numpy(dtype=object), pa.string()),
        "rev_cents": pa.array(cand["rev_cents"].to_numpy(), pa.int64())})
    import ray.data as rd

    return rd.from_arrow(out)


def returned_item_revenue_sql(k: int = Q10_TOP_K) -> str:
    return f"""
WITH r AS (
  SELECT o.o_custkey AS c_custkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
             AS BIGINT))::BIGINT AS rev_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1
  ORDER BY rev_cents DESC, c_custkey ASC
  LIMIT {k}
)
SELECT r.c_custkey, c.c_name, n.n_name, r.rev_cents
FROM r
JOIN customer c ON c.c_custkey = r.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
"""


# --- TPC-H Q13-shaped: order-count distribution (left join + double groupby) ---
Q13_EXCLUDE_PRIORITY = "1-URGENT"


def order_count_distribution(customer_ds, orders_ds):
    """TPC-H Q13 shape — the customer-order distribution: per customer the
    number of non-urgent orders (zero included via the left join), then the
    histogram (order_count, n_customers).

    Scale shape: orders pre-count per (batch, custkey) then fold through
    ONE custkey-sharded exchange into per-customer totals; the per-shard
    fold emits LOCAL histogram rows (count -> n_cust), so the second
    groupby sees at most shards x distinct-counts tiny rows.  The zero
    bucket = total customers (one scalar partial-sum) minus customers with
    any qualifying order (per-shard distinct tally riding the same fold) —
    the left join never materializes."""
    NS = n_shards()
    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks

    _O = pa.schema([("cshard", pa.int64()), ("c_custkey", pa.int64()),
                    ("n", pa.int64())])

    def ord_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.not_equal(b["o_orderpriority"], Q13_EXCLUDE_PRIORITY))
        ck = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, 1)
        return pa.Table.from_arrays(
            [pa.array((u % NS).astype(np.int64)), pa.array(u), pa.array(s)],
            schema=_O)

    _H = pa.schema([("order_count", pa.int64()), ("n_customers", pa.int64())])

    def shard_hist(df: pd.DataFrame) -> pa.Table:
        per_cust = df.groupby("c_custkey", sort=False)["n"].sum()
        h = per_cust.value_counts()
        return pa.Table.from_arrays(
            [pa.array(h.index.to_numpy(), pa.int64()),
             pa.array(h.to_numpy(), pa.int64())], schema=_H)

    hist = (orders_ds.map_batches(ord_partial, batch_format="pyarrow")
            .groupby("cshard").map_groups(shard_hist, batch_format="pandas")
            .groupby("order_count").aggregate(
                Sum("n_customers", alias_name="n_customers"))
            .to_pandas())  # |distinct counts| rows — tiny by construction

    def cust_count(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([np.int64(b.num_rows)], pa.int64())})

    total = int(sum(r["n"] for r in drop_empty_blocks(
        customer_ds.map_batches(cust_count, batch_format="pyarrow"))
        .take_all()))
    zero = total - int(hist["n_customers"].sum())
    if zero > 0:
        hist = pd.concat([hist, pd.DataFrame(
            {"order_count": [0], "n_customers": [zero]})], ignore_index=True)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "order_count": pa.array(hist["order_count"].to_numpy(), pa.int64()),
        "n_customers": pa.array(hist["n_customers"].to_numpy(), pa.int64())}))


def order_count_distribution_sql() -> str:
    return f"""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS order_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '{Q13_EXCLUDE_PRIORITY}'
  GROUP BY 1
)
SELECT order_count, count(*)::BIGINT AS n_customers
FROM per_cust GROUP BY 1
"""


# --- TPC-H Q8-shaped: market share of a nation inside a region, per year -------
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_6"  # a nation inside Q8_REGION


def nation_market_share(lineitem_ds, orders_ds, customer_tbl: pa.Table,
                        supplier_tbl: pa.Table, nation_tbl: pa.Table,
                        region_tbl: pa.Table):
    """TPC-H Q8 shape — market share: among orders placed by customers in
    ``Q8_REGION``, the fraction of line-item revenue supplied by
    ``Q8_NATION``, per order year.  The share is reported as exact integer
    cents (numerator + denominator), not a float division, so the oracle
    matches bit-for-bit.

    Scale shape: the supplier->is-target-nation map and the
    customer->in-region set are broadcast dims (both declared-small; at
    planet scale the customer side routes through a custkey hash join like
    shipping_priority); lineitem pre-aggregates per (batch, orderkey) into
    (total, target) cent pairs before its ONE hash join against the
    region-filtered orders projection; the per-year rollup is a tiny
    groupby."""
    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks

    nat = nation_tbl.to_pandas()
    reg = region_tbl.to_pandas()
    rkey = int(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"].iloc[0])
    region_nations = set(nat.loc[nat["n_regionkey"] == rkey,
                                 "n_nationkey"].tolist())
    target_nkey = int(nat.loc[nat["n_name"] == Q8_NATION,
                              "n_nationkey"].iloc[0])

    cust = customer_tbl.to_pandas()
    in_region = np.fromiter(
        (ck for ck, nk in zip(cust["c_custkey"], cust["c_nationkey"])
         if int(nk) in region_nations), dtype=np.int64)
    in_region.sort()
    sup = supplier_tbl.to_pandas()
    target_sups = np.fromiter(
        (sk for sk, nk in zip(sup["s_suppkey"], sup["s_nationkey"])
         if int(nk) == target_nkey), dtype=np.int64)
    target_sups.sort()

    _L = pa.schema([("o_orderkey", pa.int64()), ("total_cents", pa.int64()),
                    ("target_cents", pa.int64())])

    def li_partial(b: pa.Table) -> pa.Table:
        key = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = round_half_away_np(px * (1 - disc) * 100)
        is_t = np.zeros(sk.size, dtype=np.int64)
        is_t[_isin_sorted(target_sups, sk)] = 1  # safe when no target supplier
        u, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(u.size, dtype=np.int64)
        tgt = np.zeros(u.size, dtype=np.int64)
        np.add.at(tot, inv, cents)
        np.add.at(tgt, inv, cents * is_t)
        return pa.Table.from_arrays(
            [pa.array(u), pa.array(tot), pa.array(tgt)], schema=_L)

    def ord_proj(b: pa.Table) -> pa.Table:
        ck = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        keep = _isin_sorted(in_region, ck)  # safe when the region is empty
        d = b["o_orderdate"].to_numpy(zero_copy_only=False)[keep].astype(
            "datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "o_orderkey": pa.array(np.asarray(
                b["o_orderkey"].to_numpy(zero_copy_only=False),
                dtype=np.int64)[keep]),
            "o_year": pa.array(d, pa.int64())})

    _Y = pa.schema([("o_year", pa.int64()), ("total_cents", pa.int64()),
                    ("target_cents", pa.int64())])

    li = drop_empty_blocks(
        lineitem_ds.map_batches(li_partial, batch_format="pyarrow").materialize())
    ords = drop_empty_blocks(orders_ds.map_batches(
        ord_proj, batch_format="pyarrow").materialize())
    if li.count() == 0 or ords.count() == 0:
        # an all-empty side (e.g. no in-region customer at a tiny scale)
        # has no schema and would break the Acero hash join
        import ray.data as rd

        return rd.from_arrow(_Y.empty_table())
    joined = li.join(
        ords, join_type="inner", num_partitions=cap_join_partitions(8),
        on=("o_orderkey",))

    def year_partial(b: pa.Table) -> pa.Table:
        y = np.asarray(b["o_year"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        u, inv = np.unique(y, return_inverse=True)
        tot = np.zeros(u.size, dtype=np.int64)
        tgt = np.zeros(u.size, dtype=np.int64)
        np.add.at(tot, inv, b["total_cents"].to_numpy(zero_copy_only=False))
        np.add.at(tgt, inv, b["target_cents"].to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [pa.array(u), pa.array(tot), pa.array(tgt)], schema=_Y)

    return (joined.map_batches(year_partial, batch_format="pyarrow")
            .groupby("o_year").aggregate(
                Sum("total_cents", alias_name="total_cents"),
                Sum("target_cents", alias_name="target_cents")))


def nation_market_share_sql() -> str:
    return f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
           AS BIGINT))::BIGINT AS total_cents,
       sum(CASE WHEN sn.n_name = '{Q8_NATION}'
                THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT) ELSE 0 END)::BIGINT AS target_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = '{Q8_REGION}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY 1
"""


# --- shared: membership test against a sorted int64 array ----------------------


def _isin_sorted(sorted_arr: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized ``keys ∈ sorted_arr`` (boolean mask).  Safe on empty sides."""
    if sorted_arr.size == 0 or keys.size == 0:
        return np.zeros(keys.size, dtype=bool)
    pos = np.searchsorted(sorted_arr, keys)
    return (pos < sorted_arr.size) & (
        sorted_arr[np.minimum(pos, sorted_arr.size - 1)] == keys)


# --- TPC-H Q4-shaped: order priority counts with an EXISTS semi-join -----------
Q4_T0_US = int(np.datetime64("1996-07-01T00:00:00", "us").astype(np.int64))
Q4_T1_US = int(np.datetime64("1996-10-01T00:00:00", "us").astype(np.int64))


def order_priority_counts(orders_ds, lineitem_ds):
    """TPC-H Q4 shape — per order priority, count the orders placed in one
    quarter where EXISTS a late line item (shipdate > orderdate +
    {LATE_SHIP_DAYS}d; the schema's stand-in for Q4's commitdate <
    receiptdate).

    Scale shape: the EXISTS collapses to ``max(shipdate) per order`` — a
    per-batch pre-reduction — so the exchange carries ONE fixed-width row
    per (batch, orderkey) from each side.  Both sides are corpus-scale
    (orders AND lineitem), so neither broadcasts: order headers and
    lineitem partials ride the SAME okey-sharded union exchange (the
    anchor_text_index big-big layout) and each shard folds the semi-join
    + priority count locally.  Output is priority-domain bounded."""
    NS = n_shards()
    from ray.data.aggregate import Sum

    _U = pa.schema([("oshard", pa.int64()), ("tag", pa.int64()),
                    ("ok", pa.int64()), ("us", pa.int64()),
                    ("pri", pa.string())])

    def ord_rows(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        m = (d >= Q4_T0_US) & (d < Q4_T1_US)
        ok = np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[m]
        return pa.Table.from_arrays(
            [pa.array((ok % NS).astype(np.int64)),
             pa.array(np.zeros(ok.size, dtype=np.int64)),
             pa.array(ok), pa.array(d[m]),
             pa.array(b["o_orderpriority"].to_pandas()[m].to_numpy(
                 dtype=object), pa.string())], schema=_U)

    def li_rows(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        mx = np.full(u.size, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, ship)
        return pa.Table.from_arrays(
            [pa.array((u % NS).astype(np.int64)),
             pa.array(np.ones(u.size, dtype=np.int64)),
             pa.array(u), pa.array(mx),
             pa.array([""] * u.size, pa.string())], schema=_U)

    _O = pa.schema([("o_orderpriority", pa.string()),
                    ("n_orders", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        o = df[df["tag"] == 0]
        if len(o) == 0:
            return _O.empty_table()
        li = (df[df["tag"] == 1].groupby("ok", sort=False)["us"]
              .max().reset_index().rename(columns={"us": "max_ship"}))
        m = o.merge(li, on="ok", how="inner")
        late = m[m["max_ship"] > m["us"] + _LATE_US]
        g = late.groupby("pri", sort=False).size().reset_index(name="n")
        return pa.Table.from_arrays(
            [pa.array(g["pri"].to_numpy(dtype=object), pa.string()),
             pa.array(g["n"].to_numpy(), pa.int64())], schema=_O)

    union = (orders_ds.map_batches(ord_rows, batch_format="pyarrow")
             .union(lineitem_ds.map_batches(li_rows,
                                            batch_format="pyarrow")))
    return (union.groupby("oshard").map_groups(fold, batch_format="pandas")
            .groupby("o_orderpriority").aggregate(
                Sum("n_orders", alias_name="n_orders")))


def order_priority_counts_sql() -> str:
    return f"""
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders o
WHERE epoch_us(o_orderdate) >= {Q4_T0_US}
  AND epoch_us(o_orderdate) < {Q4_T1_US}
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {_LATE_US})
GROUP BY 1
"""


# --- TPC-H Q6-shaped: single-scan predicate revenue --------------------------
Q6_T0_US = int(np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64))
Q6_T1_US = int(np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64))
Q6_DISC_LO_C = 5   # discount window, integer percent (round(l_discount*100))
Q6_DISC_HI_C = 7
Q6_QTY_LT = 24


def forecast_revenue(lineitem_ds):
    """TPC-H Q6 shape — the pure filter-aggregate: revenue that would be
    recovered by eliminating a discount band in one shipping year
    (sum of extendedprice * discount over the predicate rows).

    Scale shape: one streaming scan, one fixed-width row out per BLOCK
    (cents + count partials), and a bounded driver fold over the per-block
    rows — no shuffle at all.  Discounts compare in integer cents so the
    band predicate is float-free on both engine and oracle."""
    _P = pa.schema([("cents", pa.int64()), ("n", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        disc_c = round_half_away_np(disc * 100)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        m = ((d >= Q6_T0_US) & (d < Q6_T1_US)
             & (disc_c >= Q6_DISC_LO_C) & (disc_c <= Q6_DISC_HI_C)
             & (qty < Q6_QTY_LT))
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        cents = int(np.sum(round_half_away_np(px * disc[m] * 100)))
        return pa.Table.from_arrays(
            [pa.array([cents], pa.int64()),
             pa.array([int(m.sum())], pa.int64())], schema=_P)

    parts = lineitem_ds.map_batches(
        partial, batch_format="pyarrow").to_pandas()  # one row per block
    n = int(parts["n"].sum()) if len(parts) else 0
    rev = int(parts["cents"].sum()) if n else None
    return pa.table({"revenue_cents": pa.array([rev], pa.int64()),
                     "n_items": pa.array([n], pa.int64())})


def forecast_revenue_sql() -> str:
    return f"""
SELECT sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)
           )::BIGINT AS revenue_cents,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE epoch_us(l_shipdate) >= {Q6_T0_US} AND epoch_us(l_shipdate) < {Q6_T1_US}
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN {Q6_DISC_LO_C} AND {Q6_DISC_HI_C}
  AND l_quantity < {Q6_QTY_LT}
"""


# --- TPC-H Q7-shaped: bilateral volume shipping between two nations ------------
Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_9"
Q7_T0_US = int(np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64))
Q7_T1_US = int(np.datetime64("1998-01-01T00:00:00", "us").astype(np.int64))


def volume_shipping(lineitem_ds, orders_ds, customer_tbl: pa.Table,
                    supplier_tbl: pa.Table, nation_tbl: pa.Table):
    """TPC-H Q7 shape — trade volume between two nations, per direction and
    ship year: revenue where the supplier sits in one nation of the pair and
    the ordering customer in the OTHER.

    Scale shape: the supplier->pair-label and customer->pair-label maps
    broadcast (dims; route the customer side through a custkey hash join
    above the shipping_priority crossover); lineitem pre-aggregates per
    (batch, orderkey, supp-nation, ship-year) — only pair-supplier items
    survive the scan — and rides ONE okey-sharded union exchange against
    the pair-customer order projection (both sides corpus-scale, nothing
    broadcast between them).  The output is 2 directions x years."""
    NS = n_shards()
    from ray.data.aggregate import Sum

    nat = nation_tbl.to_pandas()
    nk = {r["n_name"]: int(r["n_nationkey"]) for _, r in nat.iterrows()}
    ka, kb = nk[Q7_NATION_A], nk[Q7_NATION_B]

    sup = supplier_tbl.to_pandas()
    sup_a = np.sort(sup.loc[sup["s_nationkey"] == ka,
                            "s_suppkey"].to_numpy(dtype=np.int64))
    sup_b = np.sort(sup.loc[sup["s_nationkey"] == kb,
                            "s_suppkey"].to_numpy(dtype=np.int64))
    cust = customer_tbl.to_pandas()
    cust_a = np.sort(cust.loc[cust["c_nationkey"] == ka,
                              "c_custkey"].to_numpy(dtype=np.int64))
    cust_b = np.sort(cust.loc[cust["c_nationkey"] == kb,
                              "c_custkey"].to_numpy(dtype=np.int64))

    _U = pa.schema([("oshard", pa.int64()), ("tag", pa.int64()),
                    ("ok", pa.int64()), ("yr", pa.int64()),
                    ("cents", pa.int64()), ("nat", pa.string())])

    def li_partial(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        win = (d >= Q7_T0_US) & (d < Q7_T1_US)
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        in_a = _isin_sorted(sup_a, sk) & win
        in_b = _isin_sorted(sup_b, sk) & win
        keep = in_a | in_b
        if not keep.any():
            return _U.empty_table()
        ok = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[keep]
        yr = (b["l_shipdate"].to_numpy(zero_copy_only=False)[keep]
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
        cents = round_half_away_np(px * (1 - disc) * 100)
        lab = np.where(in_a[keep], 0, 1)  # 0=A supplier, 1=B supplier
        df = (pd.DataFrame({"ok": ok, "yr": yr, "lab": lab, "cents": cents})
              .groupby(["ok", "yr", "lab"], sort=False)["cents"].sum()
              .reset_index())
        names = np.where(df["lab"].to_numpy() == 0, Q7_NATION_A, Q7_NATION_B)
        return pa.Table.from_arrays(
            [pa.array((df["ok"].to_numpy() % NS).astype(np.int64)),
             pa.array(np.ones(len(df), dtype=np.int64)),
             pa.array(df["ok"].to_numpy(), pa.int64()),
             pa.array(df["yr"].to_numpy(), pa.int64()),
             pa.array(df["cents"].to_numpy(), pa.int64()),
             pa.array(names, pa.string())], schema=_U)

    def ord_rows(b: pa.Table) -> pa.Table:
        ck = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        in_a = _isin_sorted(cust_a, ck)
        in_b = _isin_sorted(cust_b, ck)
        keep = in_a | in_b
        if not keep.any():
            return _U.empty_table()
        ok = np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[keep]
        names = np.where(in_a[keep], Q7_NATION_A, Q7_NATION_B)
        z = np.zeros(ok.size, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array((ok % NS).astype(np.int64)), pa.array(z),
             pa.array(ok), pa.array(z), pa.array(z),
             pa.array(names, pa.string())], schema=_U)

    _O = pa.schema([("supp_nation", pa.string()),
                    ("cust_nation", pa.string()),
                    ("l_year", pa.int64()), ("revenue_cents", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        o = df[df["tag"] == 0][["ok", "nat"]].rename(
            columns={"nat": "cust_nation"})
        li = df[df["tag"] == 1]
        if len(o) == 0 or len(li) == 0:
            return _O.empty_table()
        m = li.merge(o, on="ok", how="inner")
        m = m[m["nat"] != m["cust_nation"]]  # cross-pair directions only
        g = (m.groupby(["nat", "cust_nation", "yr"], sort=False)["cents"]
             .sum().reset_index())
        return pa.Table.from_arrays(
            [pa.array(g["nat"].to_numpy(dtype=object), pa.string()),
             pa.array(g["cust_nation"].to_numpy(dtype=object), pa.string()),
             pa.array(g["yr"].to_numpy(), pa.int64()),
             pa.array(g["cents"].to_numpy(), pa.int64())], schema=_O)

    union = (orders_ds.map_batches(ord_rows, batch_format="pyarrow")
             .union(lineitem_ds.map_batches(li_partial,
                                            batch_format="pyarrow")))
    return (union.groupby("oshard").map_groups(fold, batch_format="pandas")
            .groupby(["supp_nation", "cust_nation", "l_year"]).aggregate(
                Sum("revenue_cents", alias_name="revenue_cents")))


def volume_shipping_sql() -> str:
    return f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
           AS BIGINT))::BIGINT AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE epoch_us(l.l_shipdate) >= {Q7_T0_US}
  AND epoch_us(l.l_shipdate) < {Q7_T1_US}
  AND ((sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
    OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}'))
GROUP BY 1, 2, 3
"""


# --- TPC-H Q9-shaped: product-line profit per nation and order year ------------
Q9_NAME_TOKEN = "red"


def product_type_profit(lineitem_ds, orders_ds, part_tbl: pa.Table,
                        supplier_tbl: pa.Table, nation_tbl: pa.Table):
    """TPC-H Q9 shape — profit per (supplier nation, order year) over the
    parts whose name contains ``{Q9_NAME_TOKEN}`` (the schema carries no
    partsupp.supplycost, so profit is discounted revenue).

    Scale shape: the matching-partkey set and the supplier->nation-name map
    broadcast (part is a dim here; above the crossover route it through a
    partkey hash join); lineitem pre-aggregates per (batch, orderkey,
    nation) and joins the order-year projection on ONE okey-sharded union
    exchange — orders never broadcasts.  Output is nations x years."""
    NS = n_shards()
    from ray.data.aggregate import Sum

    pnames = part_tbl["p_name"].to_pylist()
    pkeys = part_tbl["p_partkey"].to_numpy(zero_copy_only=False)
    red = np.sort(np.asarray(
        [int(k) for k, nm in zip(pkeys, pnames)
         if nm is not None and Q9_NAME_TOKEN in nm], dtype=np.int64))

    nat = nation_tbl.to_pandas()
    nname = pd.Series(nat["n_name"].to_numpy(dtype=object),
                      index=nat["n_nationkey"].to_numpy())
    sup = supplier_tbl.to_pandas()
    sup_sk = sup["s_suppkey"].to_numpy(dtype=np.int64)
    order = np.argsort(sup_sk, kind="stable")
    sup_sk_s = sup_sk[order]
    sup_nat_s = sup["s_nationkey"].map(nname).to_numpy(dtype=object)[order]

    _U = pa.schema([("oshard", pa.int64()), ("tag", pa.int64()),
                    ("ok", pa.int64()), ("yr", pa.int64()),
                    ("cents", pa.int64()), ("nat", pa.string())])

    def li_partial(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["l_partkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        keep = _isin_sorted(red, pk)
        if not keep.any():
            return _U.empty_table()
        ok = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[keep]
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[keep]
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
        cents = round_half_away_np(px * (1 - disc) * 100)
        pos = np.searchsorted(sup_sk_s, sk).clip(0, sup_sk_s.size - 1)
        nats = sup_nat_s[pos]
        df = (pd.DataFrame({"ok": ok, "nat": nats, "cents": cents})
              .groupby(["ok", "nat"], sort=False)["cents"].sum()
              .reset_index())
        return pa.Table.from_arrays(
            [pa.array((df["ok"].to_numpy() % NS).astype(np.int64)),
             pa.array(np.ones(len(df), dtype=np.int64)),
             pa.array(df["ok"].to_numpy(), pa.int64()),
             pa.array(np.zeros(len(df), dtype=np.int64)),
             pa.array(df["cents"].to_numpy(), pa.int64()),
             pa.array(df["nat"].to_numpy(dtype=object), pa.string())],
            schema=_U)

    def ord_rows(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        yr = (b["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        z = np.zeros(ok.size, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array((ok % NS).astype(np.int64)), pa.array(z),
             pa.array(ok), pa.array(yr), pa.array(z),
             pa.array([""] * ok.size, pa.string())], schema=_U)

    _O = pa.schema([("nation", pa.string()), ("o_year", pa.int64()),
                    ("profit_cents", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        li = df[df["tag"] == 1]
        if len(li) == 0:
            return _O.empty_table()
        o = df[df["tag"] == 0][["ok", "yr"]].rename(columns={"yr": "o_year"})
        m = li.merge(o, on="ok", how="inner")
        g = (m.groupby(["nat", "o_year"], sort=False)["cents"].sum()
             .reset_index())
        return pa.Table.from_arrays(
            [pa.array(g["nat"].to_numpy(dtype=object), pa.string()),
             pa.array(g["o_year"].to_numpy(), pa.int64()),
             pa.array(g["cents"].to_numpy(), pa.int64())], schema=_O)

    union = (orders_ds.map_batches(ord_rows, batch_format="pyarrow")
             .union(lineitem_ds.map_batches(li_partial,
                                            batch_format="pyarrow")))
    return (union.groupby("oshard").map_groups(fold, batch_format="pandas")
            .groupby(["nation", "o_year"]).aggregate(
                Sum("profit_cents", alias_name="profit_cents")))


def product_type_profit_sql() -> str:
    return f"""
SELECT sn.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
           AS BIGINT))::BIGINT AS profit_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%{Q9_NAME_TOKEN}%'
GROUP BY 1, 2
"""


# --- TPC-H Q12-shaped: late shipments split by order priority ------------------
Q12_T0_US = int(np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64))
Q12_T1_US = int(np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64))
Q12_HIGH = ("1-URGENT", "2-HIGH")


def late_lineitem_modes(lineitem_ds, orders_ds):
    """TPC-H Q12 shape — per line status (the schema's stand-in for
    shipmode), count the line items shipped late inside one year, split by
    whether the owning order was high priority (URGENT/HIGH) or not.

    Scale shape: lateness needs the order date per item, so line items ride
    raw fixed-width (ok, status, ship) rows against (ok, priority, odate)
    order rows on ONE okey-sharded union exchange — the same
    O(fact)-fixed-width exchange the sessionize family uses; nothing
    corpus-scale broadcasts and the output is status-domain bounded."""
    NS = n_shards()
    from ray.data.aggregate import Sum

    _U = pa.schema([("oshard", pa.int64()), ("tag", pa.int64()),
                    ("ok", pa.int64()), ("us", pa.int64()),
                    ("s", pa.string())])

    def li_rows(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        m = (ship >= Q12_T0_US) & (ship < Q12_T1_US)
        ok = np.asarray(b["l_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[m]
        return pa.Table.from_arrays(
            [pa.array((ok % NS).astype(np.int64)),
             pa.array(np.ones(ok.size, dtype=np.int64)),
             pa.array(ok), pa.array(ship[m]),
             pa.array(b["l_linestatus"].to_pandas()[m].to_numpy(
                 dtype=object), pa.string())], schema=_U)

    def ord_rows(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        d = b["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array((ok % NS).astype(np.int64)),
             pa.array(np.zeros(ok.size, dtype=np.int64)),
             pa.array(ok), pa.array(d),
             pa.array(b["o_orderpriority"].to_pandas().to_numpy(
                 dtype=object), pa.string())], schema=_U)

    _O = pa.schema([("l_linestatus", pa.string()),
                    ("high_line_count", pa.int64()),
                    ("low_line_count", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        li = df[df["tag"] == 1]
        if len(li) == 0:
            return _O.empty_table()
        o = df[df["tag"] == 0][["ok", "us", "s"]].rename(
            columns={"us": "odate", "s": "pri"})
        m = li.merge(o, on="ok", how="inner")
        m = m[m["us"] > m["odate"] + _LATE_US]
        if len(m) == 0:
            return _O.empty_table()
        hi = m["pri"].isin(Q12_HIGH).astype(np.int64)
        g = (pd.DataFrame({"s": m["s"].to_numpy(), "hi": hi,
                           "lo": 1 - hi})
             .groupby("s", sort=False)[["hi", "lo"]].sum().reset_index())
        return pa.Table.from_arrays(
            [pa.array(g["s"].to_numpy(dtype=object), pa.string()),
             pa.array(g["hi"].to_numpy(), pa.int64()),
             pa.array(g["lo"].to_numpy(), pa.int64())], schema=_O)

    union = (orders_ds.map_batches(ord_rows, batch_format="pyarrow")
             .union(lineitem_ds.map_batches(li_rows,
                                            batch_format="pyarrow")))
    return (union.groupby("oshard").map_groups(fold, batch_format="pandas")
            .groupby("l_linestatus").aggregate(
                Sum("high_line_count", alias_name="high_line_count"),
                Sum("low_line_count", alias_name="low_line_count")))


def late_lineitem_modes_sql() -> str:
    hi = ", ".join(f"'{p}'" for p in Q12_HIGH)
    return f"""
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ({hi}) THEN 1 ELSE 0
           END)::BIGINT AS high_line_count,
       sum(CASE WHEN o.o_orderpriority IN ({hi}) THEN 0 ELSE 1
           END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE epoch_us(l.l_shipdate) >= {Q12_T0_US}
  AND epoch_us(l.l_shipdate) < {Q12_T1_US}
  AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {_LATE_US}
GROUP BY 1
"""


# --- TPC-H Q16-shaped: distinct-supplier variety per part group ----------------
Q16_EXCL_BRAND = "Brand#13"
Q16_SIZES = (1, 5, 9, 14, 19, 23, 30, 36)


def part_supplier_variety(lineitem_ds, part_tbl: pa.Table,
                          supplier_tbl: pa.Table):
    """TPC-H Q16 shape — how many DISTINCT suppliers have shipped each
    (brand, type, size) part group, excluding one brand, a size whitelist,
    and suppliers under review (negative account balance — Q16's
    complaints stand-in).

    Scale shape: the part dim maps partkey -> dense (brand, type, size)
    group codes and broadcasts with the excluded-supplier set (part is a
    dim; above the crossover route it through a partkey hash join); each
    batch emits DISTINCT (group, suppkey) int pairs, and ONE exchange
    keyed by hash(group, suppkey) makes per-shard distinct == globally
    distinct, so shard-local group counts sum exactly.  Distinct-count
    state is never centralized."""
    NS = n_shards()
    from ray.data.aggregate import Sum

    pt = part_tbl.to_pandas()
    keep = ((pt["p_brand"] != Q16_EXCL_BRAND)
            & (pt["p_size"].isin(Q16_SIZES)))
    pt = pt[keep].reset_index(drop=True)
    # dense group codes per (brand, type, size); decode table rides along
    grp = pt.groupby(["p_brand", "p_type", "p_size"], sort=True)
    codes = grp.ngroup().to_numpy(dtype=np.int64)
    decode = (pt.assign(code=codes)
              .drop_duplicates("code")[["code", "p_brand", "p_type",
                                        "p_size"]]
              .set_index("code").sort_index())
    pk = pt["p_partkey"].to_numpy(dtype=np.int64)
    order = np.argsort(pk, kind="stable")
    pk_s, code_s = pk[order], codes[order]

    sup = supplier_tbl.to_pandas()
    excl = np.sort(sup.loc[sup["s_acctbal"] < 0,
                           "s_suppkey"].to_numpy(dtype=np.int64))

    _P = pa.schema([("gshard", pa.int64()), ("code", pa.int64()),
                    ("sk", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        pkb = np.asarray(b["l_partkey"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        m = _isin_sorted(pk_s, pkb) & ~_isin_sorted(excl, sk)
        if not m.any():
            return _P.empty_table()
        pos = np.searchsorted(pk_s, pkb[m]).clip(0, pk_s.size - 1)
        code = code_s[pos]
        df = pd.DataFrame({"code": code, "sk": sk[m]}).drop_duplicates()
        shard = ((df["code"].to_numpy() * np.int64(2654435761)
                  + df["sk"].to_numpy()) % NS)
        return pa.Table.from_arrays(
            [pa.array(shard.astype(np.int64)),
             pa.array(df["code"].to_numpy(), pa.int64()),
             pa.array(df["sk"].to_numpy(), pa.int64())], schema=_P)

    _O = pa.schema([("p_brand", pa.string()), ("p_type", pa.string()),
                    ("p_size", pa.int64()), ("supplier_cnt", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        d = df[["code", "sk"]].drop_duplicates()
        g = d.groupby("code", sort=False).size().reset_index(name="n")
        dec = decode.loc[g["code"].to_numpy()]
        return pa.Table.from_arrays(
            [pa.array(dec["p_brand"].to_numpy(dtype=object), pa.string()),
             pa.array(dec["p_type"].to_numpy(dtype=object), pa.string()),
             pa.array(dec["p_size"].to_numpy(), pa.int64()),
             pa.array(g["n"].to_numpy(), pa.int64())], schema=_O)

    return (lineitem_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("gshard").map_groups(fold, batch_format="pandas")
            .groupby(["p_brand", "p_type", "p_size"]).aggregate(
                Sum("supplier_cnt", alias_name="supplier_cnt")))


def part_supplier_variety_sql() -> str:
    sizes = ", ".join(str(s) for s in Q16_SIZES)
    return f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
  AND p.p_size IN ({sizes})
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# --- TPC-H Q11-shaped: parts above a global revenue-share threshold ------------
Q11_SHARE_DENOM = 1500   # keep parts with revenue > total / this


def important_parts(lineitem_ds):
    """TPC-H Q11 shape — the HAVING-vs-global-scalar: partkeys whose
    line-item revenue exceeds 1/{Q11_SHARE_DENOM} of TOTAL revenue (the
    schema carries no partsupp, so revenue stands in for stock value).

    Scale shape: per-batch (partkey, cents) partials -> one pk-sharded
    fold (part-domain bounded, materialized once, read twice); the global
    total folds per-block local sums on the driver (<=1 row per block) and
    ships back by closure.  The share compare is integer cross-multiplied
    — no float division on either side."""
    NS = n_shards()
    _P = pa.schema([("pshard", pa.int64()), ("l_partkey", pa.int64()),
                    ("cents", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["l_partkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        px = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = round_half_away_np(px * (1 - disc) * 100)
        u, inv = np.unique(pk, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.Table.from_arrays(
            [pa.array((u % NS).astype(np.int64)), pa.array(u),
             pa.array(s)], schema=_P)

    def shard_fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("l_partkey", sort=False)["cents"].sum().reset_index()
        return pa.Table.from_pandas(
            g.rename(columns={"cents": "value_cents"}),
            preserve_index=False, schema=pa.schema([
                ("l_partkey", pa.int64()), ("value_cents", pa.int64()),
            ])).replace_schema_metadata(None)

    rev = (lineitem_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("pshard").map_groups(shard_fold, batch_format="pandas")
           .materialize())  # part-domain bounded; read twice below

    def local_sum(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "value_cents" not in b.column_names:
            return pa.schema([("s", pa.int64())]).empty_table()
        return pa.table({"s": pa.array(
            [int(np.sum(b["value_cents"].to_numpy(zero_copy_only=False)))],
            pa.int64())})

    sums = rev.map_batches(local_sum, batch_format="pyarrow").to_pandas()
    total = int(sums["s"].sum()) if len(sums) else 0

    def keep_big(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # value * DENOM > total, in Python ints (no int64 overflow risk)
        v = b["value_cents"].to_numpy(zero_copy_only=False)
        m = np.fromiter((int(x) * Q11_SHARE_DENOM > total for x in v),
                        dtype=bool, count=v.size)
        return b.filter(pa.array(m))

    return rev.map_batches(keep_big, batch_format="pyarrow")


def important_parts_sql() -> str:
    return f"""
WITH r AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             )::BIGINT AS value_cents
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, value_cents FROM r
WHERE value_cents * {Q11_SHARE_DENOM} > (SELECT sum(value_cents) FROM r)
"""


# --- TPC-H Q20-shaped: heavy shippers of a promoted part line ------------------
Q20_NAME_PREFIX = "red"
Q20_T0_US = int(np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64))
Q20_T1_US = int(np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64))
Q20_QTY_GT = 150


def promo_part_suppliers(lineitem_ds, part_tbl: pa.Table,
                         supplier_tbl: pa.Table, nation_tbl: pa.Table):
    """TPC-H Q20 shape — the nested-aggregate semi-join: suppliers whose
    shipped quantity of '{Q20_NAME_PREFIX}%'-named parts inside one year
    exceeds {Q20_QTY_GT} units (the availqty*0.5 threshold of Q20, made
    absolute — the schema carries no partsupp), decorated with their
    nation.

    Scale shape: the matching-partkey set broadcasts; per-batch (suppkey,
    qty-units) partials fold on one sk-sharded exchange
    (supplier-domain bounded); the threshold filter and the
    supplier/nation dim decoration stream over the folded rows."""
    NS = n_shards()
    pnames = part_tbl["p_name"].to_pylist()
    pkeys = part_tbl["p_partkey"].to_numpy(zero_copy_only=False)
    promo = np.sort(np.asarray(
        [int(k) for k, nm in zip(pkeys, pnames)
         if nm is not None and nm.startswith(Q20_NAME_PREFIX)],
        dtype=np.int64))

    _P = pa.schema([("sshard", pa.int64()), ("sk", pa.int64()),
                    ("qty", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        pk = np.asarray(b["l_partkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        m = (d >= Q20_T0_US) & (d < Q20_T1_US) & _isin_sorted(promo, pk)
        if not m.any():
            return _P.empty_table()
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)[m]
        q = round_half_away_np(b["l_quantity"].to_numpy(
            zero_copy_only=False)[m])
        u, inv = np.unique(sk, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, q)
        return pa.Table.from_arrays(
            [pa.array((u % NS).astype(np.int64)), pa.array(u),
             pa.array(s)], schema=_P)

    nat = nation_tbl.to_pandas()
    nname = pd.Series(nat["n_name"].to_numpy(dtype=object),
                      index=nat["n_nationkey"].to_numpy())
    sup = supplier_tbl.to_pandas()
    sname = pd.Series(sup["s_name"].to_numpy(dtype=object),
                      index=sup["s_suppkey"].to_numpy())
    snat = pd.Series(sup["s_nationkey"].map(nname).to_numpy(dtype=object),
                     index=sup["s_suppkey"].to_numpy())

    _O = pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                    ("n_name", pa.string()), ("qty_units", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("sk", sort=False)["qty"].sum().reset_index()
        g = g[g["qty"] > Q20_QTY_GT]
        if len(g) == 0:
            return _O.empty_table()
        sk = g["sk"].to_numpy()
        return pa.Table.from_arrays(
            [pa.array(sk, pa.int64()),
             pa.array(pd.Series(sk).map(sname).to_numpy(dtype=object),
                      pa.string()),
             pa.array(pd.Series(sk).map(snat).to_numpy(dtype=object),
                      pa.string()),
             pa.array(g["qty"].to_numpy(), pa.int64())], schema=_O)

    return (lineitem_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("sshard").map_groups(fold, batch_format="pandas"))


def promo_part_suppliers_sql() -> str:
    return f"""
WITH q AS (
  SELECT l.l_suppkey AS s_suppkey,
         sum(CAST(round(l.l_quantity) AS BIGINT))::BIGINT AS qty_units
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '{Q20_NAME_PREFIX}%'
    AND epoch_us(l.l_shipdate) >= {Q20_T0_US}
    AND epoch_us(l.l_shipdate) < {Q20_T1_US}
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, n.n_name, q.qty_units
FROM q JOIN supplier s ON s.s_suppkey = q.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE q.qty_units > {Q20_QTY_GT}
"""
