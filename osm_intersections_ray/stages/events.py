"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windowing; per the engine's design (ray_guide
"Streaming-shaped workloads") the events table is treated as an ordered,
partitioned log:

* tumbling windows: a vectorized per-batch PARTIAL aggregate (combiner)
  followed by a small ``groupby`` over (window, key) partials — the shuffle
  moves one row per (batch, window, key), not per event;
* sessionization: ``groupby(user).map_groups`` over ts-sorted groups.

Money/value sums are integer cents so no float accumulation order can touch
the correctness hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.scalar import round_half_away_np
from .common import n_shards
from .common import n_shards

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


# Pinned partial schema: pandas infers object/float dtypes on empty batches
# and Ray would log a spurious "RefBundle with a different schema" warning.
_HOURLY_PARTIAL_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("hour", pa.timestamp("us")),
    ("n", pa.int64()), ("sum_cents", pa.int64()),
])


def hourly_window(ds):
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_pandas()
        hour = ts.dt.floor("h").astype("datetime64[us]")
        cents = round_half_away_np(b["value"].to_numpy(zero_copy_only=False) * 100)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "hour": hour, "cents": cents})
        g = df.groupby(["event_type", "hour"], sort=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_HOURLY_PARTIAL_SCHEMA).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["event_type", "hour"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents")
    )


def hourly_window_sql(table: str = "events") -> str:
    return f"""
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM {table} GROUP BY 1, 2
"""


SLIDE_US = 15 * 60 * 1_000_000          # 15-minute slide
WIN_SLIDES = 4                           # 1-hour window = 4 slides
_SLIDING_PARTIAL_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("wstart", pa.timestamp("us")),
    ("n", pa.int64()), ("sum_cents", pa.int64()),
])


def sliding_window(ds):
    """Sliding 1-hour window, 15-minute slide: every event lands in exactly
    WIN_SLIDES windows (wstart = slide-aligned floor minus i slides).  Same
    partial-combine shape as :func:`hourly_window` — the per-batch partial
    emits one row per (event_type, wstart) so the shuffle moves
    O(batches x types x windows), never events."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].to_pandas().astype("int64").to_numpy()
        cents = round_half_away_np(b["value"].to_numpy(zero_copy_only=False) * 100)
        base = (ts_us // SLIDE_US) * SLIDE_US
        # aggregate EVENTS once per (type, slide-aligned base), THEN expand
        # the already-small histogram into its WIN_SLIDES shifted copies —
        # duplicate (type, wstart) rows across copies are fine, the global
        # groupby sums partials anyway
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "base": base, "cents": cents})
        g = df.groupby(["event_type", "base"], sort=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")).reset_index()
        frames = [g.assign(wstart_us=g["base"] - i * SLIDE_US)
                  for i in range(WIN_SLIDES)]
        out = pd.concat(frames, ignore_index=True)
        out["wstart"] = out.pop("wstart_us").to_numpy().astype("datetime64[us]")
        return pa.Table.from_pandas(
            out[["event_type", "wstart", "n", "sum_cents"]],
            preserve_index=False, schema=_SLIDING_PARTIAL_SCHEMA).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["event_type", "wstart"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents")
    )


def sliding_window_sql(table: str = "events") -> str:
    return f"""
SELECT event_type,
       make_timestamp((epoch_us(ts) // {SLIDE_US}) * {SLIDE_US}
                      - s.i * {SLIDE_US}) AS wstart,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM {table} CROSS JOIN generate_series(0, {WIN_SLIDES - 1}) s(i)
GROUP BY 1, 2
"""


# default shard floor — every operator derives its own via n_shards()
N_USER_SHARDS = 64


def sessionize(ds):
    """Sessions = maximal runs per user with gaps <= 30 min (ordered by
    (ts, event_id) for determinism).

    Sharded: the shuffle key is ``user_id % N_USER_SHARDS`` (not user_id —
    Ray's sort-aggregate pays ~40us of per-GROUP Python, pathological at
    user cardinality); each shard sorts once and assigns session boundaries
    with a vectorized cumulative scan, so per-user Python cost is zero."""
    N_USER_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3); captured into the closures below

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        # strip parquet-borne pandas metadata: Ray's schema dedup cannot
        # hash a schema whose metadata holds a dict, and mixed
        # (with/without-metadata) blocks defeat block coalescing
        return (b.replace_schema_metadata(None)
                .append_column("ushard", pa.array(shard)))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts_us = df["ts"].astype("int64").to_numpy()
        n = len(df)
        new = np.ones(n, dtype=bool)
        same_user = uid[1:] == uid[:-1]
        new[1:] = (~same_user) | ((ts_us[1:] - ts_us[:-1]) > SESSION_GAP_US)
        g = np.cumsum(new)
        user_start = np.ones(n, dtype=bool)
        user_start[1:] = ~same_user
        base = np.maximum.accumulate(np.where(user_start, g, 0))
        sid = g - base + 1
        out = pd.DataFrame({"user_id": uid, "session_idx": sid, "ts_us": ts_us})
        agg = out.groupby(["user_id", "session_idx"], sort=False).agg(
            n_events=("ts_us", "size"), start_us=("ts_us", "min"),
            end_us=("ts_us", "max")).reset_index()
        return pa.table({
            "user_id": pa.array(agg["user_id"].to_numpy(), pa.int64()),
            "session_idx": pa.array(agg["session_idx"].to_numpy(), pa.int64()),
            "n_events": pa.array(agg["n_events"].to_numpy(), pa.int64()),
            "start_ts": pa.array(agg["start_us"].to_numpy().astype("datetime64[us]")),
            "end_ts": pa.array(agg["end_us"].to_numpy().astype("datetime64[us]")),
        })

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas"))


def user_event_gaps(ds):
    """Per-user lag-window gap statistics: order each user's events by
    (ts, event_id), gap_i = ts_i - lag(ts)_i, and reduce to one row per user
    (n_events, n_gaps, max/sum gap in integer microseconds; -1 max for
    single-event users).  The classic window-function (lag) shape, expressed
    as the engine's sharded sort: shuffle key is ``user_id % N_USER_SHARDS``
    so Ray never pays per-GROUP Python at user cardinality; within a shard
    one stable sort + one vectorized diff covers every user."""
    N_USER_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3); captured into the closures below

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        # strip parquet-borne pandas metadata: Ray's schema dedup cannot
        # hash a schema whose metadata holds a dict, and mixed
        # (with/without-metadata) blocks defeat block coalescing
        return (b.replace_schema_metadata(None)
                .append_column("ushard", pa.array(shard)))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts_us = df["ts"].astype("int64").to_numpy()
        n = len(df)
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        same_user = uid[1:] == uid[:-1]
        gap[1:] = np.where(same_user, ts_us[1:] - ts_us[:-1], -1)
        has_gap = gap >= 0
        out = pd.DataFrame({
            "user_id": uid,
            "gap": np.where(has_gap, gap, 0),
            "is_gap": has_gap.astype(np.int64),
            "mx": gap,  # -1 sentinel ranks below any real gap
        })
        agg = out.groupby("user_id", sort=False).agg(
            n_events=("gap", "size"), n_gaps=("is_gap", "sum"),
            max_gap_us=("mx", "max"), sum_gap_us=("gap", "sum")).reset_index()
        return pa.table({
            "user_id": pa.array(agg["user_id"].to_numpy(), pa.int64()),
            "n_events": pa.array(agg["n_events"].to_numpy(), pa.int64()),
            "n_gaps": pa.array(agg["n_gaps"].to_numpy(), pa.int64()),
            "max_gap_us": pa.array(agg["max_gap_us"].to_numpy(), pa.int64()),
            "sum_gap_us": pa.array(agg["sum_gap_us"].to_numpy(), pa.int64()),
        })

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas"))


def user_event_gaps_sql(table: str = "events") -> str:
    return f"""
WITH o AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap
  FROM {table}
)
SELECT user_id, count(*)::BIGINT AS n_events,
       count(gap)::BIGINT AS n_gaps,
       coalesce(max(gap), -1)::BIGINT AS max_gap_us,
       coalesce(sum(gap), 0)::BIGINT AS sum_gap_us
FROM o GROUP BY 1
"""


ASOF_TYPE = "purchase"


def asof_prev_purchase(ds):
    """AS-OF join (self, backward): attach to every event the timestamp of
    the latest STRICTLY-PRIOR '{ASOF_TYPE}' event by the same user, ordered
    by (ts, event_id); -1 (microseconds sentinel) when none exists.

    Same partitioning as sessionize: shard on ``user_id % N_USER_SHARDS``,
    sort once per shard, then two C-speed grouped scans (shift + ffill) —
    the canonical backward as-of without a range join.  The partitioning
    assumption: one user's events fit one shard group (true by construction
    of the shard key)."""
    N_USER_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3); captured into the closures below

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        # strip parquet-borne pandas metadata: Ray's schema dedup cannot
        # hash a schema whose metadata holds a dict, and mixed
        # (with/without-metadata) blocks defeat block coalescing
        return (b.replace_schema_metadata(None)
                .append_column("ushard", pa.array(shard)))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = df["ts"].astype("int64")
        pts = ts_us.where(df["event_type"].to_numpy() == ASOF_TYPE)
        prev = pts.groupby(df["user_id"], sort=False).shift(1)
        prev = prev.groupby(df["user_id"], sort=False).ffill()
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
            "prev_purchase_us": pa.array(
                prev.fillna(-1).to_numpy().astype(np.int64)),
        })

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas"))


def asof_prev_purchase_sql(table: str = "events") -> str:
    return f"""
SELECT event_id,
       coalesce(epoch_us(
         last_value(CASE WHEN event_type = '{ASOF_TYPE}' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), -1)
         AS prev_purchase_us
FROM {table}
"""


def sessionize_sql(table: str = "events") -> str:
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM {table}
), m AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR (epoch_us(ts) - epoch_us(prev_ts)) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM o
), s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM m
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*)::BIGINT AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM s GROUP BY user_id, session_idx
"""


# --- interval (range) self-join: post-purchase activity window -------------
PP_WINDOW_US = 30 * 60 * 1_000_000  # 30 minutes


def post_purchase_window(ds):
    """Interval self-join: for every 'purchase' event, the count and
    integer-cents value sum of the same user's events STRICTLY after the
    purchase and within the next 30 minutes — the range-join shape
    (event x interval) that neither as-of nor fixed windows cover.

    Same partitioning as sessionize (``user_id % N_USER_SHARDS``: one
    user's events never straddle shards), then fully vectorized per shard:
    one sort, one composite-key ``np.searchsorted`` pair ((user, ts) as a
    structured array — lexicographic, no overflow-prone key packing) and a
    cumulative-sum difference.  No per-user Python loop; the per-group
    dispatch cost lands on N_USER_SHARDS groups."""
    N_USER_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3); captured into the closures below

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        return (b.replace_schema_metadata(None)
                .append_column("ushard", pa.array(shard)))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = df["user_id"].to_numpy(dtype=np.int64)
        ts_us = df["ts"].astype("int64").to_numpy()
        cents = round_half_away_np(df["value"].to_numpy() * 100)
        key = np.empty(len(u), dtype=[("u", np.int64), ("t", np.int64)])
        key["u"], key["t"] = u, ts_us
        anchor = df["event_type"].to_numpy() == ASOF_TYPE
        q_lo = key[anchor].copy()
        q_hi = q_lo.copy()
        q_hi["t"] = q_hi["t"] + PP_WINDOW_US
        lo = np.searchsorted(key, q_lo, side="right")
        hi = np.searchsorted(key, q_hi, side="right")
        cs = np.concatenate(([0], np.cumsum(cents, dtype=np.int64)))
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy()[anchor], pa.int64()),
            "n_follow": pa.array((hi - lo).astype(np.int64)),
            "cents_follow": pa.array(cs[hi] - cs[lo]),
        })

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas"))


def post_purchase_window_sql(table: str = "events") -> str:
    return f"""
SELECT p.event_id,
       count(e.event_id)::BIGINT AS n_follow,
       coalesce(sum(CAST(round(e.value * 100) AS BIGINT)), 0)::BIGINT AS cents_follow
FROM {table} p
LEFT JOIN {table} e
  ON e.user_id = p.user_id
 AND e.ts > p.ts
 AND epoch_us(e.ts) <= epoch_us(p.ts) + {PP_WINDOW_US}
WHERE p.event_type = '{ASOF_TYPE}'
GROUP BY p.event_id
"""


# --- ordered funnel analysis --------------------------------------------------
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_stages(ds):
    """Ordered-funnel analysis: for every user, the first 'view', the first
    'click' STRICTLY AFTER it, and the first 'purchase' strictly after that
    — the sequence-pattern query of product analytics (stage reached 0-3 +
    the three timestamps, -1 sentinels).

    Same sharded shape as sessionize: shuffle key ``user_id %
    N_USER_SHARDS``; within a shard each step is a filtered pandas
    groupby-min plus a merge (C kernels, no per-user Python).  Strict-> on
    the raw timestamp only (not event_id), so duplicate-ts events behave
    identically to the SQL oracle."""
    N_USER_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3); captured into the closures below

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        return (b.replace_schema_metadata(None)
                .append_column("ushard", pa.array(shard)))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        ts_us = df["ts"].astype("int64")
        f = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "event_type": df["event_type"].to_numpy(),
                          "ts_us": ts_us.to_numpy()})
        users = f[["user_id"]].drop_duplicates()
        prev = None
        outs = []
        for step in FUNNEL_STEPS:
            s = f[f["event_type"] == step]
            if prev is not None:
                s = s.merge(prev, on="user_id")
                s = s[s["ts_us"] > s["t_prev"]]
            t = (s.groupby("user_id", sort=False)["ts_us"].min()
                 .reset_index(name="t_prev"))
            outs.append(t)
            prev = t
        res = users
        for i, t in enumerate(outs, start=1):
            res = res.merge(t.rename(columns={"t_prev": f"t{i}_us"}),
                            on="user_id", how="left")
        stage = np.zeros(len(res), dtype=np.int64)
        for i in range(1, len(FUNNEL_STEPS) + 1):
            stage = np.where(res[f"t{i}_us"].notna(), i, stage)
        cols = {"user_id": pa.array(res["user_id"].to_numpy(), pa.int64()),
                "stage": pa.array(stage, pa.int64())}
        for i in range(1, len(FUNNEL_STEPS) + 1):
            cols[f"t{i}_us"] = pa.array(
                res[f"t{i}_us"].fillna(-1).to_numpy().astype(np.int64), pa.int64())
        return pa.table(cols)

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas"))


def funnel_stages_sql(table: str = "events") -> str:
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
WITH u AS (SELECT DISTINCT user_id FROM {table}),
f1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM {table}
       WHERE event_type = '{s1}' GROUP BY 1),
f2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM {table} e
       JOIN f1 USING (user_id)
       WHERE e.event_type = '{s2}' AND epoch_us(e.ts) > f1.t1 GROUP BY 1),
f3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM {table} e
       JOIN f2 USING (user_id)
       WHERE e.event_type = '{s3}' AND epoch_us(e.ts) > f2.t2 GROUP BY 1)
SELECT u.user_id,
       (CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS stage,
       coalesce(t1, -1)::BIGINT AS t1_us,
       coalesce(t2, -1)::BIGINT AS t2_us,
       coalesce(t3, -1)::BIGINT AS t3_us
FROM u LEFT JOIN f1 USING (user_id) LEFT JOIN f2 USING (user_id)
       LEFT JOIN f3 USING (user_id)
"""


# --- schema-on-read JSON extraction -------------------------------------------
# Explicit class, no \s / \d: Python re and DuckDB RE2 read it identically.
PROPS_K_PATTERN = '"k":[ ]*(-?[0-9]+)'
PROPS_BUCKET = 10

_PROPS_PARTIAL_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("k_bucket", pa.int64()),
    ("n", pa.int64()), ("sum_k", pa.int64()),
    ("min_k", pa.int64()), ("max_k", pa.int64()),
])


def props_kv_stats(ds):
    """Schema-on-read over the ``props`` JSON column: extract the integer
    ``k`` field (rows that don't match the shape are DROPPED on both sides),
    bucket by floor(k/10), and aggregate (n, sum, min, max) per
    (event_type, bucket).  Partial-combine: the per-batch pandas groupby is
    the combiner, so the shuffle carries one row per (batch, type, bucket)
    — never events."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        ser = b["props"].to_pandas()
        k = pd.to_numeric(ser.str.extract(PROPS_K_PATTERN, expand=False),
                          errors="coerce")
        m = k.notna().to_numpy()
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas()[m],
                           "k": k.to_numpy()[m].astype(np.int64)})
        # floor bucket (numpy // floors; the SQL uses floor() explicitly —
        # DuckDB's integer // truncates toward zero, probed on this build)
        df["k_bucket"] = df["k"].to_numpy() // PROPS_BUCKET
        g = df.groupby(["event_type", "k_bucket"], sort=False).agg(
            n=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max")).reset_index()
        return pa.Table.from_pandas(
            g[["event_type", "k_bucket", "n", "sum_k", "min_k", "max_k"]],
            preserve_index=False, schema=_PROPS_PARTIAL_SCHEMA).replace_schema_metadata(None)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "k_bucket"]).aggregate(
                Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"),
                Min("min_k", alias_name="min_k"), Max("max_k", alias_name="max_k")))


def props_kv_stats_sql(table: str = "events") -> str:
    return f"""
WITH x AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '{PROPS_K_PATTERN}', 1) AS BIGINT) AS k
  FROM {table}
)
SELECT event_type,
       CAST(floor(k / {PROPS_BUCKET}.0) AS BIGINT) AS k_bucket,
       count(*)::BIGINT AS n, sum(k)::BIGINT AS sum_k,
       min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k
FROM x WHERE k IS NOT NULL
GROUP BY 1, 2
"""


# --- retention cohort analysis -------------------------------------------------
DAY_US = 86_400_000_000


def retention_cohorts(ds):
    """Retention cohort matrix — the product-analytics staple: users grouped
    by their FIRST-activity day (the cohort), counted on every later day
    they were active, keyed by day offset.  Output one row per
    (cohort_day, day_offset) with the distinct-user count.

    Scale shape: ONE exchange keyed by ``user_id % N_USER_SHARDS`` (a user's
    whole history lands in one shard, so per-shard distinct-user counts are
    EXACT partials); within a shard everything is a pandas groupby-min +
    drop_duplicates (C kernels, no per-user Python).  The final
    (cohort_day, day_offset) groupby-sum moves only cohort-matrix-sized
    rows (days^2, never events)."""
    N_USER_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3); captured into the closures below
    from ray.data.aggregate import Sum

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        return (b.replace_schema_metadata(None)
                .append_column("ushard", pa.array(shard)))

    _PARTIAL = pa.schema([("cohort_day", pa.int64()),
                          ("day_offset", pa.int64()), ("n_users", pa.int64())])

    def per_shard(df: pd.DataFrame) -> pa.Table:
        day = (df["ts"].astype("int64") // DAY_US).to_numpy()
        f = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "day": day})
        f = f.drop_duplicates()  # (user, active day)
        cohort = f.groupby("user_id", sort=False)["day"].transform("min")
        g = (pd.DataFrame({"cohort_day": cohort.to_numpy(),
                           "day_offset": f["day"].to_numpy() - cohort.to_numpy()})
             .groupby(["cohort_day", "day_offset"], sort=False)
             .size().reset_index(name="n_users"))
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_PARTIAL).replace_schema_metadata(None)

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas")
            .groupby(["cohort_day", "day_offset"]).aggregate(
                Sum("n_users", alias_name="n_users")))


def retention_cohorts_sql(table: str = "events") -> str:
    return f"""
WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day
           FROM {table}),
c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
SELECT c.cohort::BIGINT AS cohort_day,
       (d.day - c.cohort)::BIGINT AS day_offset,
       count(*)::BIGINT AS n_users
FROM d JOIN c USING (user_id)
GROUP BY 1, 2
"""


# --- multi-granularity rollup (GROUPING SETS shape) ---------------------------
_ROLLUP_PARTIAL_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("day", pa.int64()),
    ("n", pa.int64()), ("sum_cents", pa.int64()),
])
ROLLUP_ALL = "(all)"  # marker for rolled-up event_type levels


def events_rollup(ds):
    """GROUP BY ROLLUP(event_type, day): the (type, day), (type), and
    grand-total rows of the daily revenue cube in one pass.

    Scale shape: events partial-combine per batch at the FINEST granularity
    only (one row per (batch, type, day)); one tiny groupby merges the
    partials; the coarser rollup levels are then derived from that finest
    aggregate, whose size is bounded by |event types| x |days| — a
    world-bounded table, not an event-bounded one — so folding it in a
    single block costs nothing at any corpus size.  Day is epoch days
    (int64); rolled-up levels carry day = -1 / event_type = '(all)'."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].to_pandas().astype("int64").to_numpy()
        day = ts_us // 86_400_000_000
        cents = round_half_away_np(b["value"].to_numpy(zero_copy_only=False) * 100)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "day": day, "cents": cents})
        g = df.groupby(["event_type", "day"], sort=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_ROLLUP_PARTIAL_SCHEMA
                                    ).replace_schema_metadata(None)

    finest = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "day"]).aggregate(
                  Sum("n", alias_name="n"),
                  Sum("sum_cents", alias_name="sum_cents")))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        lvl1 = (df.groupby("event_type", sort=False)
                .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum"))
                .reset_index())
        lvl1["day"] = np.int64(-1)
        total = pd.DataFrame({"event_type": [ROLLUP_ALL], "day": [np.int64(-1)],
                              "n": [df["n"].sum()],
                              "sum_cents": [df["sum_cents"].sum()]})
        out = pd.concat([df, lvl1, total], ignore_index=True)
        return out[["event_type", "day", "n", "sum_cents"]].astype(
            {"day": np.int64, "n": np.int64, "sum_cents": np.int64})

    # the finest aggregate is world-bounded small; one block folds the cube
    return finest.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)


def events_rollup_sql(table: str = "events") -> str:
    return f"""
SELECT CASE WHEN GROUPING(event_type) = 1 THEN '{ROLLUP_ALL}' ELSE event_type END
         AS event_type,
       CASE WHEN GROUPING(d) = 1 THEN -1 ELSE d END::BIGINT AS day,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS d, value FROM {table})
GROUP BY ROLLUP(event_type, d)
"""


# --- pivot / conditional aggregation (static column contract) ------------------
PIVOT_TYPES = ("view", "click", "purchase", "signup", "error")
_DAY_US = 86_400_000_000


def _day_trunc(ts_us: np.ndarray) -> np.ndarray:
    """epoch-us -> day index with DuckDB's truncate-toward-zero division
    (numpy // floors, which diverges on pre-1970 timestamps)."""
    ts_us = np.asarray(ts_us, dtype=np.int64)
    return np.where(ts_us < 0, -((-ts_us) // _DAY_US), ts_us // _DAY_US)


def events_pivot(ds):
    """Pivot (long -> wide conditional aggregation): per event DAY, one count
    column per known event type + purchase revenue cents.  The pivot contract
    is a STATIC column set — Arrow schemas can't depend on data — so unknown
    types fold into ``n_other`` (the scale-safe form of SQL PIVOT; a dynamic
    pivot would need a driver pass over distinct types first).

    Scale shape: per-batch (day x fixed columns) partials via vectorized
    type-indicator sums, one tiny (day) groupby bounded by distinct days."""
    from ray.data.aggregate import Sum

    from ..functions.scalar import round_half_away_np

    cols = [f"n_{t}" for t in PIVOT_TYPES] + ["n_other", "purchase_cents"]
    _P = pa.schema([("day", pa.int64())] +
                   [(c, pa.int64()) for c in cols])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = _day_trunc(ts_us)
        et = b["event_type"].to_pandas().to_numpy(dtype=object)
        cents = round_half_away_np(
            b["value"].to_numpy(zero_copy_only=False) * 100)
        u, inv = np.unique(day, return_inverse=True)
        arrs = [pa.array(u.astype(np.int64))]
        seen = np.zeros(day.size, dtype=bool)
        for t in PIVOT_TYPES:
            m = et == t
            seen |= m
            arrs.append(pa.array(np.bincount(
                inv[m], minlength=u.size).astype(np.int64)))
        arrs.append(pa.array(np.bincount(
            inv[~seen], minlength=u.size).astype(np.int64)))
        pm = et == "purchase"  # int64 add.at: exact at any scale (bincount
        s = np.zeros(u.size, dtype=np.int64)  # weights accumulate in float64)
        np.add.at(s, inv[pm], cents[pm])
        arrs.append(pa.array(s))
        return pa.Table.from_arrays(arrs, schema=_P)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day").aggregate(
                *[Sum(c, alias_name=c) for c in cols]))


def events_pivot_sql(table: str = "events") -> str:
    known = ", ".join(f"'{t}'" for t in PIVOT_TYPES)
    counts = ",\n       ".join(
        f"count(*) FILTER (WHERE event_type = '{t}')::BIGINT AS n_{t}"
        for t in PIVOT_TYPES)
    return f"""
SELECT (epoch_us(ts) // {_DAY_US})::BIGINT AS day,
       {counts},
       count(*) FILTER (WHERE event_type IS NULL
                           OR event_type NOT IN ({known}))::BIGINT AS n_other,
       coalesce(sum(CAST(round(value * 100) AS BIGINT))
                FILTER (WHERE event_type = 'purchase'), 0)::BIGINT AS purchase_cents
FROM {table} GROUP BY 1
"""


# --- gaps-and-islands: consecutive-day activity streaks ------------------------


def user_streaks(ds):
    """Per-user activity streaks over consecutive DAYS — the classic
    gaps-and-islands window shape (SQL: day - row_number() island key),
    expressed on the engine's sharded layout: shuffle key is
    ``user_id % N_USER_SHARDS`` so a user's whole history is shard-local;
    within a shard ONE pass builds distinct (user, day) pairs, breaks
    islands where the day step != 1, and reduces streak lengths per user —
    all vectorized (np.unique + cumsum island ids + bincount lengths).
    Returns (user_id, n_active_days, n_streaks, max_streak)."""
    N_USER_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3); captured into the closures below

    def add_shard(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ts_us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = _day_trunc(ts_us)
        # pre-dedupe (user, day) per batch: the exchange carries at most one
        # row per (batch, user, active day), never raw events
        pairs = np.unique(np.stack([uid, day], axis=1), axis=0)
        return pa.table({
            "ushard": pa.array((pairs[:, 0] % N_USER_SHARDS).astype(np.int64)),
            "user_id": pa.array(pairs[:, 0]),
            "day": pa.array(pairs[:, 1])})

    def per_shard(df: pd.DataFrame) -> pa.Table:
        pairs = np.unique(np.stack(
            [df["user_id"].to_numpy(dtype=np.int64),
             df["day"].to_numpy(dtype=np.int64)], axis=1), axis=0)
        uid, day = pairs[:, 0], pairs[:, 1]
        n = uid.size
        new_island = np.ones(n, dtype=bool)
        new_island[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        island = np.cumsum(new_island) - 1
        lengths = np.bincount(island).astype(np.int64)
        island_user = uid[new_island]
        g = (pd.DataFrame({"user_id": island_user, "len": lengths})
             .groupby("user_id", sort=False)
             .agg(n_active_days=("len", "sum"), n_streaks=("len", "size"),
                  max_streak=("len", "max")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False, schema=pa.schema([
            ("user_id", pa.int64()), ("n_active_days", pa.int64()),
            ("n_streaks", pa.int64()), ("max_streak", pa.int64()),
        ])).replace_schema_metadata(None)

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas"))


def user_streaks_sql(table: str = "events") -> str:
    return f"""
WITH d AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // {_DAY_US})::BIGINT AS day
  FROM {table}
), i AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
), s AS (
  SELECT user_id, grp, count(*)::BIGINT AS len FROM i GROUP BY 1, 2
)
SELECT user_id, sum(len)::BIGINT AS n_active_days,
       count(*)::BIGINT AS n_streaks, max(len)::BIGINT AS max_streak
FROM s GROUP BY 1
"""


# --- session co-occurrence (market-basket association) -------------------------


def session_cooccurrence(ds):
    """Market-basket association over sessions: for every unordered pair of
    event types, in how many (user, session) baskets do both occur — the
    support table association mining starts from.

    Scale shape: the sessionize shard layout (one user%64 exchange); each
    shard assigns session ids with the same vectorized cumulative scan,
    reduces to DISTINCT (user, session, type) rows, and builds pairs with
    one C-speed self-merge per shard (baskets hold at most |event types|
    distinct items, so the pair explosion is bounded at types² per
    basket); per-shard (type_a, type_b) partial counts feed a final
    groupby bounded by the type vocabulary."""
    N_USER_SHARDS = n_shards()  # cluster-derived (VERDICT r3 #3); captured into the closures below
    from ray.data.aggregate import Sum

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        return (b.replace_schema_metadata(None)
                .append_column("ushard", pa.array(shard)))

    _P = pa.schema([("type_a", pa.string()), ("type_b", pa.string()),
                    ("n_sessions", pa.int64())])

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts_us = df["ts"].astype("int64").to_numpy()
        n = len(df)
        new = np.ones(n, dtype=bool)
        same_user = uid[1:] == uid[:-1]
        new[1:] = (~same_user) | ((ts_us[1:] - ts_us[:-1]) > SESSION_GAP_US)
        g = np.cumsum(new)  # shard-global session id (user runs contiguous)
        d = (pd.DataFrame({"sid": g, "t": df["event_type"].to_numpy()})
             .drop_duplicates())
        p = d.merge(d, on="sid")
        p = p[p["t_x"] < p["t_y"]]
        out = (p.groupby(["t_x", "t_y"], sort=False).size()
               .reset_index(name="n_sessions")
               .rename(columns={"t_x": "type_a", "t_y": "type_b"}))
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=_P).replace_schema_metadata(None)

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas")
            .groupby(["type_a", "type_b"]).aggregate(
                Sum("n_sessions", alias_name="n_sessions")))


def session_cooccurrence_sql(table: str = "events") -> str:
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM {table}
), m AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN prev_ts IS NULL
                   OR (epoch_us(ts) - epoch_us(prev_ts)) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM o
), s AS (
  SELECT user_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM m
), d AS (
  SELECT DISTINCT user_id, session_idx, event_type FROM s
)
SELECT d1.event_type AS type_a, d2.event_type AS type_b,
       count(*)::BIGINT AS n_sessions
FROM d d1 JOIN d d2 USING (user_id, session_idx)
WHERE d1.event_type < d2.event_type
GROUP BY 1, 2
"""


# --- Markov transitions over per-user event sequences --------------------------


def event_transitions(ds):
    """Event-type transition counts (the first-order Markov matrix a
    behavioral model trains on): for every user, order events by
    (ts, event_id) and count each consecutive (prev_type, next_type) pair
    corpus-wide.

    Scale shape: the shuffle key is ``user_id % n_shards()`` so a user's
    whole history is shard-local (the sessionize layout; raw fixed-width
    rows — transitions are order-dependent, so nothing can pre-reduce
    below the exchange); each shard sorts once, shifts once, and emits
    per-pair partial counts.  The final merge folds a |types|^2-bounded
    table in one block (the events_rollup pattern), which also keeps NULL
    event types as real group keys — pandas ``dropna=False`` mirrors SQL
    GROUP BY; the first event per user drops by row-number (NOT by
    ``prev IS NULL``, which would also drop transitions out of a NULL-typed
    event)."""
    N_USER_SHARDS = n_shards()

    def add_shard(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        return pa.table({
            "ushard": pa.array((uid % N_USER_SHARDS).astype(np.int64)),
            "user_id": pa.array(uid),
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"]})

    _P = pa.schema([("prev_type", pa.string()), ("next_type", pa.string()),
                    ("n", pa.int64())])

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="stable").reset_index(drop=True)
        uid = df["user_id"].to_numpy(dtype=np.int64)
        same_user = np.zeros(len(df), dtype=bool)
        same_user[1:] = uid[1:] == uid[:-1]
        pairs = pd.DataFrame({
            "prev_type": df["event_type"].shift(1),
            "next_type": df["event_type"],
        })[same_user]
        g = (pairs.groupby(["prev_type", "next_type"], sort=False,
                           dropna=False).size().reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_P).replace_schema_metadata(None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["prev_type", "next_type"], sort=False,
                        dropna=False)["n"].sum().reset_index())
        return g.astype({"n": np.int64})

    # the pair table is |event types|^2-bounded — one block folds it
    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas")
            .repartition(1).map_batches(merge, batch_format="pandas",
                                        batch_size=None))


def event_transitions_sql(table: str = "events") -> str:
    return f"""
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER w AS prev_type,
         row_number() OVER w AS rn
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
FROM s WHERE rn > 1 GROUP BY 1, 2
"""


# --- daily active users (exact distinct count per day) --------------------------


def daily_active_users(ds):
    """DAU: per epoch day, the exact distinct-user count and the event
    count.  Per-batch combiner reduces to one row per (batch, day, user)
    before the exchange; the shuffle key is the DAY, so each shard's
    distinct fold is globally exact and final — no second pass.  Output is
    days-bounded."""
    N = n_shards()

    _P = pa.schema([("dshard", pa.int64()), ("day", pa.int64()),
                    ("user_id", pa.int64()), ("n", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = _day_trunc(ts_us)
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        g = (pd.DataFrame({"day": day, "user_id": uid})
             .groupby(["day", "user_id"], sort=False).size()
             .reset_index(name="n"))
        g.insert(0, "dshard", (g["day"].to_numpy() % N).astype(np.int64))
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_P).replace_schema_metadata(None)

    _O = pa.schema([("day", pa.int64()), ("n_users", pa.int64()),
                    ("n_events", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby("day", sort=False)
             .agg(n_users=("user_id", "nunique"), n_events=("n", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False,
                                    schema=_O).replace_schema_metadata(None)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("dshard").map_groups(fold, batch_format="pandas"))


def daily_active_users_sql(table: str = "events") -> str:
    return f"""
SELECT (epoch_us(ts) // {_DAY_US})::BIGINT AS day,
       count(DISTINCT user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_events
FROM {table} GROUP BY 1
"""


def late_arrivals(ds):
    """Out-of-order arrival accounting — the streaming-watermark health
    metric: walking each user's events in ARRIVAL order (event_id), an
    event is LATE iff some earlier-arriving event of the same user carries
    a larger timestamp; lateness = watermark - ts.  Reduces to one row per
    user (n_events, n_late, max lateness in integer microseconds).

    Scale shape: the standard user-sharded sort (user_id % n_shards
    shuffle key, one stable sort + vectorized grouped cummax/shift per
    shard) — never per-user Python."""
    N_USER_SHARDS = n_shards()  # cluster-derived

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        return (b.replace_schema_metadata(None)
                .append_column("ushard", pa.array(shard)))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "event_id"], kind="stable")
        t = df["ts"].astype("int64")
        g = df.groupby("user_id", sort=False)
        wm = t.groupby(df["user_id"], sort=False).cummax().groupby(
            df["user_id"], sort=False).shift(1)
        late = wm > t
        lateness = np.where(late, (wm - t).fillna(0).to_numpy(), 0).astype(
            np.int64)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                            "late": late.to_numpy().astype(np.int64),
                            "lateness": lateness})
        agg = out.groupby("user_id", sort=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_late_us=("lateness", "max")).reset_index()
        return pa.table({
            "user_id": pa.array(agg["user_id"].to_numpy(), pa.int64()),
            "n_events": pa.array(agg["n_events"].to_numpy(), pa.int64()),
            "n_late": pa.array(agg["n_late"].to_numpy(), pa.int64()),
            "max_late_us": pa.array(agg["max_late_us"].to_numpy(), pa.int64()),
        })

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("ushard").map_groups(per_shard, batch_format="pandas"))


def late_arrivals_sql(table: str = "events") -> str:
    return f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t,
         max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS wm
  FROM {table}
)
SELECT user_id, count(*)::BIGINT AS n_events,
       count(*) FILTER (WHERE wm > t)::BIGINT AS n_late,
       coalesce(max(CASE WHEN wm > t THEN wm - t END), 0)::BIGINT
           AS max_late_us
FROM o GROUP BY user_id
"""


# --- interval-overlap concurrency (distributed rank queries) ----------------
CONC_BUCKET_US = 3_600_000_000  # 1-hour rank buckets


def session_concurrency(ds):
    """For every session, how many OTHER sessions (any user) overlap it in
    time — closed intervals, touching counts: ``n_concurrent_i = |{j : j != i,
    start_j <= end_i, end_j >= start_i}|``.  The load/concurrency report a
    serving or crawl scheduler reads off a session table.

    The naive form is an all-pairs interval self-join (quadratic in peak
    hours).  This is instead the ORDER-STATISTICS decomposition: sessions
    never pair up at all, because

        n_concurrent_i = rank_starts(end_i) - rank_ends(start_i) - 1

    where rank_starts(v) = #{j : start_j <= v} and rank_ends(v) =
    #{j : end_j < start_i} — two rank queries against the global multisets
    of starts and ends.  Distributed exactly, scale-safely:

    1. sessionize (the standard user-sharded exchange), materialized once
       and streamed twice.
    2. a time-bucketed histogram (1-hour buckets) of start/end counts —
       output bounded by the corpus' time span, folded to exclusive
       cumulative bases on the driver and broadcast via ``ray.put``.
    3. ONE bucket-keyed exchange carrying 4 skinny rows per session (its
       start value, end value, and two rank queries routed to the bucket
       holding their answer's tail); each shard sorts its buckets' values
       once and answers its queries with ``searchsorted`` + the broadcast
       base.  Peak-hour skew is bounded by sessions-per-bucket; shrink
       CONC_BUCKET_US to split a hotter bucket.
    4. the two partial ranks (ends-rank negated) meet in a final
       (user, session) groupby-sum; n_concurrent = sum - 1 (self always
       matches).

    Exchange volume is O(sessions) rows of 6 int64s — never pairs, no
    global sort, nothing corpus-sized on the driver."""
    import ray
    from ray.data.aggregate import Sum

    from .common import cached_get

    NS = n_shards()  # cluster-derived; captured into the closures below
    sess = sessionize(ds).materialize()

    def hist(b: pa.Table) -> pa.Table:
        su = b["start_ts"].combine_chunks().cast(pa.int64()).to_numpy()
        eu = b["end_ts"].combine_chunks().cast(pa.int64()).to_numpy()
        sb, sc = np.unique(su // CONC_BUCKET_US, return_counts=True)
        eb, ec = np.unique(eu // CONC_BUCKET_US, return_counts=True)
        return pa.table({
            "bucket": pa.array(np.concatenate([sb, eb]), pa.int64()),
            "ns": pa.array(np.concatenate([sc, np.zeros(len(eb), np.int64)]),
                           pa.int64()),
            "ne": pa.array(np.concatenate([np.zeros(len(sb), np.int64), ec]),
                           pa.int64()),
        })

    hdf = (sess.map_batches(hist, batch_format="pyarrow")
           .groupby("bucket").aggregate(Sum("ns", alias_name="ns"),
                                        Sum("ne", alias_name="ne"))
           .to_pandas().sort_values("bucket"))
    bk = hdf["bucket"].to_numpy()
    ic_s = np.cumsum(hdf["ns"].to_numpy())  # inclusive starts per bucket
    ic_e = np.cumsum(hdf["ne"].to_numpy())
    bases_ref = ray.put((bk, ic_s, ic_e))

    def _base(bk_arr, ic, buckets):
        """#values in buckets strictly below each query bucket."""
        idx = np.searchsorted(bk_arr, buckets, side="left")
        return np.where(idx > 0, ic[np.maximum(idx - 1, 0)], 0)

    row_schema = pa.schema([("shard", pa.int64()), ("bucket", pa.int64()),
                            ("kind", pa.int8()), ("v", pa.int64()),
                            ("user_id", pa.int64()),
                            ("session_idx", pa.int64())])

    def emit(b: pa.Table) -> pa.Table:
        su = b["start_ts"].combine_chunks().cast(pa.int64()).to_numpy()
        eu = b["end_ts"].combine_chunks().cast(pa.int64()).to_numpy()
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
        sid = np.asarray(b["session_idx"].to_numpy(zero_copy_only=False))
        zero = np.zeros(len(su), np.int64)
        n = len(su)
        # kind 0: start value; 1: end value; 2: rank-starts query (at
        # bucket(end)); 3: rank-ends query (at bucket(start))
        bucket = np.concatenate([su // CONC_BUCKET_US, eu // CONC_BUCKET_US,
                                 eu // CONC_BUCKET_US, su // CONC_BUCKET_US])
        kind = np.repeat(np.array([0, 1, 2, 3], np.int8), n)
        v = np.concatenate([su, eu, eu, su])
        return pa.table({
            "shard": pa.array(bucket % NS),
            "bucket": pa.array(bucket),
            "kind": pa.array(kind),
            "v": pa.array(v),
            "user_id": pa.array(np.concatenate([zero, zero, uid, uid])),
            "session_idx": pa.array(np.concatenate([zero, zero, sid, sid])),
        }, schema=row_schema)

    part_schema = pa.schema([("user_id", pa.int64()),
                             ("session_idx", pa.int64()),
                             ("r", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        bk_arr, ic_sv, ic_ev = cached_get(bases_ref)
        df = df.sort_values(["bucket", "kind", "v"], kind="stable")
        bucket = df["bucket"].to_numpy()
        kind = df["kind"].to_numpy()
        v = df["v"].to_numpy()
        uid = df["user_id"].to_numpy()
        sid = df["session_idx"].to_numpy()
        out_u, out_s, out_r = [], [], []
        # loop over the shard's BUCKETS (bounded by the corpus time span /
        # NS), all row work inside is vectorized
        bstarts = np.ones(len(bucket), dtype=bool)
        bstarts[1:] = bucket[1:] != bucket[:-1]
        bpos = np.append(np.nonzero(bstarts)[0], len(bucket))
        for bi in range(len(bpos) - 1):
            lo, hi = bpos[bi], bpos[bi + 1]
            kb, vb = kind[lo:hi], v[lo:hi]
            starts = vb[kb == 0]  # sorted: sort key was (bucket, kind, v)
            ends = vb[kb == 1]
            bval = bucket[lo]
            q2 = kb == 2
            q3 = kb == 3
            if q2.any():
                base = _base(bk_arr, ic_sv, np.array([bval]))[0]
                r = base + np.searchsorted(starts, vb[q2], side="right")
                out_u.append(uid[lo:hi][q2])
                out_s.append(sid[lo:hi][q2])
                out_r.append(r.astype(np.int64))
            if q3.any():
                base = _base(bk_arr, ic_ev, np.array([bval]))[0]
                r = base + np.searchsorted(ends, vb[q3], side="left")
                out_u.append(uid[lo:hi][q3])
                out_s.append(sid[lo:hi][q3])
                out_r.append(-r.astype(np.int64))
        if not out_u:
            return part_schema.empty_table()
        return pa.table({"user_id": pa.array(np.concatenate(out_u)),
                         "session_idx": pa.array(np.concatenate(out_s)),
                         "r": pa.array(np.concatenate(out_r))},
                        schema=part_schema)

    parts = (sess.map_batches(emit, batch_format="pyarrow")
             .groupby("shard").map_groups(fold, batch_format="pandas"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "session_idx": b["session_idx"],
            "n_concurrent": pa.array(
                np.asarray(b["r"].to_numpy(zero_copy_only=False)) - 1,
                pa.int64()),
        })

    return (parts.groupby(["user_id", "session_idx"])
            .aggregate(Sum("r", alias_name="r"))
            .map_batches(finish, batch_format="pyarrow"))


def session_concurrency_sql(table: str = "events") -> str:
    return f"""
WITH s AS ({sessionize_sql(table)})
SELECT a.user_id, a.session_idx, (count(*) - 1)::BIGINT AS n_concurrent
FROM s a JOIN s b ON b.start_ts <= a.end_ts AND b.end_ts >= a.start_ts
GROUP BY a.user_id, a.session_idx
"""


# --- Trailing-window burst detection ----------------------------------------
_BURST_PARTIAL_SCHEMA = pa.schema([
    ("hour", pa.timestamp("us")), ("n", pa.int64()),
])


def hourly_burst(ds):
    """Streaming-health anomaly flags: an hour is a BURST iff its event
    count strictly exceeds 2x the max count over the trailing 24 wall-clock
    hours (RANGE frame [h-24h, h-1h], so calendar gaps shrink the window
    and a >24h quiet gap empties it -> NULL trail_max, never a burst).

    Scale shape: per-batch (hour, n) partials below one groupby; the hourly
    series is CALENDAR-bounded (8,760 rows/year regardless of input size),
    so the trailing-max window folds on the driver like
    session_concurrency's bucket histogram — nothing input-sized ever
    leaves the partial combine."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_pandas()
        hour = ts[ts.notna()].dt.floor("h").astype("datetime64[us]")
        g = hour.groupby(hour, sort=False).size()
        return pa.Table.from_pandas(
            pd.DataFrame({"hour": g.index, "n": g.to_numpy(np.int64)}),
            preserve_index=False,
            schema=_BURST_PARTIAL_SCHEMA).replace_schema_metadata(None)

    hourly = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("hour").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("hour", kind="stable"))
    hours = hourly["hour"].astype("datetime64[us]").astype("int64").to_numpy()
    n = hourly["n"].to_numpy(np.int64)
    H = 3_600_000_000
    lo = np.searchsorted(hours, hours - 24 * H, side="left")
    hi = np.searchsorted(hours, hours - H, side="right")
    trail = np.zeros(len(n), dtype=np.int64)
    has = hi > lo
    for i in np.nonzero(has)[0]:  # calendar-bounded rows (<=8760/year)
        trail[i] = n[lo[i]:hi[i]].max()
    burst = (n > 2 * trail).astype(np.int64)
    return pa.table({
        "hour": pa.array(hourly["hour"].to_numpy().astype("datetime64[us]")),
        "n": pa.array(n),
        "trail_max": pa.array(trail, mask=~has),
        "burst": pa.array(burst, mask=~has),
    })


def hourly_burst_sql(table: str = "events") -> str:
    win = ("OVER (ORDER BY hour RANGE BETWEEN INTERVAL 24 HOURS PRECEDING "
           "AND INTERVAL 1 HOUR PRECEDING)")
    return f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, count(*)::BIGINT AS n
  FROM {table} WHERE ts IS NOT NULL GROUP BY 1
)
SELECT hour, n,
       CAST(max(n) {win} AS BIGINT) AS trail_max,
       CAST(n > 2 * max(n) {win} AS BIGINT) AS burst
FROM h
"""


# --- Filter-pushdown tail-window counts ---------------------------------------
RECENT_CUTOFF = "2024-01-24 00:00:00"  # last week of the fixture window


def recent_type_counts(ds):
    """Counts per event type over the trailing window, with the time
    predicate pushed INTO the parquet read (see the queries.py
    registration: ray.data.read_parquet(filter=...) skips whole row
    groups by their ts min/max stats before any byte decodes — at 100 TB
    of time-partitioned events the read touches only the tail files).
    The kernel itself is the standard per-batch partial below one tiny
    groupby; the belt-and-suspenders mask keeps the kernel correct under
    readers that cannot push the filter."""
    from ray.data.aggregate import Sum

    cutoff = np.datetime64(RECENT_CUTOFF.replace(" ", "T"), "us")

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_pandas()
        m = (ts >= pd.Timestamp(cutoff)).to_numpy()
        et = b["event_type"].to_pandas()[m]
        # dropna=False: a NULL event_type is a group, matching the SQL
        # oracle's GROUP BY (which emits a NULL row) — ADVICE r4
        g = et.groupby(et, sort=False, dropna=False).size()
        keys = [None if pd.isna(k) else k for k in g.index]
        return pa.table({"event_type": pa.array(keys, pa.string()),
                         "n": pa.array(g.to_numpy(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").aggregate(Sum("n", alias_name="n")))


def recent_type_counts_sql(table: str = "events") -> str:
    return f"""
SELECT event_type, count(*)::BIGINT AS n
FROM {table} WHERE ts >= TIMESTAMP '{RECENT_CUTOFF}'
GROUP BY 1
"""
