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
                                    schema=_HOURLY_PARTIAL_SCHEMA)

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
            preserve_index=False, schema=_SLIDING_PARTIAL_SCHEMA)

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


N_USER_SHARDS = 64


def sessionize(ds):
    """Sessions = maximal runs per user with gaps <= 30 min (ordered by
    (ts, event_id) for determinism).

    Sharded: the shuffle key is ``user_id % N_USER_SHARDS`` (not user_id —
    Ray's sort-aggregate pays ~40us of per-GROUP Python, pathological at
    user cardinality); each shard sorts once and assigns session boundaries
    with a vectorized cumulative scan, so per-user Python cost is zero."""

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        return b.append_column("ushard", pa.array(shard))

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

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
                 % N_USER_SHARDS).astype(np.int64)
        return b.append_column("ushard", pa.array(shard))

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
