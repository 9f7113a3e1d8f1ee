"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive value comparison).  Usage:

    python tools/check_queries.py [name ...]

Cross-scale robustness sweep (the driver always compares at sf0.01; this
runs the SAME gate at another scale — both vars must point at the same dir
because oracle_sql() bakes fixture paths into its SQL):

    GRAFT_CHECK_SF=/root/testdata/sf0.001 \\
    GRAFT_ORACLE_SF=/root/testdata/sf0.001 python tools/check_queries.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("GRAFT_CHECK_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if len(df) == 0 and len(df.columns) == 0:
            # this Ray's to_pandas drops the schema of a 0-row dataset
            # even when Dataset.schema() knows it
            df = pd.DataFrame(columns=res.schema().names)
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(name: str, eng: pd.DataFrame, orc: pd.DataFrame) -> str:
    if len(eng) != len(orc):
        return f"ROWS {len(eng)} vs {len(orc)}"
    e, o = canon(eng), canon(orc)
    if list(e.columns) != list(o.columns):
        return f"SCHEMA {list(e.columns)} vs {list(o.columns)}"
    for c in e.columns:
        ec, oc = e[c], o[c]
        if np.issubdtype(ec.dtype, np.floating) or np.issubdtype(oc.dtype, np.floating):
            if not np.allclose(ec.astype(float), oc.astype(float), rtol=0, atol=0, equal_nan=True):
                bad = (ec.astype(float) != oc.astype(float)).to_numpy().nonzero()[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} {ec.iloc[bad].tolist()} vs {oc.iloc[bad].tolist()}"
        else:
            if not (ec.astype(str).to_numpy() == oc.astype(str).to_numpy()).all():
                bad = (ec.astype(str).to_numpy() != oc.astype(str).to_numpy()).nonzero()[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} {ec.iloc[bad].tolist()} vs {oc.iloc[bad].tolist()}"
    return "OK"


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    only = set(sys.argv[1:])
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            eng = to_df(fn(SF_DIR))
        except Exception as e:
            results[name] = f"ENGINE ERROR {type(e).__name__}: {e}"
            print(f"{name}: {results[name]}", flush=True)
            continue
        t1 = time.time()
        if name not in sqls:
            results[name] = f"rows-only: {len(eng)} rows ({t1-t0:.1f}s)"
            print(f"{name}: {results[name]}", flush=True)
            continue
        try:
            orc = con.sql(sqls[name]).df()
        except Exception as e:
            results[name] = f"SQL ERROR {type(e).__name__}: {e}"
            print(f"{name}: {results[name]}", flush=True)
            continue
        verdict = compare(name, eng, orc)
        results[name] = f"{verdict} ({len(eng)} rows, eng {t1-t0:.1f}s, sql {time.time()-t1:.1f}s)"
        print(f"{name}: {results[name]}", flush=True)

    bad = [n for n, v in results.items() if not (v.startswith("OK") or v.startswith("rows-only"))]
    print(f"\n{len(results) - len(bad)}/{len(results)} OK; failing: {bad}")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
