"""CSV.gz source — the interchange format every pipeline eventually meets,
next to the WARC.gz and JSONL.gz ingests.

Scale shape mirrors the other two: MANY .csv.gz shard files,
``read_binary_files`` gives one file per ingest task, and the parse is
pyarrow's vectorized C++ CSV reader (``pyarrow.csv.read_csv`` with
``newlines_in_values`` — RFC-4180 quoted fields may contain commas, quotes
AND newlines).  Only the typed projection leaves the ingest stage.

Exactness contract: the fixture writer emits timestamps as epoch-us int64
and floats via Python ``repr`` (shortest round-trip form), so the strtod
parse reconstructs every double BIT-FOR-BIT and the engine output matches a
plain SQL projection of events.parquet hash-exactly — including
``length(props)``, which only survives if quoting/escaping round-trips.
"""

from __future__ import annotations

import csv
import gzip
import io
import os
import shutil
import tempfile

import pyarrow as pa

N_CSV_FILES = 8


def write_csv_gz(tbl: pa.Table, out_dir: str) -> None:
    """Shard an events table into ``N_CSV_FILES`` .csv.gz files (row
    round-robin by position)."""
    os.makedirs(out_dir, exist_ok=True)
    eid = tbl["event_id"].to_pylist()
    ts = tbl["ts"].cast(pa.int64()).to_pylist()  # epoch-us
    uid = tbl["user_id"].to_pylist()
    et = tbl["event_type"].to_pylist()
    val = tbl["value"].to_pylist()
    props = tbl["props"].to_pylist()
    bufs = [io.StringIO() for _ in range(N_CSV_FILES)]
    writers = [csv.writer(b, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
               for b in bufs]
    for w in writers:
        w.writerow(["event_id", "ts_us", "user_id", "event_type", "value",
                    "props"])
    for i in range(len(eid)):
        writers[i % N_CSV_FILES].writerow(
            [eid[i], ts[i], uid[i], et[i], repr(float(val[i])), props[i]])
    for si, b in enumerate(bufs):
        path = os.path.join(out_dir, f"part-{si:04d}.csv.gz")
        with gzip.open(path, "wb", compresslevel=1) as f:
            f.write(b.getvalue().encode("utf-8"))


def ensure_csv(sf_dir: str) -> str:
    """Generate (once, cached, atomic) the .csv.gz fixture shards derived
    from the driver's events.parquet for this scale factor."""
    import pyarrow.parquet as pq

    from .synthetic import FIXTURE_ROOT, scale_from_sf_dir

    label, _, _ = scale_from_sf_dir(sf_dir)
    out_dir = os.path.join(FIXTURE_ROOT, f"{label}_csv")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=FIXTURE_ROOT, prefix=f".{label}_csv.")
    try:
        write_csv_gz(pq.read_table(os.path.join(sf_dir, "events.parquet")),
                     tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        if not os.path.exists(out_dir):
            os.replace(tmp, out_dir)
        else:
            shutil.rmtree(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


_CSV_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("user_id", pa.int64()),
    ("ts_us", pa.int64()), ("event_type", pa.string()),
    ("value_cents", pa.int64()), ("props_chars", pa.int64())])


def read_csv_events(csv_dir: str):
    """Ray Dataset over .csv.gz shards: typed projection
    (event_id, user_id, ts_us, event_type, value_cents, props_chars)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.csv as pcsv
    import ray.data as rd

    from ..functions.scalar import round_half_away_np

    ds = rd.read_binary_files(csv_dir, file_extensions=["gz"])

    conv = pcsv.ConvertOptions(column_types={
        "event_id": pa.int64(), "ts_us": pa.int64(), "user_id": pa.int64(),
        "event_type": pa.string(), "value": pa.float64(),
        "props": pa.string()})
    parse = pcsv.ParseOptions(newlines_in_values=True)

    def col(t: pa.Table, name: str, typ: pa.DataType):
        # schema-drift tolerance (same contract as the JSONL source): a
        # shard from an older producer that lacks a column parses with
        # NULLs instead of killing the ingest job
        if name in t.column_names:
            return t[name].combine_chunks().cast(typ)
        return pa.nulls(t.num_rows, typ)

    def parse_files(b: pa.Table) -> pa.Table:
        outs = []
        for blob in b["bytes"].to_pylist():
            raw = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
            t = pcsv.read_csv(io.BytesIO(raw), parse_options=parse,
                              convert_options=conv)
            val = col(t, "value", pa.float64()).to_numpy(zero_copy_only=False)
            ok = np.isfinite(val)
            cents = np.zeros(len(val), dtype=np.int64)
            cents[ok] = round_half_away_np(val[ok] * 100)
            outs.append(pa.Table.from_arrays([
                col(t, "event_id", pa.int64()),
                col(t, "user_id", pa.int64()),
                col(t, "ts_us", pa.int64()),
                col(t, "event_type", pa.string()),
                pa.array(cents, mask=~ok),
                pc.utf8_length(col(t, "props", pa.string())).cast(pa.int64()),
            ], schema=_CSV_SCHEMA))
        return (pa.concat_tables(outs) if outs
                else _CSV_SCHEMA.empty_table())

    return ds.map_batches(parse_files, batch_format="pyarrow", batch_size=1)


def csv_events_sql(events_tbl_expr: str) -> str:
    """Oracle: the same typed projection straight off events.parquet."""
    return f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents,
       length(props)::BIGINT AS props_chars
FROM {events_tbl_expr}
"""
