"""JSONL.gz source — the WET/WAT-style sidecar format next to WARC: one
JSON object per line, gzip-compressed shards.

Scale shape mirrors the WARC reader: MANY .jsonl.gz files (one per shard),
``read_binary_files`` gives one file per ingest task, and the parse is
pyarrow's vectorized C++ NDJSON reader (``pyarrow.json.read_json``) — no
per-line Python json.loads on the hot path.  Only the metadata projection
(url, ts, lang, n_chars) leaves the ingest stage; the text bodies stay in
the task.

The fixture writer derives the shards FROM the pages fixture table, so the
whole path (encode -> gzip -> vectorized parse -> rows) is verified
hash-exact against a plain SQL projection of pages.parquet.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import tempfile

import pyarrow as pa

N_JSONL_FILES = 8


def write_jsonl_gz(tbl: pa.Table, out_dir: str) -> None:
    """Shard a pages table into ``N_JSONL_FILES`` .jsonl.gz files (row
    round-robin by position so every shard sees every size class)."""
    os.makedirs(out_dir, exist_ok=True)
    urls = tbl["url"].to_pylist()
    ts = tbl["warc_ts"].cast(pa.int64()).to_pylist()  # epoch-us
    langs = tbl["lang"].to_pylist()
    texts = tbl["text"].to_pylist()
    shards = [[] for _ in range(N_JSONL_FILES)]
    for i, (u, t, lg, tx) in enumerate(zip(urls, ts, langs, texts)):
        shards[i % N_JSONL_FILES].append(json.dumps(
            {"url": u, "ts": int(t), "lang": lg, "text": tx},
            ensure_ascii=False, separators=(",", ":")))
    for si, lines in enumerate(shards):
        path = os.path.join(out_dir, f"part-{si:04d}.jsonl.gz")
        with gzip.open(path, "wb", compresslevel=1) as f:
            f.write(("\n".join(lines) + "\n").encode("utf-8"))


def ensure_jsonl(sf_dir: str) -> str:
    """Generate (once, cached, atomic) the .jsonl.gz fixture shards derived
    from the pages fixture for this scale factor."""
    import pyarrow.parquet as pq

    from .synthetic import FIXTURE_ROOT, ensure_fixtures, scale_from_sf_dir

    fx = ensure_fixtures(sf_dir)
    label, _, _ = scale_from_sf_dir(sf_dir)
    out_dir = os.path.join(FIXTURE_ROOT, f"{label}_jsonl")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp = tempfile.mkdtemp(dir=FIXTURE_ROOT, prefix=f".{label}_jsonl.")
    try:
        write_jsonl_gz(pq.read_table(os.path.join(fx, "pages.parquet"),
                                     columns=["url", "warc_ts", "lang", "text"]),
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


def read_jsonl_pages(jsonl_dir: str):
    """Ray Dataset over .jsonl.gz shards: (url, ts_us, lang, n_chars) per
    line, parsed by pyarrow's vectorized NDJSON reader per file."""
    import io

    import pyarrow.compute as pc
    import pyarrow.json as pj
    import ray.data as rd

    ds = rd.read_binary_files(jsonl_dir, file_extensions=["gz"])

    def col(t: pa.Table, name: str, typ: pa.DataType):
        # schema-drift tolerance: a shard written by an older producer may
        # lack a column entirely (pyarrow already NULL-fills rows that
        # merely omit the key); unknown extra keys are simply not projected
        if name in t.column_names:
            return t[name].combine_chunks().cast(typ)
        return pa.nulls(t.num_rows, typ)

    def parse(b: pa.Table) -> pa.Table:
        outs = []
        for blob in b["bytes"].to_pylist():
            # Arrow's filesystem layer auto-decompresses by .gz extension in
            # read_binary_files; keep the magic check so the parse also
            # accepts raw member bytes (e.g. from a plain object store)
            raw = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
            t = pj.read_json(io.BytesIO(raw))
            outs.append(pa.table({
                "url": col(t, "url", pa.string()),
                "ts_us": col(t, "ts", pa.int64()),
                "lang": col(t, "lang", pa.string()),
                "n_chars": pc.utf8_length(
                    col(t, "text", pa.string())).cast(pa.int64()),
            }))
        return pa.concat_tables(outs) if outs else pa.table(
            {"url": pa.array([], pa.string()),
             "ts_us": pa.array([], pa.int64()),
             "lang": pa.array([], pa.string()),
             "n_chars": pa.array([], pa.int64())})

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


def jsonl_pages_sql(pages_tbl_expr: str) -> str:
    """Oracle: the same projection straight off pages.parquet."""
    return f"""
SELECT url, epoch_us(warc_ts) AS ts_us, lang, length(text)::BIGINT AS n_chars
FROM {pages_tbl_expr}
"""
