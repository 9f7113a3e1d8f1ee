"""Resumable partitioned output (SURVEY.md S2/S5: the reference's
skip-if-output-exists resume, js/downloadways.js:90-94, generalized).

Layout per run:

    out_dir/
      <partition>/part-*.parquet     (one directory per partition value)
      <partition>/_MANIFEST.json     {"partition", "rows", "schema"}
      _RUN.json                      run-level lineage + metrics

A partition directory is written to a temp dir and atomically renamed, with
the manifest written last — a crashed run leaves either nothing or a
complete partition, and a rerun skips every partition whose manifest exists.
This is what "resumable from per-partition checkpoints with lineage" means
for a batch engine (ray_guide "Sources & sinks")."""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import pyarrow as pa


def _manifest_path(out_dir: str, part: str) -> str:
    return os.path.join(out_dir, part, "_MANIFEST.json")


def completed_partitions(out_dir: str) -> set[str]:
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for name in os.listdir(out_dir):
        # '.'-prefixed names are in-flight temp dirs (a crash between the
        # manifest write and the atomic rename leaves one); they are NOT
        # completed partitions and a rerun must rewrite them
        if name.startswith("."):
            continue
        if os.path.exists(_manifest_path(out_dir, name)):
            done.add(name)
    return done


def restore_old_backups(out_dir: str) -> list[str]:
    """Recover ``.old.<part>`` swap backups left by a crash inside
    :func:`compact_partitioned`'s two-rename swap.  Between
    ``os.replace(pdir, old)`` and ``os.replace(tmp, pdir)`` the backup is
    the ONLY copy of the partition, so it must be restored — not swept —
    before any dot-prefixed-temp cleanup.  Restore if the target is
    missing; drop the backup if the target exists (swap completed)."""
    restored = []
    if not os.path.isdir(out_dir):
        return restored
    for name in os.listdir(out_dir):
        if not name.startswith(".old."):
            continue
        part = name[len(".old."):]
        src = os.path.join(out_dir, name)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(out_dir, part)
        if not os.path.exists(dst):
            os.replace(src, dst)
            restored.append(part)
        else:
            shutil.rmtree(src, ignore_errors=True)
    return restored


def clean_stale_temp_dirs(out_dir: str) -> list[str]:
    """Remove crash-leftover '.'-prefixed temp partition dirs.

    ``.old.<part>`` compaction backups are RESTORED first (see
    :func:`restore_old_backups`): under an incremental-append cadence the
    rows of a half-swapped partition exist nowhere else, so sweeping the
    backup with the temp dirs would be silent data loss — the rerun's
    input only carries the new increment, not the old partition."""
    restore_old_backups(out_dir)
    removed = []
    if not os.path.isdir(out_dir):
        return removed
    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name)
        if name.startswith(".") and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            removed.append(name)
    return removed


def write_partitioned(ds, out_dir: str, partition_col: str,
                      partition_values: list[str] | None = None) -> dict:
    """Write ``ds`` under ``out_dir`` split by ``partition_col``; skips
    partitions that already have a manifest.  Returns the run report.

    ONE streaming pass over the input (round 3 re-scanned the full dataset
    once per partition value — O(P) passes, 100+ at real county/tile
    cardinality; VERDICT r3 finding #2): rows of already-completed
    partitions are masked out, everything else goes through a single
    ``write_parquet(partition_cols=...)`` into a temp dir keyed by a
    filename-safe shadow column, and each partition subdir then gets its
    manifest and an atomic rename.  Crash contract unchanged: a crash
    during the write leaves only '.'-prefixed temp dirs (cleaned on rerun);
    a crash mid-rename leaves complete manifest-bearing partitions (skipped
    on rerun) plus the temp remainder.  The original partition column stays
    IN the data files (the shadow column is the one hive-dropped), so
    ``read_partitioned`` round-trips the full schema."""
    from ..functions.scalar import file_name_ize

    os.makedirs(out_dir, exist_ok=True)
    clean_stale_temp_dirs(out_dir)  # crash leftovers from a prior run
    done = completed_partitions(out_dir)
    report = {"started": time.time(), "partition_col": partition_col,
              "partitions": {}, "skipped": sorted(done)}
    keep_values = (None if partition_values is None
                   else {str(v) for v in partition_values})

    def mask_and_key(b: pa.Table) -> pa.Table:
        vals = b[partition_col].to_pylist()
        part = [file_name_ize(str(v)) for v in vals]
        m = [p not in done and (keep_values is None or str(v) in keep_values)
             for p, v in zip(part, vals)]
        t = b.append_column("__part", pa.array(part, pa.string()))
        return t.filter(pa.array(m, pa.bool_()))

    tmp = tempfile.mkdtemp(dir=out_dir, prefix=".run.")
    try:
        (ds.map_batches(mask_and_key, batch_format="pyarrow")
         .write_parquet(tmp, partition_cols=["__part"]))
        import pyarrow.parquet as pq

        for sub in sorted(os.listdir(tmp)):
            if not sub.startswith("__part="):
                continue
            part = sub.split("=", 1)[1]
            src = os.path.join(tmp, sub)
            rows = sum(pq.read_metadata(os.path.join(src, f)).num_rows
                       for f in os.listdir(src) if f.endswith(".parquet"))
            with open(os.path.join(src, "_MANIFEST.json"), "w") as f:
                json.dump({"partition": part, "rows": rows,
                           "written": time.time()}, f)
            final = os.path.join(out_dir, part)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.replace(src, final)
            report["partitions"][part] = rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    report["finished"] = time.time()
    with open(os.path.join(out_dir, "_RUN.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


CKPT_ROOT = "/tmp/osm_ray_ckpt"


def cached_dataset(key: str, make_ds, root: str = CKPT_ROOT):
    """Compute-once dataset checkpoint for intermediate stages shared by
    several pipelines (e.g. the MinHash band rows feeding candidate pairs,
    Jaccard verification AND survivor filtering — at scale re-running
    tokenization+MinHash per consumer doubles the dominant cost).

    First caller executes ``make_ds()`` and writes it to parquet under
    ``root/key`` (temp dir + manifest + atomic rename — same crash contract
    as :func:`write_partitioned`); every caller returns a ``read_parquet``
    Dataset over the checkpoint, so downstream lineage re-execution re-reads
    parquet instead of re-deriving the stage."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..functions.scalar import file_name_ize

    key = file_name_ize(key)
    final = os.path.join(root, key)

    def _read():
        paths = [os.path.join(final, f) for f in os.listdir(final)
                 if f.endswith(".parquet")]
        return rd.read_parquet(paths)

    if os.path.exists(os.path.join(final, "_MANIFEST.json")):
        return _read()
    os.makedirs(root, exist_ok=True)
    clean_stale_temp_dirs(root)
    tmp = tempfile.mkdtemp(dir=root, prefix=f".{key}.")
    try:
        out_ds = make_ds()
        out_ds.write_parquet(tmp)
        files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        if not files:  # empty dataset wrote no files: nothing to cache
            shutil.rmtree(tmp, ignore_errors=True)
            return out_ds
        rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows
                   for f in files)
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump({"key": key, "rows": rows, "written": time.time()}, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return _read()


def read_partitioned(out_dir: str, partitions: list[str] | None = None):
    """Read back completed partitions as one Dataset."""
    import ray.data as rd

    parts = sorted(completed_partitions(out_dir))
    if partitions is not None:
        parts = [p for p in parts if p in partitions]
    paths = []
    for p in parts:
        d = os.path.join(out_dir, p)
        paths.extend(os.path.join(d, f) for f in os.listdir(d)
                     if f.endswith(".parquet"))
    return rd.read_parquet(paths)


def compact_partitioned(out_dir: str, target_rows: int = 1_000_000,
                        min_files: int = 2) -> dict:
    """Small-files maintenance pass over a :func:`write_partitioned`
    output: partitions whose file count is >= ``min_files`` are rewritten
    as ceil(rows / target_rows) files, preserving row order (files
    concatenate in sorted name order — the order write_parquet emitted
    them).  100-TB context: every incremental ingest appends a few small
    files per partition; without compaction the NEXT reader pays
    per-file open cost forever.

    Same crash contract as the writer: each partition compacts into a
    '.'-prefixed temp dir (manifest written last, rows re-counted and
    verified against the old manifest before the swap) and lands with one
    atomic rename — a crash leaves either the old complete partition or
    the new one, never a mix.  Partitions are independent, so at cluster
    scale the loop body is one Ray task per partition; here it runs
    driver-side (the sandbox regime: partition count is small)."""
    import pyarrow.parquet as pq

    # recover a crash between the two swap renames below: '.old.X' holds a
    # complete partition; restore it if X is missing, drop it otherwise.
    # (write_partitioned's temp-dir sweep performs the SAME restore first —
    # see clean_stale_temp_dirs — so whichever maintenance pass runs next
    # after a crash, the backup is recovered, never deleted.)
    restore_old_backups(out_dir)
    # sweep stale '.compact.X' temp dirs from a crash mid-compaction (the
    # partition itself is intact in that window, so these are pure leftovers)
    if os.path.isdir(out_dir):
        for name in list(os.listdir(out_dir)):
            if name.startswith(".compact."):
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    report = {"started": time.time(), "compacted": {}, "skipped": []}
    for part in sorted(completed_partitions(out_dir)):
        pdir = os.path.join(out_dir, part)
        files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
        with open(_manifest_path(out_dir, part)) as f:
            manifest = json.load(f)
        if len(files) < min_files:
            report["skipped"].append(part)
            continue
        tbl = pa.concat_tables(
            [pq.read_table(os.path.join(pdir, f)) for f in files])
        if tbl.num_rows != manifest["rows"]:
            raise RuntimeError(
                f"partition {part}: manifest says {manifest['rows']} rows, "
                f"files hold {tbl.num_rows} — refusing to compact")
        tmp = tempfile.mkdtemp(dir=out_dir, prefix=f".compact.{part}.")
        try:
            n_out = max(1, -(-tbl.num_rows // target_rows))
            step = -(-tbl.num_rows // n_out)
            for i in range(n_out):
                pq.write_table(tbl.slice(i * step, step),
                               os.path.join(tmp, f"part-{i:05d}.parquet"))
            manifest["compacted"] = time.time()
            manifest["n_files"] = n_out
            with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
                json.dump(manifest, f)
            old = os.path.join(out_dir, f".old.{part}")
            os.replace(pdir, old)      # keep the old partition until the
            os.replace(tmp, pdir)      # new one is fully in place
            shutil.rmtree(old, ignore_errors=True)
            report["compacted"][part] = {"files_in": len(files),
                                         "files_out": n_out,
                                         "rows": tbl.num_rows}
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    report["finished"] = time.time()
    return report
