"""Round-5 verification-reach tests (VERDICT r4 punch list):

* the ``ray job submit`` entry path (job.main) end-to-end at sf0.001 —
  partitioned write + metrics/lineage, second run skips every partition,
  compaction maintenance pass over the output (#5);
* the ADVICE r4 medium fix: '.old.<part>' compaction backups are RESTORED
  (not swept) by clean_stale_temp_dirs / write_partitioned, so a crash
  inside compact's two-rename swap can never lose the only copy;
* _tbl multi-file safety: a sharded table directory reads with >=
  file-count blocks — the single-file 64-block cap never throttles it (#3);
* the write_geojson row cap (#4) and the knn_graph broadcast cap (#7).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_job_main_end_to_end_and_resume(ray_session, tmp_path):
    from osm_intersections_ray.job import main
    from osm_intersections_ray.state.checkpoint import (
        compact_partitioned,
        completed_partitions,
        read_partitioned,
    )

    out = str(tmp_path / "job_out")
    report = main(["--sf-dir", SF, "--out", out])
    parts = report["intersections"]["partitions"]
    assert parts and all(n > 0 for n in parts.values())
    assert report["intersections"]["skipped"] == []
    assert os.path.exists(os.path.join(out, "metrics.json"))
    with open(os.path.join(out, "metrics.json")) as f:
        metrics = json.load(f)
    assert {s["stage"] for s in metrics["stages"]} >= {
        "intersections", "pages_way_join"}
    n_rows = read_partitioned(os.path.join(out, "intersections")).count()
    assert n_rows == sum(parts.values())

    # resume: second run skips every completed partition, rewrites none
    report2 = main(["--sf-dir", SF, "--out", out])
    assert report2["intersections"]["partitions"] == {}
    assert sorted(report2["intersections"]["skipped"]) == sorted(parts)

    # maintenance pass runs clean over the job output and preserves rows
    idir = os.path.join(out, "intersections")
    compact_partitioned(idir, target_rows=10_000)
    assert completed_partitions(idir) == set(parts)
    assert read_partitioned(idir).count() == n_rows


def test_old_backup_restored_not_swept(tmp_path):
    """ADVICE r4 (medium): crash between compact's two renames leaves
    '.old.<part>' as the ONLY copy; the temp-dir sweep must restore it."""
    from osm_intersections_ray.state.checkpoint import (
        clean_stale_temp_dirs,
        completed_partitions,
    )

    out = str(tmp_path / "out")
    # simulate the crash window: partition dir gone, backup present
    bdir = os.path.join(out, ".old.a")
    os.makedirs(bdir)
    pq.write_table(pa.table({"x": [1, 2, 3]}), os.path.join(bdir, "p.parquet"))
    with open(os.path.join(bdir, "_MANIFEST.json"), "w") as f:
        json.dump({"partition": "a", "rows": 3}, f)
    # plus a genuine stale temp dir that SHOULD be swept
    os.makedirs(os.path.join(out, ".run.junk"))

    removed = clean_stale_temp_dirs(out)
    assert completed_partitions(out) == {"a"}
    assert pq.read_table(os.path.join(out, "a", "p.parquet")).num_rows == 3
    assert ".run.junk" in removed and ".old.a" not in removed

    # swap-completed case: target exists -> backup is dropped, target kept
    bdir2 = os.path.join(out, ".old.a")
    os.makedirs(bdir2)
    pq.write_table(pa.table({"x": [9]}), os.path.join(bdir2, "stale.parquet"))
    clean_stale_temp_dirs(out)
    assert not os.path.exists(bdir2)
    assert pq.read_table(os.path.join(out, "a", "p.parquet")).num_rows == 3


def test_compact_sweeps_stale_compact_dirs(ray_session, tmp_path):
    import ray.data as rd

    from osm_intersections_ray.state.checkpoint import (
        compact_partitioned,
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "out")
    ds = rd.from_arrow(pa.table({"part": ["a"] * 6, "x": list(range(6))}))
    write_partitioned(ds, out, "part")
    stale = os.path.join(out, ".compact.a.dead")
    os.makedirs(stale)
    compact_partitioned(out, target_rows=2)
    assert not os.path.exists(stale)
    assert read_partitioned(out).count() == 6


def test_tbl_multifile_not_throttled(ray_session, tmp_path):
    """VERDICT r4 nit #2: the single-file 64-block override must not apply
    to a sharded table — a directory of N files reads as >= N blocks."""
    from osm_intersections_ray.queries import _tbl

    sf_dir = str(tmp_path)
    d = os.path.join(sf_dir, "documents.parquet")
    os.makedirs(d)
    n_files = 5
    for i in range(n_files):
        pq.write_table(
            pa.table({"doc_id": list(range(i * 10, (i + 1) * 10)),
                      "text": [f"doc {j}" for j in range(10)]}),
            os.path.join(d, f"part-{i:03d}.parquet"))
    ds = _tbl(sf_dir, "documents", ["doc_id", "text"]).materialize()
    assert ds.count() == n_files * 10
    assert ds.num_blocks() >= n_files


def test_write_geojson_row_cap(ray_session, tmp_path):
    from osm_intersections_ray.sinks import write_geojson

    rows = [{"node_id_kind": "node", "node_id": 1, "lat": 1.0, "lon": 2.0,
             "streets": ["A", "B"], "way_ids": [1, 2], "city": "X"}] * 5
    p = str(tmp_path / "out.geojson")
    assert write_geojson(rows, p) == 5  # conformance path still writes
    with pytest.raises(ValueError, match="write_partitioned"):
        write_geojson(rows, p, max_rows=3)

    import ray.data as rd

    ds = rd.from_items(rows)
    with pytest.raises(ValueError):
        write_geojson(ds, p, max_rows=3)


def test_knn_graph_chunked_matches_brute(ray_session):
    """The chunked exact graph (round 5: bounded object-store chunks, no
    full-matrix broadcast) must be row-identical to the broadcast brute
    form at any chunking."""
    import pandas as pd
    import pyarrow.parquet as pq_

    import ray
    import ray.data as rd

    from osm_intersections_ray.stages import similarity

    emb = pq_.read_table("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = rd.from_arrow(emb.replace_schema_metadata(None))

    def norm(res):
        df = res.to_pandas().sort_values(["vec_id", "rk"]).reset_index(drop=True)
        return df

    brute = norm(similarity.knn_graph(ds, ray.put(similarity.load_db(emb))))
    assert len(brute) > 0
    for n_chunks in (1, 3, 7):
        refs = similarity.load_db_chunks(emb, n_chunks=n_chunks)
        got = norm(similarity.knn_graph_chunked(ds, refs))
        pd.testing.assert_frame_equal(got, brute, check_exact=True), n_chunks


def test_knn_graph_broadcast_cap():
    import numpy as np

    from osm_intersections_ray.stages import similarity

    tbl = pa.table({
        "vec_id": pa.array(np.arange(4), pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * 4,
                              pa.list_(pa.float32())),
    })
    assert similarity.load_db(tbl)["mat"].shape == (4, 2)
    old = similarity.MAX_KNN_GRAPH_BROADCAST_BYTES
    try:
        similarity.MAX_KNN_GRAPH_BROADCAST_BYTES = 16
        with pytest.raises(ValueError, match="ann_bucketed"):
            similarity.load_db(tbl)
    finally:
        similarity.MAX_KNN_GRAPH_BROADCAST_BYTES = old
