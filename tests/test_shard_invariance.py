"""Shard-count invariance: the shard-fold exchange pattern (key % n_shards
-> per-shard C hash fold) derives its width from the cluster at
pipeline-build time (common.n_shards, VERDICT r3 #3).  The folds must be
pure routing — identical results at ANY shard count — so scaling the
cluster can never move a hash.  This pins every shard-fold-bearing family
at n_shards in {7, 256} against the default-64 result on sf0.001."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

# one representative per shard-fold site converted in round 4
SHARD_FOLD_QUERIES = [
    "sessions",             # events.py N_USER_SHARDS family (8 operators)
    "user_streaks",
    "big_orders",           # relational orderkey folds
    "top_supplier",
    "running_order_total",  # N_CUST_SHARDS ordered shards
    "graph_pagerank",       # per-round node fold
    "tile_pyramid",         # pages tile fold
    "url_canonical_dedup",  # N_CANON_SHARDS canon fold
    "dup_ngram_stats",      # gshard exchange
    "scrub_dup_ngrams",     # gshard + doc shard join
    "paragraph_dedup",      # phash fold
    "pack_sequences",       # ordered range shards (driver base fold)
    "quality_rank",         # composite range shards
    "tfidf_top_terms",      # doc-hash shard ranking
    "simhash_near_pairs",   # band-blocking shard routing
    "host_capped_pages",    # host-sharded grouped top-k (session 13)
    "near_dup_containment", # pair-shard verify routing (session 13)
    "minhash_estimate_pairs",  # pair-shard estimator routing (session 13)
    "frontier_priority",    # url-shard union anti-fold (session 13)
    "way_triangles",        # node/pivot/pair-shard triangle census (s14)
    "session_concurrency",  # bucket-shard rank queries (session 14)
    "events_profile",       # (col, value)-shard distinct fold (session 14)
    "surt_index",           # surt-shard capture fold (session 15)
    "fetch_schedule",       # host-shard politeness queue (session 15)
    "shared_node_candidates",  # node-bucket name fold (round 5: last % 64 swept)
    "host_distinct_kmv",    # site-shard KMV sketch fold (session 16)
]


def _run(name: str, sf: str) -> pd.DataFrame:
    import ray.data

    from osm_intersections_ray.queries import queries

    res = queries()[name](sf)
    df = res.to_pandas() if isinstance(res, ray.data.Dataset) else (
        res.to_pandas() if isinstance(res, pa.Table) else res)
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", SHARD_FOLD_QUERIES)
def test_shard_count_invariant(ray_session, monkeypatch, name):
    monkeypatch.delenv("OSMRAY_N_SHARDS", raising=False)
    base = _run(name, SF)
    assert len(base) > 0, f"{name}: vacuous at {SF}"
    for ns in (7, 256):
        monkeypatch.setenv("OSMRAY_N_SHARDS", str(ns))
        got = _run(name, SF)
        pd.testing.assert_frame_equal(got, base, check_exact=True), (name, ns)


def test_n_shards_derivation(ray_session, monkeypatch):
    from osm_intersections_ray.stages.common import n_shards

    monkeypatch.delenv("OSMRAY_N_SHARDS", raising=False)
    # local test cluster has 4 cpus -> floor dominates
    assert n_shards() == 64
    assert n_shards(32) == 32
    monkeypatch.setenv("OSMRAY_N_SHARDS", "7")
    assert n_shards() == 7


def test_way_bfs_sharded_route_shard_invariant(ray_session, monkeypatch):
    """way_bfs_hops' sharded route (broadcast_max=0 forces it) is pure
    routing: identical (way_id, hops) at any shard count."""
    import os

    import ray.data as rd

    from osm_intersections_ray.sources.synthetic import ensure_fixtures
    from osm_intersections_ray.stages.graph import way_bfs_hops

    fx = ensure_fixtures(SF)

    def run():
        ds = rd.read_parquet(os.path.join(fx, "ways.parquet"),
                             override_num_blocks=8)
        df = way_bfs_hops(ds, broadcast_max=0).to_pandas()
        return sorted(map(tuple, df[["way_id", "hops"]].to_numpy()))

    monkeypatch.delenv("OSMRAY_N_SHARDS", raising=False)
    base = run()
    assert base
    for ns in (7, 256):
        monkeypatch.setenv("OSMRAY_N_SHARDS", str(ns))
        assert run() == base, ns
