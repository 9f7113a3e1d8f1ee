"""Edge-case probes: queries vs their DuckDB oracles over tiny adversarial
tables, mirroring the driver's comparison (sorted columns, order-insensitive
rows, exact values).

* documents: empty text, all-whitespace, leading tab, <3 tokens, unicode
  letters, exact + near duplicates;
* events: single-event user, gap exactly == / just over the session
  threshold, duplicate timestamps, negative + half-cent values, hour
  boundaries;
* embeddings: zero vectors (DuckDB cosine = -1.0), exact-duplicate vectors
  (tie-break by id), opposite + orthogonal + tiny-magnitude vectors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EDGE_TEXTS = [
    "\tleading tab then words here",
    "",
    "   \t\n  ",
    "two tokens",
    "Ünïcødé lettèrs überall änd ça va très bien aujourd'hui mes amis",
    "the quick brown fox jumps over the lazy dog again and again and again",
    "the quick brown fox jumps over the lazy dog again and again and AGAIN",
    "the quick brown fox jumps over the lazy dog again and again and again",
    "punctuation!!! ??? ;;; ::: ,,, ... --- === +++ *** @@@ ###",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
]

DOC_QUERIES = [
    "doc_stats", "lang_id", "quality_score", "fingerprint",
    "exact_dedup", "simhash", "bpe_token_count",
    "minhash_lsh_pairs", "near_dup_jaccard", "near_dedup_survivors",
    "image_decode_ppm", "audio_decode_wav",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_docs")
    tbl = pa.table({
        "doc_id": pa.array(range(len(EDGE_TEXTS)), pa.int64()),
        "text": pa.array(EDGE_TEXTS, pa.string()),
        "lang": pa.array(["xx"] * len(EDGE_TEXTS), pa.string()),
        "source": pa.array(["edge"] * len(EDGE_TEXTS), pa.string()),
        "n_chars": pa.array([len(t) for t in EDGE_TEXTS], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _compare(ray_session, sf_dir: str, view: str, name: str):
    import duckdb

    import ray.data

    from osm_intersections_ray.queries import oracle_sql, queries

    res = queries()[name](sf_dir)
    eng = res.to_pandas() if isinstance(res, ray.data.Dataset) else (
        res.to_pandas() if isinstance(res, pa.Table) else res)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW {view} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{view}.parquet')")
    orc = con.sql(oracle_sql()[name]).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o), f"{name}: rows {len(e)} vs {len(o)}\n{e}\n{o}"
    assert list(e.columns) == list(o.columns), f"{name}: schema {list(e.columns)} vs {list(o.columns)}"
    for c in e.columns:
        if np.issubdtype(e[c].dtype, np.floating) or np.issubdtype(o[c].dtype, np.floating):
            assert np.allclose(e[c].astype(float), o[c].astype(float),
                               rtol=0, atol=0, equal_nan=True), f"{name}: col {c}"
        else:
            assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
                f"{name}: col {c}\n{e[c]}\n{o[c]}"


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_docs_vs_oracle(ray_session, edge_dir, name):
    _compare(ray_session, edge_dir, "documents", name)


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    H = 3_600_000_000  # 1h in us
    GAP = 30 * 60 * 1_000_000
    base = 1_700_000_000_000_000  # ~2023, far from any epoch edge
    # (user, ts_us offset, value)
    rows = [
        (1, 0, 0.125),                 # single-event user; half-cent up
        (2, 0, -0.125),                # negative half-cent
        (2, GAP, 1.0),                 # gap EXACTLY threshold: same session
        (2, 2 * GAP + 1, 2.675),       # gap threshold+1us: NEW session
        (3, H - 1, 0.005),             # just before an hour boundary
        (3, H, -0.005),                # exactly on the boundary
        (3, H, 99.994999),             # duplicate ts, distinct event_id
        (4, 5, 0.0),
        (4, 5 + GAP + GAP, 1e6),       # far gap: second session
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([base + off for _, off, _ in rows], pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "a", "a", "b", "a", "a"],
                               pa.string()),
        "value": pa.array([v for _, _, v in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["events_hourly", "sessions"])
def test_edge_events_vs_oracle(ray_session, edge_events_dir, name):
    _compare(ray_session, edge_events_dir, "events", name)


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_emb")
    vecs = [
        [0.0, 0.0, 0.0, 0.0],      # 0: zero QUERY vector (DuckDB cos = -1.0)
        [1.0, 0.0, 0.0, 0.0],      # 1: unit x
        [-1.0, 0.0, 0.0, 0.0],     # 2: opposite of 1
        [1.0, 0.0, 0.0, 0.0],      # 3: EXACT duplicate of 1 (bit-equal ties)
        [0.0, 1.0, 0.0, 0.0],      # 4: orthogonal
        [1e-30, 0.0, 0.0, 0.0],    # 5: tiny but nonzero norm
        [0.3, -0.4, 0.5, -0.6],
        [0.9, 0.1, -0.2, 0.3],
        [-0.5, 0.5, 0.5, -0.5],
        [0.2, 0.8, 0.1, 0.4],      # ids 0..9 are the query set
        [0.0, 0.0, 0.0, 0.0],      # 10: zero DB vector (ranks LAST, not mid)
        [0.7, -0.7, 0.1, 0.0],
        [0.1, 0.2, 0.3, 0.4],
        [0.4, 0.3, 0.2, 0.1],      # 13: gets a *1.01 augmented near-dup
        [-0.9, -0.8, 0.7, 0.6],
        [0.6, 0.6, -0.6, 0.6],
    ]
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["knn_cosine", "embedding_near_dup"])
def test_edge_embeddings_vs_oracle(ray_session, edge_emb_dir, name):
    _compare(ray_session, edge_emb_dir, "embeddings", name)
