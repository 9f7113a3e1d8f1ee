"""Edge-case probe: every documents-table query vs its DuckDB oracle over a
tiny adversarial table — empty text, all-whitespace, leading tab, <3 tokens,
unicode letters, exact + near duplicates.  Mirrors the driver's comparison
(sorted columns, order-insensitive rows, exact values)."""

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


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_docs_vs_oracle(ray_session, edge_dir, name):
    import duckdb

    import ray.data

    from osm_intersections_ray.queries import oracle_sql, queries

    res = queries()[name](edge_dir)
    eng = res.to_pandas() if isinstance(res, ray.data.Dataset) else (
        res.to_pandas() if isinstance(res, pa.Table) else res)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{edge_dir}/documents.parquet')")
    orc = con.sql(oracle_sql()[name]).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o), f"{name}: rows {len(e)} vs {len(o)}"
    assert list(e.columns) == list(o.columns), f"{name}: schema {list(e.columns)} vs {list(o.columns)}"
    for c in e.columns:
        if np.issubdtype(e[c].dtype, np.floating) or np.issubdtype(o[c].dtype, np.floating):
            assert np.allclose(e[c].astype(float), o[c].astype(float),
                               rtol=0, atol=0, equal_nan=True), f"{name}: col {c}"
        else:
            assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
                f"{name}: col {c}"
