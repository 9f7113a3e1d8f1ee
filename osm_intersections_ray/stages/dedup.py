"""Deduplication operators (training-data pipeline graft):

* exact dedup (content-hash groupby),
* MinHash+LSH near-dup candidate pairs (shingle -> minhash -> band ->
  bucket groupby -> pairs),
* n-gram Jaccard verification of candidates,
* SimHash signatures.

All hashing is md5-derived (functions/hashing.py) so each operator has an
exactly-matching DuckDB oracle; the SQL is generated from the same
parameters.  The testdata ``documents`` table has no duplicates, so the
queries run over a deterministic augmentation (exact copies / mutated
near-copies of a doc_id slice) derived identically in the engine and in SQL.

Scale pattern (ray_guide "Aggregation at scale"): signatures are computed per
batch (stateless, vectorized-ish), band rows are exploded with ``flat_map``
semantics inside ``map_batches``, and the only shuffle is the
``groupby(bucket)`` over band rows — at 100 TB that shuffle moves just
(band_hash, doc_id) pairs, never documents.
"""

from __future__ import annotations

import hashlib
import itertools

import pandas as pd
import pyarrow as pa

from ..functions.hashing import h60, simhash64

NUM_PERM = 32
BAND_ROWS = 4  # 8 bands x 4 rows
SHINGLE_K = 3
JACCARD_PCT_MIN = 50

EXACT_DUP_MOD = 7       # doc_id % 7 == 0 gets an exact copy at +1_000_000
NEAR_DUP_MOD = 11       # doc_id % 11 == 0 gets a mutated copy at +1_000_000
NEAR_DUP_SUFFIX = " duplicated tail marker"


def augment_exact_sql(table: str = "documents") -> str:
    return (f"SELECT doc_id, text FROM {table} UNION ALL "
            f"SELECT doc_id + 1000000, text FROM {table} WHERE doc_id % {EXACT_DUP_MOD} = 0")


def augment_near_sql(table: str = "documents") -> str:
    return (f"SELECT doc_id, text FROM {table} UNION ALL "
            f"SELECT doc_id + 1000000, text || '{NEAR_DUP_SUFFIX}' FROM {table} "
            f"WHERE doc_id % {NEAR_DUP_MOD} = 0")


def augment_exact_batch(b: pa.Table) -> pa.Table:
    ids = b["doc_id"].to_pylist()
    texts = b["text"].to_pylist()
    out_i, out_t = list(ids), list(texts)
    for i, t in zip(ids, texts):
        if i % EXACT_DUP_MOD == 0:
            out_i.append(i + 1000000)
            out_t.append(t)
    return pa.table({"doc_id": pa.array(out_i, pa.int64()), "text": pa.array(out_t)})


def augment_near_batch(b: pa.Table) -> pa.Table:
    ids = b["doc_id"].to_pylist()
    texts = b["text"].to_pylist()
    out_i, out_t = list(ids), list(texts)
    for i, t in zip(ids, texts):
        if i % NEAR_DUP_MOD == 0:
            out_i.append(i + 1000000)
            out_t.append(t + NEAR_DUP_SUFFIX)
    return pa.table({"doc_id": pa.array(out_i, pa.int64()), "text": pa.array(out_t)})


def content_hash_batch(b: pa.Table) -> pa.Table:
    texts = b["text"].to_pylist()
    hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table({"doc_id": b["doc_id"], "content_hash": pa.array(hs, pa.string())})


def exact_dedup(ds):
    """groupby(content_hash) -> (content_hash, keep_id=min doc_id, n_dups).
    The groupby aggregate is partial-combined by Ray Data automatically."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(augment_exact_batch, batch_format="pyarrow").map_batches(
        content_hash_batch, batch_format="pyarrow"
    )
    out = hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups")
    )
    return out


def exact_dedup_sql(table: str = "documents") -> str:
    return f"""
WITH aug AS ({augment_exact_sql(table)})
SELECT md5(text) AS content_hash, min(doc_id)::BIGINT AS keep_id,
       count(*)::BIGINT AS n_dups
FROM aug GROUP BY 1
"""


def _word_shingles_k(text: str) -> list[str]:
    toks = text.strip(" ").lower().split()
    if len(toks) < SHINGLE_K:
        return []
    return [" ".join(toks[i : i + SHINGLE_K]) for i in range(len(toks) - SHINGLE_K + 1)]


_PERM_PREFIX = [hashlib.md5(f"{j}|".encode()) for j in range(NUM_PERM)]


def minhash_bands_batch(b: pa.Table) -> pa.Table:
    """doc -> (band, bucket) rows.  Signature: min over shingles of
    h60(f"{j}|{shingle}") per permutation j; bucket = md5("band:v0,v1").
    The per-permutation md5 prefix state is precomputed and ``copy()``-ed per
    shingle (md5 is streaming, so prefix.copy()+update(s) == md5(prefix+s))."""
    ids = b["doc_id"].to_pylist()
    texts = b["text"].to_pylist()
    out_id, out_band, out_bucket = [], [], []
    empty = (1 << 60) - 1
    from_bytes = int.from_bytes
    for i, t in zip(ids, texts):
        sh = set(_word_shingles_k(t))
        if not sh:
            continue
        sig = [empty] * NUM_PERM
        for s in sh:
            enc = s.encode("utf-8")
            for j in range(NUM_PERM):
                h = _PERM_PREFIX[j].copy()
                h.update(enc)
                v = from_bytes(h.digest()[:8], "big") >> 4
                if v < sig[j]:
                    sig[j] = v
        for band in range(NUM_PERM // BAND_ROWS):
            vals = ",".join(str(sig[band * BAND_ROWS + r]) for r in range(BAND_ROWS))
            h = hashlib.md5(f"{band}:{vals}".encode()).digest()
            bucket = int.from_bytes(h[:8], "big") >> 4  # h60 of the band key
            out_id.append(i)
            out_band.append(band)
            out_bucket.append(bucket)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "bucket": pa.array(out_bucket, pa.int64()),  # int key: cheap shuffle
        }
    )


N_SHARDS = 64


def _add_shard(b: pa.Table) -> pa.Table:
    import numpy as np

    shard = (np.asarray(b["bucket"]) % N_SHARDS).astype(np.int64)
    return b.append_column("shard", pa.array(shard))


def lsh_bucket_counts(bands_ds):
    """(band, bucket) -> row count, via the sharded vectorized pattern:
    Ray's sort-aggregate pays per-GROUP Python cost (~40us/group), which is
    pathological at near-one-group-per-row cardinality; sharding by
    bucket%N_SHARDS gives 64 groups whose counting runs as C-speed pandas."""

    def per_shard(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["band", "bucket"], sort=False).size().reset_index(name="n")
        return pa.table({"band": pa.array(g["band"].to_numpy(), pa.int32()),
                         "bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
                         "n": pa.array(g["n"].to_numpy(), pa.int64())})

    sharded = bands_ds.map_batches(_add_shard, batch_format="pyarrow")
    return sharded.groupby("shard").map_groups(per_shard, batch_format="pandas")


def lsh_candidate_pairs(ds):
    """(doc_a < doc_b) pairs sharing any LSH bucket.  Per shard, duplicated
    (band, bucket) groups self-merge (vectorized pandas hash join) into
    ordered pairs; the final distinct-with-count aggregate runs over the
    small candidate set only."""

    def pairs(df: pd.DataFrame) -> pa.Table:
        dup = df[df.duplicated(["band", "bucket"], keep=False)]
        if len(dup) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        m = dup.merge(dup, on=["band", "bucket"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pa.table({"doc_a": pa.array(m["doc_id_x"].to_numpy(), pa.int64()),
                         "doc_b": pa.array(m["doc_id_y"].to_numpy(), pa.int64())})

    bands = ds.map_batches(augment_near_batch, batch_format="pyarrow").map_batches(
        minhash_bands_batch, batch_format="pyarrow"
    ).map_batches(_add_shard, batch_format="pyarrow")
    cand = bands.groupby("shard").map_groups(pairs, batch_format="pandas")
    # distinct (a, b) with shared-bucket counts — candidates are few
    from ray.data.aggregate import Count

    return cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_buckets"))


def lsh_pairs_sql(table: str = "documents") -> str:
    return f"""
WITH aug AS ({augment_near_sql(table)}),
toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM aug),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(generate_series(1, len(t) - {SHINGLE_K - 1})) AS u(i)
  WHERE len(t) >= {SHINGLE_K}
),
mh AS (
  SELECT doc_id, j,
         min(('0x' || substr(md5(j::VARCHAR || '|' || s), 1, 15))::BIGINT) AS v
  FROM sh, UNNEST(generate_series(0, {NUM_PERM - 1})) AS p(j)
  GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id, j // {BAND_ROWS} AS band,
         string_agg(v::VARCHAR, ',' ORDER BY j) AS vals
  FROM mh GROUP BY doc_id, j // {BAND_ROWS}
),
buck AS (SELECT doc_id, band,
               ('0x' || substr(md5(band::VARCHAR || ':' || vals), 1, 15))::BIGINT AS bucket
         FROM sig)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_buckets
FROM buck a JOIN buck b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def jaccard_verified_pairs(ds):
    """LSH candidates verified by true word-3-shingle Jaccard (integer
    percent, floor).  The shingle sets of a candidate pair are recomputed
    inside the verification join group (documents are never shuffled)."""
    # collect candidates (small), broadcast doc texts for them
    import ray

    cand = lsh_candidate_pairs(ds).to_pandas()
    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    need_set = set(int(x) for x in need)

    def keep(b: pa.Table) -> pa.Table:
        aug = augment_near_batch(b)
        mask = [int(i) in need_set for i in aug["doc_id"].to_pylist()]
        return aug.filter(pa.array(mask))

    texts_df = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    sh = {int(i): set(_word_shingles_k(t))
          for i, t in zip(texts_df["doc_id"], texts_df["text"])}
    rows = {"doc_a": [], "doc_b": [], "jac_pct": []}
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sh.get(int(a), set()), sh.get(int(b), set())
        inter = len(sa & sb)
        union = len(sa | sb)
        pct = (100 * inter) // union if union else 0
        if pct >= JACCARD_PCT_MIN:
            rows["doc_a"].append(int(a))
            rows["doc_b"].append(int(b))
            rows["jac_pct"].append(pct)
    return pd.DataFrame(rows).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def jaccard_pairs_sql(table: str = "documents") -> str:
    return f"""
WITH aug AS ({augment_near_sql(table)}),
toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM aug),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(generate_series(1, len(t) - {SHINGLE_K - 1})) AS u(i)
  WHERE len(t) >= {SHINGLE_K}
),
mh AS (
  SELECT doc_id, j,
         min(('0x' || substr(md5(j::VARCHAR || '|' || s), 1, 15))::BIGINT) AS v
  FROM sh, UNNEST(generate_series(0, {NUM_PERM - 1})) AS p(j)
  GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id, j // {BAND_ROWS} AS band,
         string_agg(v::VARCHAR, ',' ORDER BY j) AS vals
  FROM mh GROUP BY doc_id, j // {BAND_ROWS}
),
buck AS (SELECT doc_id, band,
               ('0x' || substr(md5(band::VARCHAR || ':' || vals), 1, 15))::BIGINT AS bucket
         FROM sig),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buck a JOIN buck b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM pairs p JOIN sh a ON a.doc_id = p.doc_a JOIN sh b ON b.doc_id = p.doc_b AND b.s = a.s
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       ((100 * coalesce(i.i, 0)) // (sa.n + sb.n - coalesce(i.i, 0)))::BIGINT AS jac_pct
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
WHERE (100 * coalesce(i.i, 0)) // (sa.n + sb.n - coalesce(i.i, 0)) >= {JACCARD_PCT_MIN}
"""


def simhash_batch(b: pa.Table) -> pa.Table:
    ids = b["doc_id"].to_pylist()
    texts = b["text"].to_pylist()
    sigs = [simhash64(t.strip(" ").lower().split()) for t in texts]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "simhash": pa.array(sigs, pa.int64())})


def simhash_sql(table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM {table}
),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks),
bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM h, UNNEST(generate_series(0, 59)) AS g(j)
  GROUP BY doc_id, j
)
SELECT doc_id, SUM(CASE WHEN c > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""
