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

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import cap_join_partitions, n_shards

from ..functions.hashing import duck_lower, h60
from .text import ascii_tokens

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
            # NULL || suffix is NULL in the oracle's augmentation
            out_t.append(None if t is None else t + NEAR_DUP_SUFFIX)
    return pa.table({"doc_id": pa.array(out_i, pa.int64()), "text": pa.array(out_t)})


def content_hash_batch(b: pa.Table) -> pa.Table:
    texts = b["text"].to_pylist()
    # md5(NULL) is NULL in the oracle; GROUP BY then keeps one NULL-hash
    # group (SQL groups NULLs together), which the engine's groupby mirrors
    hs = [None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
          for t in texts]
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


# Fully-vectorized MinHash: md5 appears ONCE per distinct *token* (h60);
# everything downstream is 64-bit integer mixing that numpy computes with
# native uint64 wraparound and the DuckDB oracle reproduces bit-for-bit with
# HUGEINT arithmetic (% 2^64) over the same constants:
#
#   shingle hash  s = (h(t0)*C + h(t1))*C + h(t2)            (mod 2^64)
#   perm value  v_j = A_j * s + B_j                          (mod 2^64)
#   LSH bucket      = ((((band*C + v0)*C + v1)*C + v2)*C + v3  mod 2^64) >> 4
#
# C is an odd 63-bit mixing multiplier (Knuth MMIX LCG); A_j odd < 2^61.
MIX_C = np.uint64(6364136223846793005)
_PERM_A = np.array([(h60(f"minhash-a|{j}") << 1) | 1 for j in range(NUM_PERM)],
                   dtype=np.uint64)
_PERM_B = np.array([h60(f"minhash-b|{j}") for j in range(NUM_PERM)], dtype=np.uint64)


# Per-WORKER token-hash cache: md5 is ~75% of the MinHash kernel and the
# token vocabulary repeats heavily across batches, so hashing each distinct
# token once per worker process (not once per batch) removes most of the
# kernel's md5 + Python-object churn.  Values are pure functions of the
# token (h60), so caching cannot change any result.  Bounded: cleared when
# it exceeds _TOKEN_CACHE_MAX entries (~2M tokens = a few hundred MB worst
# case), which keeps open-vocabulary corpora safe at 100 TB.
_TOKEN_H_CACHE: dict = {}
_TOKEN_CACHE_MAX = 1 << 21


def _token_hashes(texts, cache: dict):
    """Flat per-token h60 array over all docs + per-doc (start, n_tokens).
    One md5 per token *distinct within the cache's lifetime* (callers pass
    the per-worker :data:`_TOKEN_H_CACHE`)."""
    if len(cache) > _TOKEN_CACHE_MAX:
        cache.clear()
    hs: list = []
    starts = np.empty(len(texts), dtype=np.int64)
    lens = np.empty(len(texts), dtype=np.int64)
    get = cache.get
    for d, t in enumerate(texts):
        toks = ascii_tokens(t)  # SAME split class as the SQL oracles (text.py)
        starts[d] = len(hs)
        lens[d] = len(toks)
        for tok in toks:
            h = get(tok)
            if h is None:
                h = h60(tok)
                cache[tok] = h
            hs.append(h)
    return np.array(hs, dtype=np.uint64), starts, lens


def _shingle_hashes_per_doc(texts) -> list[np.ndarray]:
    """Per-doc word-SHINGLE_K-shingle hash arrays (with duplicates), via the
    rolling integer mix.  Docs with < SHINGLE_K tokens get an empty array."""
    hs, starts, lens = _token_hashes(texts, _TOKEN_H_CACHE)
    out = []
    for d in range(len(texts)):
        L = int(lens[d])
        if L < SHINGLE_K:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        seg = hs[starts[d] : starts[d] + L]
        out.append((seg[:-2] * MIX_C + seg[1:-1]) * MIX_C + seg[2:])
    return out


_CHUNK_OCC = 1 << 14  # ~16k shingle occurrences per inner chunk: the
# (occ, NUM_PERM) uint64 mix matrix stays ~4 MB — LLC-resident, so the mix
# pass stops competing for DRAM bandwidth when many workers run in parallel
# (measured 2->8-cpu kernel scaling 0.64 -> 0.74 eff vs the 32 MB chunk,
# and faster at BOTH levels).  Without chunking, a 50k-doc block makes
# ~800 MB temporaries and the kernel goes memory-bound.
# The mix buffer is allocated ONCE per worker process and reused via
# out= kernels: freshly-touched pages are catastrophically slow on
# ballooned-memory hypervisors (measured ~17 MB/s first-touch on this
# sandbox vs GB/s warm), so allocation churn IS the hot path there.
_V_BUF = None


def _mix_chunk(flat: np.ndarray) -> np.ndarray:
    global _V_BUF
    n = len(flat)
    if _V_BUF is None or _V_BUF.shape[0] < n:
        _V_BUF = np.empty((max(n, _CHUNK_OCC), NUM_PERM), dtype=np.uint64)
    v = _V_BUF[:n]
    np.multiply(flat[:, None], _PERM_A[None, :], out=v)
    np.add(v, _PERM_B[None, :], out=v)
    return v


def minhash_bands_batch(b: pa.Table) -> pa.Table:
    """doc -> (band, bucket) rows; all-numpy except tokenization + the
    per-distinct-token md5."""
    ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    texts = b["text"].to_pylist()
    sh_per_doc = _shingle_hashes_per_doc(texts)
    seg_lens = np.array([len(s) for s in sh_per_doc], dtype=np.int64)
    kept = seg_lens > 0
    kept_ids = ids[kept]
    if len(kept_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int32()),
                         "bucket": pa.array([], pa.int64())})
    kept_arrays = [s for s, k in zip(sh_per_doc, kept) if k]
    kept_lens = seg_lens[kept]
    sig_parts = []
    i = 0
    n_kept = len(kept_arrays)
    while i < n_kept:
        j, occ = i, 0
        while j < n_kept and (occ == 0 or occ + kept_lens[j] <= _CHUNK_OCC):
            occ += int(kept_lens[j])
            j += 1
        flat = np.concatenate(kept_arrays[i:j])
        fstarts = np.zeros(j - i, dtype=np.int64)
        np.cumsum(kept_lens[i:j][:-1], out=fstarts[1:])
        v = _mix_chunk(flat)  # (A_j*h+B_j) uint64 wrap, reused buffer
        sig_parts.append(np.minimum.reduceat(v, fstarts, axis=0))
        i = j
    sig = np.concatenate(sig_parts, axis=0)  # (ndocs, NUM_PERM)
    n_bands = NUM_PERM // BAND_ROWS
    s3 = sig.reshape(-1, n_bands, BAND_ROWS)
    acc = np.arange(n_bands, dtype=np.uint64)[None, :] * MIX_C + s3[:, :, 0]
    for r in range(1, BAND_ROWS):
        acc = acc * MIX_C + s3[:, :, r]
    bucket = (acc >> np.uint64(4)).astype(np.int64)  # 60-bit: int64-safe
    ndocs = len(kept_ids)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(kept_ids, n_bands)),
            "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), ndocs)),
            "bucket": pa.array(bucket.ravel()),  # int key: cheap shuffle
        }
    )


N_SHARDS = 64  # shard floor; operators derive the live value via n_shards()


def _add_shard_fn(ns: int):
    """Batch kernel adding ``shard = bucket % ns``; ``ns`` is captured
    driver-side at pipeline-build time (common.n_shards) so the exchange
    width scales with the cluster.  Same-bucket rows land in the same shard
    for ANY ns, so the per-shard folds are shard-count-invariant."""

    def _add_shard(b: pa.Table) -> pa.Table:
        import numpy as np

        shard = (np.asarray(b["bucket"]) % ns).astype(np.int64)
        return b.append_column("shard", pa.array(shard))

    return _add_shard


def lsh_bucket_counts(bands_ds):
    """(band, bucket) -> row count, via the sharded vectorized pattern:
    Ray's sort-aggregate pays per-GROUP Python cost (~40us/group), which is
    pathological at near-one-group-per-row cardinality; sharding by
    bucket%N_SHARDS gives 64 groups whose counting runs as C-speed pandas.

    The band rows (24 B/row — a small fraction of the input text) are
    PINNED before the shuffle: feeding a map stage directly into an
    AllToAll sort measures ~2x slower end-to-end on this Ray version than
    materialize-then-sort (the sort's input buffering throttles the
    upstream), and the pin also lets a resumed run skip the scan."""
    bands_ds = bands_ds.materialize()

    def per_shard(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["band", "bucket"], sort=False).size().reset_index(name="n")
        return pa.table({"band": pa.array(g["band"].to_numpy(), pa.int32()),
                         "bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
                         "n": pa.array(g["n"].to_numpy(), pa.int64())})

    sharded = bands_ds.map_batches(_add_shard_fn(n_shards()),
                                   batch_format="pyarrow")
    return sharded.groupby("shard").map_groups(per_shard, batch_format="pandas")


# Stage-checkpoint keys carry every parameter that feeds the band values —
# a kernel change in a later round invalidates old /tmp checkpoints by key.
_BANDS_CKPT_VERSION = 1


def _bands_ckpt_key(source_key: str) -> str:
    return (f"bands-v{_BANDS_CKPT_VERSION}-p{NUM_PERM}r{BAND_ROWS}"
            f"k{SHINGLE_K}m{NEAR_DUP_MOD}|{source_key}")


def lsh_candidate_pairs(ds, ckpt_key: str | None = None,
                        augment_fn=None):
    """(doc_a < doc_b) pairs sharing any LSH bucket.  Per shard, duplicated
    (band, bucket) groups self-merge (vectorized pandas hash join) into
    ordered pairs; the final distinct-with-count aggregate runs over the
    small candidate set only.

    ``ckpt_key`` (a stable identifier for the input, e.g. its sf_dir)
    persists the band rows through ``state.checkpoint.cached_dataset`` so
    the tokenize+MinHash scan runs ONCE per input even when several dedup
    consumers (pairs, Jaccard verify, survivor filter) share the chain."""

    def pairs(df: pd.DataFrame) -> pa.Table:
        dup = df[df.duplicated(["band", "bucket"], keep=False)]
        if len(dup) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        m = dup.merge(dup, on=["band", "bucket"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pa.table({"doc_a": pa.array(m["doc_id_x"].to_numpy(), pa.int64()),
                         "doc_b": pa.array(m["doc_id_y"].to_numpy(), pa.int64())})

    aug_fn = augment_fn or augment_near_batch

    def make_bands():
        return ds.map_batches(aug_fn, batch_format="pyarrow").map_batches(
            minhash_bands_batch, batch_format="pyarrow", batch_size=8192
        ).map_batches(_add_shard_fn(n_shards()), batch_format="pyarrow")

    if ckpt_key is not None:
        from ..state.checkpoint import cached_dataset

        bands = cached_dataset(_bands_ckpt_key(ckpt_key), make_bands)
    else:
        bands = make_bands().materialize()  # see lsh_bucket_counts
    cand = bands.groupby("shard").map_groups(pairs, batch_format="pandas")
    # distinct (a, b) with shared-bucket counts — candidates are few
    from ray.data.aggregate import Count

    return cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_buckets"))


# Both sides tokenize identically for ANY input: the engine splits on the
# explicit RE2 '\s' class (text.ascii_tokens), the SQL strips that class from
# the ends then splits on it — equal even for embedded \v / Unicode
# whitespace, which both sides keep inside tokens (see text.py header).
_TOKS_EXPR = "regexp_split_to_array(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')"


_M64 = "18446744073709551616"  # 2^64


def _perms_values_sql() -> str:
    return ", ".join(f"({j}, {int(_PERM_A[j])}, {int(_PERM_B[j])})"
                     for j in range(NUM_PERM))


def _h60_sql(expr: str) -> str:
    # hex-string casts parse into BIGINT (60 bits fits); promote to HUGEINT
    # for the overflow-free mixing arithmetic
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT::HUGEINT"


def _buckets_cte(table: str, aug_sql: str | None = None) -> str:
    """Shared WITH-body: augmented docs -> shingle hashes -> minhash bands ->
    LSH buckets, mirroring the numpy kernel bit-for-bit (HUGEINT % 2^64 ==
    uint64 wraparound; verified identical).  ``aug_sql`` overrides the
    standard near-dup augmentation (the incremental-ingest derivation)."""
    C, M = int(MIX_C), _M64
    band_mix = f"band::HUGEINT * {C} + v0"
    for r in range(1, BAND_ROWS):
        band_mix = f"(({band_mix}) % {M}) * {C} + v{r}"
    pivots = ",\n         ".join(
        f"max(CASE WHEN j % {BAND_ROWS} = {r} THEN v END) AS v{r}"
        for r in range(BAND_ROWS))
    return f"""aug AS ({aug_sql or augment_near_sql(table)}),
toks AS (SELECT doc_id, {_TOKS_EXPR} AS t FROM aug),
sh AS (
  SELECT DISTINCT doc_id,
         ((({_h60_sql('t[i]')} * {C} + {_h60_sql('t[i+1]')}) % {M}) * {C}
            + {_h60_sql('t[i+2]')}) % {M} AS s
  FROM toks, UNNEST(generate_series(1, len(t) - {SHINGLE_K - 1})) AS u(i)
  WHERE len(t) >= {SHINGLE_K}
),
perms(j, a, bc) AS (VALUES {_perms_values_sql()}),
mh AS (
  SELECT doc_id, j,
         min((a::HUGEINT * s + bc) % {M}) AS v
  FROM sh, perms
  GROUP BY doc_id, j
),
sigw AS (
  SELECT doc_id, j // {BAND_ROWS} AS band,
         {pivots}
  FROM mh GROUP BY doc_id, j // {BAND_ROWS}
),
buck AS (SELECT doc_id, band, (({band_mix}) % {M}) // 16 AS bucket FROM sigw)"""


def lsh_pairs_sql(table: str = "documents") -> str:
    return f"""
WITH {_buckets_cte(table)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_buckets
FROM buck a JOIN buck b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


N_PAIR_SHARDS = 32


def jaccard_verified_pairs(ds, ckpt_key: str | None = None,
                           augment_fn=None):
    """Checkpointed wrapper over :func:`_jaccard_verified_pairs`: with a
    ``ckpt_key`` the verified pairs persist once per input, so the survivor
    filter (and any rerun) reads them back instead of re-verifying.
    Callers overriding ``augment_fn`` must pass a key that encodes the
    derivation (e.g. ``f"{sf}:incr"``) so chains never share a cache."""
    if ckpt_key is not None:
        from ..state.checkpoint import cached_dataset

        return cached_dataset(
            f"jacpairs-v{_BANDS_CKPT_VERSION}-j{JACCARD_PCT_MIN}|{ckpt_key}",
            lambda: _jaccard_verified_pairs(ds, ckpt_key=ckpt_key,
                                            augment_fn=augment_fn))
    return _jaccard_verified_pairs(ds, augment_fn=augment_fn)


def _jaccard_verified_pairs(ds, ckpt_key: str | None = None,
                            augment_fn=None):
    """LSH candidates verified by true word-3-shingle Jaccard (integer
    percent, floor) — fully distributed:

    1. candidate pairs explode to (doc_id, doc_a, doc_b) membership rows;
    2. a hash join (``Dataset.join``) ships each candidate doc's text to its
       pairs — documents NOT in any pair never move, and the driver never
       holds texts;
    3. pairs shard by pair-hash; each shard verifies vectorized (one shingle
       set per distinct doc in the shard, numpy intersect per pair), so the
       per-group Python dispatch cost lands on N_PAIR_SHARDS groups, not on
       billions of pairs.
    Only (doc_a, doc_b, jac_pct) rows leave the shards."""
    N_PAIR_SHARDS = n_shards(32)  # cluster-derived (VERDICT r3 #3)

    def member_rows(b: pa.Table) -> pa.Table:
        a = np.asarray(b["doc_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        bb = np.asarray(b["doc_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, bb])),
            "doc_a": pa.array(np.concatenate([a, a])),
            "doc_b": pa.array(np.concatenate([bb, bb])),
        })

    from .common import drop_empty_blocks

    # candidates are the small derived set: pin them (streaming them twice
    # into the join schema probe isn't worth it, and an EMPTY lazy dataset
    # has no schema for Dataset.join to hash on); strip the aggregate's
    # schema-less empty blocks before they can poison the hash join
    cand = drop_empty_blocks(lsh_candidate_pairs(
        ds, ckpt_key=ckpt_key, augment_fn=augment_fn).materialize())
    if cand.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64()),
                                       "jac_pct": pa.array([], pa.int64())}))
    member = cand.map_batches(member_rows, batch_format="pyarrow")
    texts = ds.map_batches(augment_fn or augment_near_batch,
                           batch_format="pyarrow")
    joined = member.join(texts, join_type="inner",
                         num_partitions=cap_join_partitions(16), on=("doc_id",))

    def add_shard(b: pa.Table) -> pa.Table:
        sh = ((np.asarray(b["doc_a"].to_numpy(zero_copy_only=False)) * 1000003
               + np.asarray(b["doc_b"].to_numpy(zero_copy_only=False)))
              % N_PAIR_SHARDS).astype(np.int64)
        return b.append_column("pshard", pa.array(sh))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        uniq = df.drop_duplicates("doc_id")
        sh_arrays = _shingle_hashes_per_doc(uniq["text"].tolist())
        sets = {int(i): np.unique(a)
                for i, a in zip(uniq["doc_id"], sh_arrays)}
        pairs = df.drop_duplicates(["doc_a", "doc_b"])
        out_a, out_b, out_p = [], [], []
        for a, b2 in zip(pairs["doc_a"], pairs["doc_b"]):
            sa = sets.get(int(a))
            sb = sets.get(int(b2))
            if sa is None or sb is None:  # text side missing: skip (can't verify)
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            pct = (100 * inter) // union if union else 0
            if pct >= JACCARD_PCT_MIN:
                out_a.append(int(a))
                out_b.append(int(b2))
                out_p.append(pct)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jac_pct": pa.array(out_p, pa.int64())})

    return (joined.map_batches(add_shard, batch_format="pyarrow")
            .groupby("pshard").map_groups(per_shard, batch_format="pandas"))


def _verified_cte(table: str, aug_sql: str | None = None) -> str:
    """The buckets -> candidate-pairs -> shingle-sizes -> intersection ->
    verified CTE chain — the single source of truth for the verification SQL
    shared by the jaccard, survivor and cluster oracles (it mirrors the one
    engine path, ``jaccard_verified_pairs``)."""
    return f"""{_buckets_cte(table, aug_sql=aug_sql)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buck a JOIN buck b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM cand p JOIN sh a ON a.doc_id = p.doc_a JOIN sh b ON b.doc_id = p.doc_b AND b.s = a.s
  GROUP BY 1, 2
),
verified AS (
  SELECT p.doc_a, p.doc_b,
         ((100 * coalesce(i.i, 0)) // (sa.n + sb.n - coalesce(i.i, 0)))::BIGINT AS jac_pct
  FROM cand p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
  WHERE (100 * coalesce(i.i, 0)) // (sa.n + sb.n - coalesce(i.i, 0)) >= {JACCARD_PCT_MIN}
)"""


def jaccard_pairs_sql(table: str = "documents") -> str:
    return f"""
WITH {_verified_cte(table)}
SELECT doc_a, doc_b, jac_pct FROM verified
"""


# --- character-n-gram Jaccard (the "n-gram Jaccard" dedup flavor): the same
# LSH candidate pairs, but similarity measured on distinct lowercased char
# 5-grams instead of word 3-shingles — robust to token-boundary edits that
# word shingles overweight.  Same distributed shape as the word verify:
# texts reach their pairs via Dataset.join (docs in no pair never move) and
# grams exist only inside the pair shards, never in a shuffle.
CHAR_NGRAM_K = 5
CHAR_NGRAM_PCT_MIN = 50


def char_ngram_verified_pairs(ds, ckpt_key: str | None = None):
    """LSH candidates verified by char-``CHAR_NGRAM_K``-gram Jaccard
    (integer percent, floor; pairs where either side is shorter than K chars
    have no gram set and drop, mirroring the oracle's inner join on sizes)."""
    N_PAIR_SHARDS = n_shards(32)  # cluster-derived (VERDICT r3 #3)

    def member_rows(b: pa.Table) -> pa.Table:
        a = np.asarray(b["doc_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        bb = np.asarray(b["doc_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, bb])),
            "doc_a": pa.array(np.concatenate([a, a])),
            "doc_b": pa.array(np.concatenate([bb, bb])),
        })

    from .common import drop_empty_blocks

    cand = drop_empty_blocks(lsh_candidate_pairs(ds, ckpt_key=ckpt_key).materialize())
    if cand.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64()),
                                       "cng_pct": pa.array([], pa.int64())}))
    member = cand.map_batches(member_rows, batch_format="pyarrow")
    texts = ds.map_batches(augment_near_batch, batch_format="pyarrow")
    joined = member.join(texts, join_type="inner",
                         num_partitions=cap_join_partitions(16), on=("doc_id",))

    def add_shard(b: pa.Table) -> pa.Table:
        sh = ((np.asarray(b["doc_a"].to_numpy(zero_copy_only=False)) * 1000003
               + np.asarray(b["doc_b"].to_numpy(zero_copy_only=False)))
              % N_PAIR_SHARDS).astype(np.int64)
        return b.append_column("pshard", pa.array(sh))

    K = CHAR_NGRAM_K

    def per_shard(df: pd.DataFrame) -> pa.Table:
        uniq = df.drop_duplicates("doc_id")
        # candidate docs only (a tiny derived set): plain Python gram sets —
        # exact against the oracle's DISTINCT substr() per char position
        sets = {}
        for i, t in zip(uniq["doc_id"], uniq["text"]):
            tl = duck_lower(t)
            sets[int(i)] = ({tl[j:j + K] for j in range(len(tl) - K + 1)}
                            if len(tl) >= K else set())
        pairs = df.drop_duplicates(["doc_a", "doc_b"])
        out_a, out_b, out_p = [], [], []
        for a, b2 in zip(pairs["doc_a"], pairs["doc_b"]):
            sa = sets.get(int(a))
            sb = sets.get(int(b2))
            if not sa or not sb:  # short/missing side: no gram set (see SQL)
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            pct = (100 * inter) // union
            if pct >= CHAR_NGRAM_PCT_MIN:
                out_a.append(int(a))
                out_b.append(int(b2))
                out_p.append(pct)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "cng_pct": pa.array(out_p, pa.int64())})

    return (joined.map_batches(add_shard, batch_format="pyarrow")
            .groupby("pshard").map_groups(per_shard, batch_format="pandas"))


def char_ngram_pairs_sql(table: str = "documents") -> str:
    K = CHAR_NGRAM_K
    return f"""
WITH {_buckets_cte(table)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buck a JOIN buck b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
cdocs AS (SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand),
gr AS (
  SELECT DISTINCT c.doc_id, substr(lower(a.text), i, {K}) AS g
  FROM cdocs c JOIN aug a ON a.doc_id = c.doc_id,
       UNNEST(generate_series(1, length(a.text) - {K - 1})) AS u(i)
  WHERE length(a.text) >= {K}
),
sizes AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM cand p JOIN gr a ON a.doc_id = p.doc_a JOIN gr b ON b.doc_id = p.doc_b AND b.g = a.g
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       ((100 * coalesce(i.i, 0)) // (sa.n + sb.n - coalesce(i.i, 0)))::BIGINT AS cng_pct
FROM cand p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
WHERE (100 * coalesce(i.i, 0)) // (sa.n + sb.n - coalesce(i.i, 0)) >= {CHAR_NGRAM_PCT_MIN}
"""


# --- MinHash similarity ESTIMATE per candidate pair: the fraction of equal
# signature components — the classic sketch estimator whose quality the
# exact verify (near_dup_jaccard) measures.  Emits EVERY candidate pair
# (no threshold): this is the op a pipeline uses to rank candidates before
# paying for exact verification.
def minhash_estimate_pairs(ds, ckpt_key: str | None = None):
    """(doc_a, doc_b, est_pct) for every LSH candidate pair, where est_pct
    = floor(100 * #equal-signature-components / NUM_PERM) — the unbiased
    MinHash Jaccard estimator on the same 32-permutation signatures the
    banding uses.  Same distributed shape as the verifies: texts reach
    their pairs via Dataset.join, signatures exist only inside the pair
    shards (recomputed from the bounded shard texts — cheaper at scale
    than shuffling 256-byte signature columns through the join)."""
    N_PAIR_SHARDS = n_shards(32)  # cluster-derived (VERDICT r3 #3)

    def member_rows(b: pa.Table) -> pa.Table:
        a = np.asarray(b["doc_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        bb = np.asarray(b["doc_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, bb])),
            "doc_a": pa.array(np.concatenate([a, a])),
            "doc_b": pa.array(np.concatenate([bb, bb])),
        })

    from .common import drop_empty_blocks

    cand = drop_empty_blocks(lsh_candidate_pairs(ds, ckpt_key=ckpt_key).materialize())
    if cand.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64()),
                                       "est_pct": pa.array([], pa.int64())}))
    member = cand.map_batches(member_rows, batch_format="pyarrow")
    texts = ds.map_batches(augment_near_batch, batch_format="pyarrow")
    joined = member.join(texts, join_type="inner",
                         num_partitions=cap_join_partitions(16), on=("doc_id",))

    def add_shard(b: pa.Table) -> pa.Table:
        sh = ((np.asarray(b["doc_a"].to_numpy(zero_copy_only=False)) * 1000003
               + np.asarray(b["doc_b"].to_numpy(zero_copy_only=False)))
              % N_PAIR_SHARDS).astype(np.int64)
        return b.append_column("pshard", pa.array(sh))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        uniq = df.drop_duplicates("doc_id")
        sh_arrays = _shingle_hashes_per_doc(uniq["text"].tolist())
        sigs = {}
        for i, arr in zip(uniq["doc_id"], sh_arrays):
            if not len(arr):
                continue  # never a candidate (no bands) — defensive only
            v = (_PERM_A[None, :] * arr.astype(np.uint64)[:, None]
                 + _PERM_B[None, :])  # uint64 wraparound == HUGEINT % 2^64
            sigs[int(i)] = v.min(axis=0)
        pairs = df.drop_duplicates(["doc_a", "doc_b"])
        out_a, out_b, out_p = [], [], []
        for a, b2 in zip(pairs["doc_a"], pairs["doc_b"]):
            sa, sb = sigs.get(int(a)), sigs.get(int(b2))
            if sa is None or sb is None:
                continue
            eq = int((sa == sb).sum())
            out_a.append(int(a))
            out_b.append(int(b2))
            out_p.append((100 * eq) // NUM_PERM)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "est_pct": pa.array(out_p, pa.int64())})

    return (joined.map_batches(add_shard, batch_format="pyarrow")
            .groupby("pshard").map_groups(per_shard, batch_format="pandas"))


def minhash_estimate_pairs_sql(table: str = "documents") -> str:
    return f"""
WITH {_buckets_cte(table)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buck a JOIN buck b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
est AS (
  SELECT p.doc_a, p.doc_b,
         count(*) FILTER (WHERE a.v = b.v)::BIGINT AS eq
  FROM cand p JOIN mh a ON a.doc_id = p.doc_a
              JOIN mh b ON b.doc_id = p.doc_b AND b.j = a.j
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, ((100 * eq) // {NUM_PERM})::BIGINT AS est_pct FROM est
"""


# --- shingle containment (subset-duplication detector): the same LSH
# candidates, scored by |A n B| / min(|A|, |B|) instead of Jaccard — a doc
# QUOTED inside a much larger doc scores ~100 here while its Jaccard is
# tiny, so this is the dedup flavor that catches wrapper/boilerplate
# inclusion.  Same distributed shape as the word verify: texts reach their
# pairs via Dataset.join, shingle sets exist only inside the pair shards.
CONTAIN_PCT_MIN = 80


def containment_verified_pairs(ds, ckpt_key: str | None = None):
    """LSH candidates verified by word-3-shingle CONTAINMENT (integer
    percent, floor of 100*|A n B| / min(|A|, |B|)); pairs where either side
    has no shingles drop, mirroring the oracle's inner join on sizes."""
    N_PAIR_SHARDS = n_shards(32)  # cluster-derived (VERDICT r3 #3)

    def member_rows(b: pa.Table) -> pa.Table:
        a = np.asarray(b["doc_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        bb = np.asarray(b["doc_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, bb])),
            "doc_a": pa.array(np.concatenate([a, a])),
            "doc_b": pa.array(np.concatenate([bb, bb])),
        })

    from .common import drop_empty_blocks

    cand = drop_empty_blocks(lsh_candidate_pairs(ds, ckpt_key=ckpt_key).materialize())
    if cand.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64()),
                                       "cont_pct": pa.array([], pa.int64())}))
    member = cand.map_batches(member_rows, batch_format="pyarrow")
    texts = ds.map_batches(augment_near_batch, batch_format="pyarrow")
    joined = member.join(texts, join_type="inner",
                         num_partitions=cap_join_partitions(16), on=("doc_id",))

    def add_shard(b: pa.Table) -> pa.Table:
        sh = ((np.asarray(b["doc_a"].to_numpy(zero_copy_only=False)) * 1000003
               + np.asarray(b["doc_b"].to_numpy(zero_copy_only=False)))
              % N_PAIR_SHARDS).astype(np.int64)
        return b.append_column("pshard", pa.array(sh))

    def per_shard(df: pd.DataFrame) -> pa.Table:
        uniq = df.drop_duplicates("doc_id")
        sh_arrays = _shingle_hashes_per_doc(uniq["text"].tolist())
        sets = {int(i): np.unique(a)
                for i, a in zip(uniq["doc_id"], sh_arrays)}
        pairs = df.drop_duplicates(["doc_a", "doc_b"])
        out_a, out_b, out_p = [], [], []
        for a, b2 in zip(pairs["doc_a"], pairs["doc_b"]):
            sa = sets.get(int(a))
            sb = sets.get(int(b2))
            if sa is None or sb is None or not len(sa) or not len(sb):
                continue  # no shingle set: the oracle's sizes join drops it
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            pct = (100 * inter) // min(len(sa), len(sb))
            if pct >= CONTAIN_PCT_MIN:
                out_a.append(int(a))
                out_b.append(int(b2))
                out_p.append(pct)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "cont_pct": pa.array(out_p, pa.int64())})

    return (joined.map_batches(add_shard, batch_format="pyarrow")
            .groupby("pshard").map_groups(per_shard, batch_format="pandas"))


def containment_pairs_sql(table: str = "documents") -> str:
    return f"""
WITH {_buckets_cte(table)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buck a JOIN buck b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM cand p JOIN sh a ON a.doc_id = p.doc_a JOIN sh b ON b.doc_id = p.doc_b AND b.s = a.s
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       ((100 * coalesce(i.i, 0)) // least(sa.n, sb.n))::BIGINT AS cont_pct
FROM cand p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
WHERE (100 * coalesce(i.i, 0)) // least(sa.n, sb.n) >= {CONTAIN_PCT_MIN}
"""


_SIMHASH_CHUNK = 1 << 17  # occurrences per inner chunk: the (chunk, 64)
# uint8 bit matrix stays ~8 MB (LLC-resident) however large a block Ray
# hands the kernel — the previous formulation built a (total_tokens, 60)
# int16 temporary (~1.2 GB at 10M tokens) and went memory-bound.


def simhash_batch(b: pa.Table) -> pa.Table:
    """Vectorized SimHash: one md5 (h60) per distinct token *per worker*
    (shared :data:`_TOKEN_H_CACHE`), then chunked ``np.unpackbits`` voting —
    per-bit vote = 2 x popcount - n_tokens, sign bit packed.  Identical
    values to the scalar simhash64 (same per-token h60), so the SQL oracle
    is unchanged in semantics."""
    ids = b["doc_id"].to_pylist()
    hs, starts, lens = _token_hashes(b["text"].to_pylist(), _TOKEN_H_CACHE)
    n_docs = len(ids)
    counts = np.zeros((n_docs, 60), dtype=np.int64)
    if hs.size:
        rep = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        for s in range(0, hs.size, _SIMHASH_CHUNK):
            seg = hs[s: s + _SIMHASH_CHUNK]
            d = rep[s: s + _SIMHASH_CHUNK]
            # little-endian uint64 -> per-value bit columns 0..59
            bits = np.unpackbits(seg.view(np.uint8).reshape(-1, 8),
                                 axis=1, bitorder="little")[:, :60]
            bnd = np.flatnonzero(np.diff(d, prepend=d[0] - 1))
            sums = np.add.reduceat(bits.astype(np.int32), bnd, axis=0)
            counts[d[bnd]] += sums  # doc ids unique within a chunk
    votes = 2 * counts - lens[:, None]
    weights = (np.uint64(1) << np.arange(60, dtype=np.uint64))
    sigs = ((votes > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "simhash": pa.array(sigs.astype(np.int64), pa.int64())})


def simhash_sql(table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_EXPR}) AS tok FROM {table}
),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
      FROM toks WHERE tok <> ''),
bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM h, UNNEST(generate_series(0, 59)) AS g(j)
  GROUP BY doc_id, j
),
s AS (SELECT doc_id,
             SUM(CASE WHEN c > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
      FROM bits GROUP BY doc_id)
SELECT d.doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash
FROM {table} d LEFT JOIN s ON s.doc_id = d.doc_id
"""


# --- SimHash near-dup pairs: hamming <= 3 via 4 x 15-bit band pigeonhole ---
# Any two 60-bit signatures differing in at most SIMHASH_BANDS-1 bits agree
# exactly on at least one band, so an exact-match bucket join on
# (band, band_value) finds every qualifying pair; the XOR-popcount verify
# then drops band-collision false positives.  At corpus scale the shuffle
# carries only (band, bval, doc_id, simhash) = 28 B rows, never text, and
# 15-bit band values over md5-derived signatures spread buckets well; dense
# buckets (boilerplate-heavy corpora where one signature dominates) verify
# vectorized inside their shard rather than through per-pair Python.
SIMHASH_BANDS = 4
SIMHASH_HAM_MAX = SIMHASH_BANDS - 1
_SIMHASH_BAND_BITS = 60 // SIMHASH_BANDS
_SIMHASH_BAND_MASK = (1 << _SIMHASH_BAND_BITS) - 1


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR — numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x -= (x >> np.uint64(1)) & m1
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _simhash_band_rows_fn(ns: int):
    def _simhash_band_rows(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sig = np.asarray(b["simhash"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n = len(ids)
        bands = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int32), n)
        sig_rep = np.repeat(sig, SIMHASH_BANDS)
        bval = ((sig_rep.astype(np.uint64)
                 >> (bands.astype(np.uint64) * np.uint64(_SIMHASH_BAND_BITS)))
                & np.uint64(_SIMHASH_BAND_MASK)).astype(np.int64)
        shard = ((bval * 131 + bands) % ns).astype(np.int64)
        return pa.table({"doc_id": pa.array(np.repeat(ids, SIMHASH_BANDS)),
                         "simhash": pa.array(sig_rep),
                         "band": pa.array(bands),
                         "bval": pa.array(bval),
                         "shard": pa.array(shard)})

    return _simhash_band_rows


_SIMHASH_PAIRS_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                                   ("hamming", pa.int64())])


def simhash_near_pairs(ds):
    """(doc_a < doc_b) pairs with SimHash hamming distance <= 3 over the
    near-augmented docs: band explode -> sharded bucket self-join ->
    vectorized XOR-popcount verify -> distinct.  Signatures ride along with
    the band rows (8 extra bytes/row) so verification needs no join back to
    a signature table."""

    def per_shard(df: pd.DataFrame) -> pa.Table:
        dup = df[df.duplicated(["band", "bval"], keep=False)]
        if len(dup) == 0:
            return _SIMHASH_PAIRS_SCHEMA.empty_table()
        m = dup.merge(dup, on=["band", "bval"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if len(m) == 0:
            return _SIMHASH_PAIRS_SCHEMA.empty_table()
        ham = _popcount_u64(np.bitwise_xor(
            m["simhash_x"].to_numpy().astype(np.uint64),
            m["simhash_y"].to_numpy().astype(np.uint64)))
        keep = ham <= SIMHASH_HAM_MAX
        return pa.table({"doc_a": pa.array(m["doc_id_x"].to_numpy()[keep], pa.int64()),
                         "doc_b": pa.array(m["doc_id_y"].to_numpy()[keep], pa.int64()),
                         "hamming": pa.array(ham[keep])})

    from ray.data.aggregate import Min

    rows = (ds.map_batches(augment_near_batch, batch_format="pyarrow")
            .map_batches(simhash_batch, batch_format="pyarrow", batch_size=8192)
            .map_batches(_simhash_band_rows_fn(n_shards()),
                         batch_format="pyarrow"))
    cand = rows.groupby("shard").map_groups(per_shard, batch_format="pandas")
    # a pair can match in several bands (and therefore several shards):
    # dedupe on the pair; hamming is identical across matches so Min keeps it
    return cand.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def simhash_near_pairs_sql(table: str = "documents") -> str:
    return f"""
WITH aug AS ({augment_near_sql(table)}),
toks AS (SELECT doc_id, unnest({_TOKS_EXPR}) AS tok FROM aug),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
      FROM toks WHERE tok <> ''),
bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM h, UNNEST(generate_series(0, 59)) AS g(j)
  GROUP BY doc_id, j
),
s AS (SELECT doc_id,
             SUM(CASE WHEN c > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
      FROM bits GROUP BY doc_id),
sig AS (SELECT a.doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash
        FROM aug a LEFT JOIN s ON s.doc_id = a.doc_id),
bands AS (SELECT doc_id, simhash, b,
                 (simhash >> ({_SIMHASH_BAND_BITS} * b)) & {_SIMHASH_BAND_MASK} AS bval
          FROM sig, UNNEST(generate_series(0, {SIMHASH_BANDS - 1})) AS g(b)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sa,
                         b.doc_id AS doc_b, b.simhash AS sb
         FROM bands a JOIN bands b
           ON a.b = b.b AND a.bval = b.bval AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, bit_count(xor(sa, sb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {SIMHASH_HAM_MAX}
"""


# --- benchmark decontamination -----------------------------------------------
DECON_MOD = 5   # originals with doc_id % 5 == 0 form the held-out benchmark
DECON_K = 8     # flag corpus docs sharing any 8-token shingle with the suite


def _kgram_hashes_per_doc(texts, k: int) -> list[np.ndarray]:
    """Per-doc word-k-gram rolling-mix hash arrays (positions kept, duplicate
    grams kept).  Same per-token h60 + MIX_C fold as the MinHash shingles,
    generalized to k tokens, so the DuckDB oracle reproduces every value with
    HUGEINT arithmetic (% 2^64 == uint64 wraparound)."""
    hs, starts, lens = _token_hashes(texts, _TOKEN_H_CACHE)
    out = []
    for d in range(len(texts)):
        L = int(lens[d])
        if L < k:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        seg = hs[starts[d]: starts[d] + L]
        n = L - k + 1
        s = seg[:n].copy()
        for j in range(1, k):
            s *= MIX_C
            s += seg[j: j + n]
        out.append(s)
    return out


def decon_suite_hashes(ds) -> np.ndarray:
    """Sorted distinct DECON_K-gram hash array of the benchmark suite
    (``doc_id % DECON_MOD == 0`` slice of the original documents), built
    distributedly and collected once — suite-sized by definition, never
    corpus-sized.  Shared by :func:`decontaminate` and the composite
    corpus-clean pipeline."""

    def bench_hashes(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
        keep = ids % DECON_MOD == 0
        texts = [t for t, m in zip(b["text"].to_pylist(), keep) if m]
        sh = _kgram_hashes_per_doc(texts, DECON_K)
        u = (np.unique(np.concatenate(sh)) if sh
             else np.empty(0, dtype=np.uint64))
        return pa.table({"s": pa.array(u)})

    parts = ds.map_batches(bench_hashes, batch_format="pyarrow").to_pandas()
    return np.unique(parts["s"].to_numpy().astype(np.uint64))


def decon_hits_per_doc(texts, bench: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (n_grams, n_hits) of DECON_K-gram membership in the sorted
    ``bench`` hash set — the vectorized searchsorted core shared by
    :func:`decontaminate` and the corpus-clean pipeline."""
    sh = _kgram_hashes_per_doc(texts, DECON_K)
    n_grams = np.array([len(a) for a in sh], dtype=np.int64)
    flat = (np.concatenate(sh) if sh else np.empty(0, dtype=np.uint64))
    hit = np.zeros(len(flat), dtype=np.int64)
    if flat.size and bench.size:
        idx = np.searchsorted(bench, flat)
        inb = idx < bench.size
        hit[inb] = (bench[idx[inb]] == flat[inb]).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(hit)])
    bounds = np.concatenate([[0], np.cumsum(n_grams)])
    return n_grams, cum[bounds[1:]] - cum[bounds[:-1]]


def decontaminate(ds):
    """Benchmark decontamination — flag corpus documents that share any
    DECON_K-token shingle with a held-out benchmark suite (the eval-leak
    scrub every training-data build runs; n-gram rule a la Lee et al. /
    GPT-3 appendix C).

    Suite = the ``doc_id % DECON_MOD == 0`` slice of the ORIGINAL documents;
    corpus = the near-dup augmentation minus the suite, so contaminated rows
    exist by construction (the +1M mutated twin of a suite doc keeps its
    8-grams).  Scale shape: a benchmark suite is a FIXED small eval set by
    definition (10^4-10^5 docs however large the corpus), so its distinct
    shingle-hash set is built distributedly, collected once, and broadcast
    via ``ray.put`` — corpus docs then stream through one ``map_batches``
    with a vectorized searchsorted membership test: no join, no shuffle,
    nothing driver-side grows with the corpus."""
    import ray

    from .common import cached_get

    bref = ray.put(decon_suite_hashes(ds))

    def flag(b: pa.Table) -> pa.Table:
        bench = cached_get(bref)
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
        corpus = ~((ids % DECON_MOD == 0) & (ids < 1_000_000))
        ids = ids[corpus]
        texts = [t for t, m in zip(b["text"].to_pylist(), corpus) if m]
        n_grams, n_hits = decon_hits_per_doc(texts, bench)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_hits": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array((n_hits > 0).astype(np.int64), pa.int64()),
        })

    return (ds.map_batches(augment_near_batch, batch_format="pyarrow")
            .map_batches(flag, batch_format="pyarrow"))


def suite_coverage(ds):
    """Benchmark-leakage report — the INVERSE view of decontaminate: for
    every held-out suite document, how many of its distinct DECON_K-gram
    shingles appear ANYWHERE in the corpus (the eval-integrity number a
    team publishes next to its benchmark scores).

    Scale shape (nothing corpus-sized leaves the stream): the suite hash
    set broadcasts (suite-sized by definition); the corpus streams ONE
    membership pass emitting only the suite hashes it actually contains
    (per-batch distinct, bounded by the suite); a (hash) groupby reduces
    them to the found-set, which broadcasts back for one suite-side pass
    computing per-doc coverage.  Suite docs with no shingles (< DECON_K
    tokens) drop, mirroring the oracle's inner derivation."""
    import ray

    from ray.data.aggregate import Count

    from .common import cached_get

    bref = ray.put(decon_suite_hashes(ds))

    def found_partial(b: pa.Table) -> pa.Table:
        bench = cached_get(bref)
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
        corpus = ~((ids % DECON_MOD == 0) & (ids < 1_000_000))
        texts = [t for t, m in zip(b["text"].to_pylist(), corpus) if m]
        sh = _kgram_hashes_per_doc(texts, DECON_K)
        flat = (np.concatenate(sh) if sh else np.empty(0, dtype=np.uint64))
        if not (flat.size and bench.size):
            return pa.table({"s": pa.array(np.empty(0, np.uint64))})
        idx = np.searchsorted(bench, flat)
        idx[idx >= len(bench)] = len(bench) - 1
        hits = flat[bench[idx] == flat]
        return pa.table({"s": pa.array(np.unique(hits))})

    found_df = (ds.map_batches(augment_near_batch, batch_format="pyarrow")
                .map_batches(found_partial, batch_format="pyarrow")
                .groupby("s").aggregate(Count(alias_name="n"))
                .to_pandas())  # bounded by the SUITE hash count
    found = (np.sort(found_df["s"].to_numpy().astype(np.uint64))
             if len(found_df) else np.empty(0, dtype=np.uint64))
    fref = ray.put(found)

    def per_suite_doc(b: pa.Table) -> pa.Table:
        fnd = cached_get(fref)
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
        keep = ids % DECON_MOD == 0
        ids = ids[keep]
        texts = [t for t, m in zip(b["text"].to_pylist(), keep) if m]
        sh = [np.unique(a) for a in _kgram_hashes_per_doc(texts, DECON_K)]
        out_i, out_n, out_c = [], [], []
        for i, a in zip(ids, sh):
            if not len(a):
                continue  # no shingles: absent from the oracle too
            if fnd.size:
                j = np.searchsorted(fnd, a)
                j[j >= len(fnd)] = len(fnd) - 1
                cov = int((fnd[j] == a).sum())
            else:
                cov = 0
            out_i.append(int(i))
            out_n.append(len(a))
            out_c.append(cov)
        return pa.table({
            "doc_id": pa.array(out_i, pa.int64()),
            "n_shingles": pa.array(out_n, pa.int64()),
            "n_covered": pa.array(out_c, pa.int64()),
            "covered_pct": pa.array(
                [(100 * c) // n for c, n in zip(out_c, out_n)], pa.int64()),
        })

    return ds.map_batches(per_suite_doc, batch_format="pyarrow")


def suite_coverage_sql(table: str = "documents") -> str:
    from .text import TOKS_SQL

    fold = _kgram_fold_sql(DECON_K)
    k, mod = DECON_K, DECON_MOD
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM ({augment_near_sql(table)})
  WHERE NOT (doc_id % {mod} = 0 AND doc_id < 1000000)
),
ct AS (SELECT {TOKS_SQL} AS t FROM corpus),
csh AS (
  SELECT DISTINCT {fold} AS s
  FROM ct, UNNEST(generate_series(1, len(t) - {k - 1})) AS u(i)
  WHERE len(t) >= {k}
),
bt AS (SELECT doc_id, {TOKS_SQL} AS t FROM {table} WHERE doc_id % {mod} = 0),
bsh AS (
  SELECT DISTINCT doc_id, {fold} AS s
  FROM bt, UNNEST(generate_series(1, len(t) - {k - 1})) AS u(i)
  WHERE len(t) >= {k}
),
cov AS (
  SELECT b.doc_id, count(*)::BIGINT AS n_shingles,
         count(c.s)::BIGINT AS n_covered
  FROM bsh b LEFT JOIN csh c ON c.s = b.s
  GROUP BY 1
)
SELECT doc_id, n_shingles, n_covered,
       ((100 * n_covered) // n_shingles)::BIGINT AS covered_pct
FROM cov
"""


def _kgram_fold_sql(k: int) -> str:
    C, M = int(MIX_C), _M64
    s = _h60_sql("t[i]")
    for j in range(1, k):
        s = f"(({s}) * {C} + {_h60_sql(f't[i+{j}]')}) % {M}"
    return s


def decontaminate_sql(table: str = "documents") -> str:
    from .text import TOKS_SQL  # the filtered tokenizer (== ascii_tokens)

    fold = _kgram_fold_sql(DECON_K)
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM ({augment_near_sql(table)})
  WHERE NOT (doc_id % {DECON_MOD} = 0 AND doc_id < 1000000)
),
bt AS (SELECT doc_id, {TOKS_SQL} AS t FROM {table} WHERE doc_id % {DECON_MOD} = 0),
bsh AS (
  SELECT DISTINCT {fold} AS s
  FROM bt, UNNEST(generate_series(1, len(t) - {DECON_K - 1})) AS u(i)
  WHERE len(t) >= {DECON_K}
),
ct AS (SELECT doc_id, {TOKS_SQL} AS t FROM corpus),
csh AS (
  SELECT doc_id, {fold} AS s
  FROM ct, UNNEST(generate_series(1, len(t) - {DECON_K - 1})) AS u(i)
  WHERE len(t) >= {DECON_K}
),
hits AS (SELECT doc_id, count(*)::BIGINT AS n_hits
         FROM csh WHERE s IN (SELECT s FROM bsh) GROUP BY 1)
SELECT ct.doc_id,
       greatest(len(ct.t) - {DECON_K - 1}, 0)::BIGINT AS n_grams,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END)::BIGINT AS contaminated
FROM ct LEFT JOIN hits h USING (doc_id)
"""


def near_dedup_survivors(ds, ckpt_key: str | None = None, augment_fn=None):
    """End-to-end near-dedup: documents of the augmented table that survive
    MinHash-LSH + Jaccard dedup — for each verified near-dup pair the
    LARGER doc_id drops (keep-first-by-id policy).

    Distributed anti-join: the dropped ids (verified ``doc_b`` rows) hash-
    join against the augmented doc ids (``Dataset.join`` left_outer, then a
    null filter).  No process ever holds the full drop set — at realistic
    100-TB dup rates (30-50% of the corpus) a driver-side Python set would
    be billions of int64s.  Only (doc_id) keys shuffle, never text."""
    from .common import drop_empty_blocks

    pairs = drop_empty_blocks(jaccard_verified_pairs(
        ds, ckpt_key=ckpt_key, augment_fn=augment_fn).materialize())
    aug = ds.map_batches(augment_fn or augment_near_batch,
                         batch_format="pyarrow").map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    if pairs.count() == 0:  # nothing verified: everything survives
        return aug

    def drop_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"doc_id": b["doc_b"],
                         "dropped": pa.array(np.ones(n, dtype=np.int8))})

    drop = pairs.map_batches(drop_rows, batch_format="pyarrow")
    joined = aug.join(drop, join_type="left_outer",
                      num_partitions=cap_join_partitions(16),
                      on=("doc_id",))

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # a doc dropped by SEVERAL pairs matches several drop rows; all of
        # them are filtered out here, and each survivor appears exactly once
        return b.filter(pc.is_null(b["dropped"])).select(["doc_id"])

    return joined.map_batches(keep, batch_format="pyarrow")


def near_dedup_survivors_sql(table: str = "documents") -> str:
    return f"""
WITH {_verified_cte(table)}
SELECT doc_id FROM aug WHERE doc_id NOT IN (SELECT doc_b FROM verified)
"""


def hash_min_components(edges_ds, node_col: str = "u", nbr_col: str = "v",
                        num_partitions: int = 8):
    """Distributed connected components over an undirected edge Dataset:
    "hash-min" label propagation (Rastogi et al., Finding Connected
    Components in Map-Reduce).  Returns one (node, cluster_id) row per
    distinct node, cluster_id = the minimum node id in its component.

    Each round is two hash joins — one-hop propagation (edges x labels) plus
    a POINTER JUMP (labels x labels: label(u) -> label(label(u)), the
    classic doubling step) — and a (node) groupby-min; labels and edges
    never leave the object store, and the driver sees ONE int64 aggregate
    per round.  Labels only ever decrease, so ``sum(label)`` is strictly
    decreasing until the fixpoint — equality of consecutive sums is an EXACT
    convergence test, not a heuristic.  The jump doubles the propagated
    distance per round, so rounds = O(log diameter) (near-dup cliques: 1-2
    rounds; an adversarial 200-link chain: ~8).  ``num_partitions`` sizes
    the per-round join exchange: keep it ~edge-blocks at real scale (the
    default suits the sandbox's verified-pair volumes)."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from .common import drop_empty_blocks

    num_partitions = cap_join_partitions(num_partitions)

    def both_dirs(b: pa.Table) -> pa.Table:
        u = np.asarray(b[node_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        v = np.asarray(b[nbr_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({"node": pa.array(np.concatenate([u, v])),
                         "nbr": pa.array(np.concatenate([v, u]))})

    def _relabel(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "label": b["min(lbl)"]})

    edges = drop_empty_blocks(
        edges_ds.map_batches(both_dirs, batch_format="pyarrow").materialize())
    if edges.count() == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "label": pa.array([], pa.int64())}))

    def self_loops(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "lbl": b["node"]})

    # round 1: label(u) = min(u, neighbors(u))
    labels = drop_empty_blocks(
        edges.map_batches(
            lambda b: pa.table({"node": b["node"], "lbl": b["nbr"]}),
            batch_format="pyarrow")
        .union(edges.map_batches(self_loops, batch_format="pyarrow"))
        .groupby("node").aggregate(Min("lbl"))
        .map_batches(_relabel, batch_format="pyarrow")
        .materialize())
    prev_sum = labels.aggregate(Sum("label"))["sum(label)"]

    converged = False
    for rnd in range(64):  # O(log diameter) with the jump stream; test below
        # one-hop propagation: each edge carries its endpoint's label across
        msgs = (edges.join(labels, join_type="inner",
                           num_partitions=num_partitions, on=("node",))
                .map_batches(lambda b: pa.table({"node": b["nbr"],
                                                 "lbl": b["label"]}),
                             batch_format="pyarrow"))
        if rnd >= 2:
            # pointer jump: label(u) -> label(label(u)) (labels are node ids
            # by construction, so the self-join always hits).  Doubling the
            # propagation distance per round turns O(diameter) convergence
            # into O(log diameter) — a 64-round cap covers any finite graph.
            # Deferred to round 3+: typical near-dup components (cliques,
            # short chains) converge in 1-2 hop-only rounds, and each extra
            # join carries real actor-pool setup cost per round.
            jt = labels.map_batches(
                lambda b: pa.table({"jnode": b["node"], "jlbl": b["label"]}),
                batch_format="pyarrow")
            msgs = msgs.union(
                labels.join(jt, join_type="inner",
                            num_partitions=num_partitions,
                            on=("label",), right_on=("jnode",))
                .map_batches(lambda b: pa.table({"node": b["node"],
                                                 "lbl": b["jlbl"]}),
                             batch_format="pyarrow"))
        labels = drop_empty_blocks(
            msgs
            .union(labels.map_batches(
                lambda b: pa.table({"node": b["node"], "lbl": b["label"]}),
                batch_format="pyarrow"))
            .groupby("node").aggregate(Min("lbl"))
            .map_batches(_relabel, batch_format="pyarrow")
            .materialize())
        new_sum = labels.aggregate(Sum("label"))["sum(label)"]
        if new_sum == prev_sum:  # min-monotone: equal sum <=> no label moved
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # unreachable for any graph with diameter < 2^64; never return
        # partially-propagated (wrong) labels
        raise RuntimeError("hash_min_components did not converge in 64 rounds")
    return labels


def dup_clusters(ds, ckpt_key: str | None = None):
    """Near-duplicate CLUSTER assignment: connected components over the
    verified near-dup pair graph.  Every doc that appears in at least one
    verified pair gets ``cluster_id`` = the smallest doc_id in its
    component — the canonical-representative form a training-data pipeline
    feeds into per-cluster sampling / keep-one policies (survivor lists
    alone lose the grouping).

    Reuses the checkpointed verified pairs (one tokenize+MinHash per input
    across the jaccard / survivors / clusters chain) and the distributed
    hash-min component kernel above; only (doc_id, doc_id) edges and
    (doc_id, label) rows ever shuffle."""
    from .common import drop_empty_blocks

    pairs = drop_empty_blocks(
        jaccard_verified_pairs(ds, ckpt_key=ckpt_key).materialize())

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["node"], "cluster_id": b["label"]})

    return hash_min_components(pairs, node_col="doc_a", nbr_col="doc_b").map_batches(
        rename, batch_format="pyarrow")


def dup_clusters_sql(table: str = "documents") -> str:
    """Oracle: recursive transitive closure over the symmetric verified-pair
    edge set, then min reachable id per node."""
    return f"""
WITH RECURSIVE {_verified_cte(table)},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION SELECT doc_b, doc_a FROM verified
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
)
SELECT node AS doc_id, MIN(r)::BIGINT AS cluster_id FROM reach GROUP BY node
"""


# argmax packing for the cluster representative: quality (<= 100) in the
# high bits, inverted doc_id in the low REP_ID_BITS, so a single integer
# Max() picks (max quality, then MIN doc_id) — no custom aggregate crosses
# the shuffle.  2^44 covers ~1.7e13 doc ids (augment twins included).
REP_ID_BITS = 44
_REP_ID_MASK = (1 << REP_ID_BITS) - 1


def cluster_representatives(ds, ckpt_key: str | None = None):
    """Keep-BEST-per-cluster dedup policy: for every near-dup cluster, the
    representative is the doc with the highest quality score (tie: smallest
    doc_id) — the quality-aware alternative to ``near_dedup_survivors``'
    keep-first-by-id (what a training-data pipeline actually wants when
    twins differ in cleanliness).  Returns
    (cluster_id, rep_doc_id, rep_quality, n_docs).

    Composition, all distributed: checkpointed verified pairs -> hash-min
    connected components (``dup_clusters``), quality scored per batch over
    the augmented corpus, ONE hash join to attach quality to cluster
    members, then a (cluster_id) groupby where Max over the packed
    (quality, ~doc_id) int64 performs the argmax and Count sizes the
    cluster."""
    from ray.data.aggregate import Count, Max

    from .common import cap_join_partitions, drop_empty_blocks
    from .text import quality_score_batch

    out_schema = pa.schema([("cluster_id", pa.int64()),
                            ("rep_doc_id", pa.int64()),
                            ("rep_quality", pa.int64()),
                            ("n_docs", pa.int64())])

    clusters = drop_empty_blocks(
        dup_clusters(ds, ckpt_key=ckpt_key).materialize())
    if clusters.count() == 0:
        return out_schema.empty_table()

    quality = (ds.map_batches(augment_near_batch, batch_format="pyarrow")
               .map_batches(quality_score_batch, batch_format="pyarrow"))

    joined = clusters.join(quality, join_type="inner",
                           num_partitions=cap_join_partitions(16),
                           on=("doc_id",))

    def pack(b: pa.Table) -> pa.Table:
        q = np.asarray(b["quality"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table({"cluster_id": b["cluster_id"],
                         "packed": pa.array((q << REP_ID_BITS)
                                            | (_REP_ID_MASK - d))})

    def decode(b: pa.Table) -> pa.Table:
        packed = np.asarray(b["packed"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        return pa.table({
            "cluster_id": b["cluster_id"],
            "rep_doc_id": pa.array(_REP_ID_MASK - (packed & _REP_ID_MASK)),
            "rep_quality": pa.array(packed >> REP_ID_BITS),
            "n_docs": b["n_docs"],
        }, schema=out_schema)

    return (joined.map_batches(pack, batch_format="pyarrow")
            .groupby("cluster_id")
            .aggregate(Max("packed", alias_name="packed"),
                       Count(alias_name="n_docs"))
            .map_batches(decode, batch_format="pyarrow"))


def cluster_representatives_sql(table: str = "documents") -> str:
    from .text import quality_score_sql

    q_inner = quality_score_sql("aug", cte_prefix="q_")
    return f"""
WITH RECURSIVE {_verified_cte(table)},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION SELECT doc_b, doc_a FROM verified
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
),
clusters AS (
  SELECT node AS doc_id, MIN(r)::BIGINT AS cluster_id FROM reach GROUP BY node
),
q AS ({q_inner}),
ranked AS (
  SELECT c.cluster_id, q.doc_id, q.quality,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, q.doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_id)::BIGINT AS n_docs
  FROM clusters c JOIN q ON q.doc_id = c.doc_id)
SELECT cluster_id, doc_id AS rep_doc_id, quality::BIGINT AS rep_quality,
       n_docs
FROM ranked WHERE rn = 1
"""


# --- corpus-wide duplicated n-gram statistics --------------------------------
DUPGRAM_K = 8  # same granularity as the decontamination rule


def dup_ngram_stats(ds):
    """Exact duplicated-substring statistics at fixed k-token granularity —
    the corpus-level repeated-n-gram signal of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (``repetition_stats`` is the
    WITHIN-doc variant; this one is the corpus-wide self-join): for every
    doc of the near-augmented corpus, how many of its DUPGRAM_K-gram
    occurrences also occur anywhere else in the corpus (total occurrence
    count > 1), plus the per-mille ratio.  Twin docs share every gram of
    their common prefix by construction, so the signal is non-trivial.

    Scale shape — unlike :func:`decontaminate` (whose membership side is a
    fixed SMALL eval suite, so one broadcast set is right), the dup-gram
    table here is corpus-sized, so nothing is collected or broadcast, and
    the whole computation is ONE all-to-all of 32-byte rows:

    1. one tokenize pass emits ``(gshard, doc_id, gh, m)`` rows — ``m`` =
       within-doc occurrence count, final immediately because a doc lives
       in exactly one batch;
    2. rows exchange ONCE on ``gshard = gh % N_GH_SHARDS`` (all occurrences
       of a gram meet in one shard), where a vectorized sort + run-length
       pass computes global gram totals and folds them straight into
       per-doc partials — no second shuffle, no hash join (a previous
       formulation shipped the same rows through a (gh) groupby AND a
       gh-keyed ``Dataset.join`` and measured 2.2x slower at sf0.1);
    3. a tiny ``(doc_id)`` groupby-sum merges the per-shard partials.

    ``N_GH_SHARDS`` bounds the per-group pandas frame (total occurrences /
    shards); size it to cluster cores at real scale like the other sharded
    kernels (sessionize, url dedup).  Docs with fewer than DUPGRAM_K tokens
    have no grams and are absent from the output on both sides.
    """
    from ray.data.aggregate import Sum

    N_GH_SHARDS = n_shards()

    _EXPLODE_SCHEMA = pa.schema([
        ("gshard", pa.int64()), ("doc_id", pa.int64()),
        ("gh", pa.int64()), ("m", pa.int64())])

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
        grams = _kgram_hashes_per_doc(b["text"].to_pylist(), DUPGRAM_K)
        out_id, out_gh, out_m = [], [], []
        for i, g in zip(ids, grams):
            if g.size == 0:
                continue
            u, m = np.unique(g, return_counts=True)
            out_id.append(np.full(u.size, i, dtype=np.int64))
            out_gh.append(u)
            out_m.append(m.astype(np.int64))
        if not out_id:
            return _EXPLODE_SCHEMA.empty_table()
        gh = np.concatenate(out_gh)  # uint64
        return pa.table({
            "gshard": pa.array((gh % N_GH_SHARDS).astype(np.int64)),
            "doc_id": pa.array(np.concatenate(out_id)),
            "gh": pa.array(gh.view(np.int64)),  # bit view: shard key only
            "m": pa.array(np.concatenate(out_m))})

    occ = ds.map_batches(augment_near_batch, batch_format="pyarrow").map_batches(
        explode, batch_format="pyarrow")

    _DOC_PARTIAL_SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("n_grams", pa.int64()),
        ("n_dup_grams", pa.int64())])

    def per_shard(df: pd.DataFrame) -> pa.Table:
        gh = df["gh"].to_numpy()
        doc = df["doc_id"].to_numpy()
        m = df["m"].to_numpy()
        order = np.argsort(gh, kind="stable")
        ghs, docs_, ms = gh[order], doc[order], m[order]
        bnd = np.concatenate([[0], np.flatnonzero(ghs[1:] != ghs[:-1]) + 1])
        run_len = np.diff(np.concatenate([bnd, [ghs.size]]))
        cnt_per_occ = np.repeat(np.add.reduceat(ms, bnd), run_len)
        dup_m = np.where(cnt_per_occ > 1, ms, 0)
        u, inv = np.unique(docs_, return_inverse=True)
        n = np.zeros(u.size, dtype=np.int64)
        d = np.zeros(u.size, dtype=np.int64)
        np.add.at(n, inv, ms)
        np.add.at(d, inv, dup_m)
        return pa.Table.from_arrays([pa.array(u), pa.array(n), pa.array(d)],
                                    schema=_DOC_PARTIAL_SCHEMA)

    agg = (occ.groupby("gshard").map_groups(per_shard, batch_format="pandas")
           .groupby("doc_id").aggregate(
               Sum("n_grams", alias_name="n_grams"),
               Sum("n_dup_grams", alias_name="n_dup_grams")))

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n_grams"].to_numpy(zero_copy_only=False))
        d = np.asarray(b["n_dup_grams"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": b["doc_id"], "n_grams": b["n_grams"],
                         "n_dup_grams": b["n_dup_grams"],
                         "dup_pm": pa.array(d * 1000 // n, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def dup_ngram_stats_sql(table: str = "documents") -> str:
    from .text import TOKS_SQL

    fold = _kgram_fold_sql(DUPGRAM_K)
    return f"""
WITH aug AS ({augment_near_sql(table)}),
ct AS (SELECT doc_id, {TOKS_SQL} AS t FROM aug),
grams AS (
  SELECT doc_id, {fold} AS gh
  FROM ct, UNNEST(generate_series(1, len(t) - {DUPGRAM_K - 1})) AS u(i)
  WHERE len(t) >= {DUPGRAM_K}
),
tot AS (SELECT gh, count(*)::BIGINT AS cnt FROM grams GROUP BY 1),
per_doc AS (
  SELECT g.doc_id,
         count(*)::BIGINT AS n_grams,
         coalesce(sum(CASE WHEN t.cnt > 1 THEN 1 ELSE 0 END), 0)::BIGINT AS n_dup_grams
  FROM grams g JOIN tot t USING (gh) GROUP BY 1
)
SELECT doc_id, n_grams, n_dup_grams,
       (n_dup_grams * 1000 // n_grams)::BIGINT AS dup_pm
FROM per_doc
"""


# --- corpus-level duplicate-paragraph removal --------------------------------
# The CCNet / Lee-et-al. boilerplate scrub: a paragraph is dropped wherever
# it occurs EXCEPT its globally-first occurrence (order = (doc_id, pos)).
# The fixture texts carry no newlines, so — like the dedup family's other
# augmentations — boilerplate paragraphs are injected deterministically
# (md5-selected ~31% of docs append one of two banners, ~12% also prepend
# the other), built byte-identically in the engine and the SQL oracle.

_PAR_SEP = "\n\n"
_PAR_BOILER = ["Subscribe to our newsletter for daily updates.",
               "All rights reserved. Terms of service apply."]
_PAR_ROWS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("pos", pa.int64()), ("phash", pa.int64()),
    ("key", pa.int64()), ("n_pars", pa.int64()), ("ptext", pa.string()),
])


def _augment_paragraphs(ids, texts):
    out = []
    for d, t in zip(ids, texts):
        hx = hashlib.md5(f"pb|{d}".encode()).hexdigest()
        t = t or ""
        if hx[0] in "01234":
            t = t + _PAR_SEP + _PAR_BOILER[int(hx[1], 16) % 2]
        if hx[2] in "01":
            t = _PAR_BOILER[(int(hx[1], 16) + 1) % 2] + _PAR_SEP + t
        out.append(t)
    return out


def paragraph_dedup(ds):
    """Sub-document dedup: split every doc into paragraphs, keep each
    distinct paragraph only at its globally-first (doc_id, pos) occurrence,
    and rebuild the scrubbed docs.  Returns (doc_id, n_pars, n_kept,
    clean_md5) for every doc that keeps at least one paragraph (a doc whose
    every paragraph appeared earlier vanishes, exactly like the oracle).

    Distributed shape: paragraph rows carry an md5-h60 ``phash``; the
    winner per hash is a packed int64 ``Min`` on ONE (phash) groupby (no
    text moves); kept rows are selected by a phash-keyed hash
    ``Dataset.join`` (both sides O(paragraphs), partitions capped); docs
    rebuild in a doc-sharded pandas pass.  Nothing corpus-sized touches the
    driver."""
    NS = n_shards()  # cluster-derived (VERDICT r3 #3)
    from ray.data.aggregate import Min

    from .common import drop_empty_blocks

    def par_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        aug = _augment_paragraphs(ids, b["text"].to_pylist())
        d_, p_, h_, k_, n_, t_ = [], [], [], [], [], []
        for d, t in zip(ids, aug):
            pars = t.split(_PAR_SEP)
            for i, ptxt in enumerate(pars, start=1):
                d_.append(d)
                p_.append(i)
                h_.append(int(hashlib.md5(ptxt.encode("utf-8")).hexdigest()[:15], 16))
                k_.append(d * 64 + i)
                n_.append(len(pars))
                t_.append(ptxt)
        return pa.table({"doc_id": pa.array(d_, pa.int64()),
                         "pos": pa.array(p_, pa.int64()),
                         "phash": pa.array(h_, pa.int64()),
                         "key": pa.array(k_, pa.int64()),
                         "n_pars": pa.array(n_, pa.int64()),
                         "ptext": pa.array(t_, pa.string())}
                        ).cast(_PAR_ROWS_SCHEMA)

    pars = ds.map_batches(par_rows, batch_format="pyarrow")

    def hash_key_only(b: pa.Table) -> pa.Table:
        return b.select(["phash", "key"]).replace_schema_metadata(None)

    def add_pshard(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "phash" not in b.column_names:
            return pa.schema([("pshard", pa.int64()), ("phash", pa.int64()),
                              ("key", pa.int64())]).empty_table()
        shard = (np.asarray(b["phash"].to_numpy(zero_copy_only=False))
                 % NS).astype(np.int64)
        return b.add_column(0, "pshard", pa.array(shard))

    def shard_min(df: pd.DataFrame) -> pa.Table:
        # phash % 64 shard exchange + per-shard C hash min (the big_orders
        # move — no sort over the distinct-paragraph domain)
        g = df.groupby("phash", sort=False)["key"].min().reset_index()
        g = g.rename(columns={"key": "minkey"})
        return pa.Table.from_pandas(g, preserve_index=False, schema=pa.schema(
            [("phash", pa.int64()), ("minkey", pa.int64())])
        ).replace_schema_metadata(None)

    winners = drop_empty_blocks(
        pars.map_batches(hash_key_only, batch_format="pyarrow")
        .map_batches(add_pshard, batch_format="pyarrow")
        .groupby("pshard").map_groups(shard_min, batch_format="pandas")
        .materialize())
    joined = pars.join(winners, join_type="inner",
                       num_partitions=cap_join_partitions(16), on=("phash",))

    def keep_kept(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = b.filter(pc.equal(b["key"], b["minkey"]))
        sh = pc.cast(pc.bit_wise_and(kept["doc_id"], 63), pa.int64())
        return kept.select(["doc_id", "pos", "n_pars", "ptext"]
                           ).append_column("dshard", sh)

    kept = ds_kept = joined.map_batches(keep_kept, batch_format="pyarrow")

    def rebuild(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["doc_id", "pos"], kind="stable")
        g = df.groupby("doc_id", sort=False)
        out = g.agg(n_pars=("n_pars", "first"), n_kept=("pos", "size"),
                    clean=("ptext", lambda s: _PAR_SEP.join(s))).reset_index()
        out["clean_md5"] = [hashlib.md5(t.encode("utf-8")).hexdigest()
                            for t in out["clean"]]
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "n_pars": pa.array(out["n_pars"].to_numpy(), pa.int64()),
            "n_kept": pa.array(out["n_kept"].to_numpy(), pa.int64()),
            "clean_md5": pa.array(out["clean_md5"].tolist(), pa.string()),
        })

    return (ds_kept.groupby("dshard")
            .map_groups(rebuild, batch_format="pandas"))


def paragraph_dedup_sql(table: str = "documents") -> str:
    sep = "chr(10) || chr(10)"
    b0 = _PAR_BOILER[0].replace("'", "''")
    b1 = _PAR_BOILER[1].replace("'", "''")
    return f"""
WITH a AS (
  SELECT doc_id,
         CASE WHEN substr(md5('pb' || chr(124) || CAST(doc_id AS VARCHAR)), 3, 1)
                   IN ('0','1')
              THEN (CASE WHEN (('0x' || substr(md5('pb' || chr(124) ||
                        CAST(doc_id AS VARCHAR)), 2, 1))::INT + 1) % 2 = 0
                    THEN '{b0}' ELSE '{b1}' END) || {sep} ELSE '' END
         ||
         coalesce(text, '')
         ||
         CASE WHEN substr(md5('pb' || chr(124) || CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4')
              THEN {sep} || (CASE WHEN ('0x' || substr(md5('pb' || chr(124) ||
                        CAST(doc_id AS VARCHAR)), 2, 1))::INT % 2 = 0
                    THEN '{b0}' ELSE '{b1}' END) ELSE '' END AS t
  FROM {table}
),
pars AS (
  SELECT doc_id, u.i::BIGINT AS pos, u.p AS ptext
  FROM a, LATERAL (SELECT unnest(string_split(t, {sep})) AS p,
                          unnest(generate_series(1, len(string_split(t, {sep})))) AS i) u
),
h AS (
  SELECT *, ('0x' || substr(md5(ptext), 1, 15))::BIGINT AS phash,
         doc_id * 64 + pos AS key
  FROM pars
),
w AS (SELECT phash, min(key) AS minkey FROM h GROUP BY 1),
kept AS (SELECT h.* FROM h JOIN w ON h.phash = w.phash AND h.key = w.minkey),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_pars FROM h GROUP BY 1)
SELECT k.doc_id, t.n_pars, count(*)::BIGINT AS n_kept,
       md5(string_agg(k.ptext, {sep} ORDER BY k.pos)) AS clean_md5
FROM kept k JOIN tot t USING (doc_id)
GROUP BY k.doc_id, t.n_pars
"""


# --- corpus-level exact-substring scrub ---------------------------------------
def scrub_dup_ngrams(ds):
    """The actual Lee-et-al. exact-substring DEDUP TRANSFORM (not just the
    signal — ``dup_ngram_stats`` measures, this one rewrites): every token
    position covered by a DUPGRAM_K-gram that occurs more than once in the
    whole corpus is removed, and the scrubbed document is rebuilt from the
    kept tokens.  Output per doc: (n_tokens, n_removed, clean_md5) where
    clean_md5 fingerprints the space-joined kept tokens — the md5 only
    matches the oracle if every removed position matches exactly.

    Scale shape (three bounded exchanges, nothing driver-side):

    1. one tokenize pass emits (gshard, gh, doc_id, pos) gram-occurrence
       rows (32 B each);
    2. the ``gshard = gh % N`` exchange computes global gram totals with a
       vectorized sort + run-length pass (same kernel as dup_ngram_stats)
       and keeps only occurrences of duplicated grams — the stream SHRINKS
       here to the dup mass;
    3. a ``doc_id % N`` exchange folds a doc's dup starts into ONE
       (doc_id, starts:list) row, which hash-joins the augmented docs
       (left_outer — text ships exactly once per doc, docs without dups
       pass through with a null starts row);
    4. the final map rebuilds each doc vectorized: a cumsum
       difference-array turns start positions into the coverage mask.
    """
    from .common import drop_empty_blocks
    from .text import ascii_tokens as _toks

    N_GH_SHARDS = n_shards()
    N_DOC_SHARDS = n_shards(32)
    K = DUPGRAM_K

    _OCC_SCHEMA = pa.schema([
        ("gshard", pa.int64()), ("gh", pa.int64()),
        ("doc_id", pa.int64()), ("pos", pa.int64())])

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
        grams = _kgram_hashes_per_doc(b["text"].to_pylist(), K)
        out_id, out_gh, out_pos = [], [], []
        for i, g in zip(ids, grams):
            if g.size == 0:
                continue
            out_id.append(np.full(g.size, i, dtype=np.int64))
            out_gh.append(g)
            out_pos.append(np.arange(g.size, dtype=np.int64))
        if not out_id:
            return _OCC_SCHEMA.empty_table()
        gh = np.concatenate(out_gh)  # uint64
        return pa.table({
            "gshard": pa.array((gh % N_GH_SHARDS).astype(np.int64)),
            "gh": pa.array(gh.view(np.int64)),
            "doc_id": pa.array(np.concatenate(out_id)),
            "pos": pa.array(np.concatenate(out_pos))})

    aug = ds.map_batches(augment_near_batch, batch_format="pyarrow")
    occ = aug.map_batches(explode, batch_format="pyarrow")

    _DUP_START_SCHEMA = pa.schema([
        ("dshard", pa.int64()), ("doc_id", pa.int64()), ("pos", pa.int64())])

    def dup_occurrences(df: pd.DataFrame) -> pa.Table:
        gh = df["gh"].to_numpy()
        order = np.argsort(gh, kind="stable")
        ghs = gh[order]
        bnd = np.concatenate([[0], np.flatnonzero(ghs[1:] != ghs[:-1]) + 1])
        run_len = np.diff(np.concatenate([bnd, [ghs.size]]))
        dup = np.repeat(run_len > 1, run_len)
        keep = order[dup]
        doc = df["doc_id"].to_numpy()[keep]
        return pa.Table.from_arrays(
            [pa.array(doc % N_DOC_SHARDS), pa.array(doc),
             pa.array(df["pos"].to_numpy()[keep])],
            schema=_DUP_START_SCHEMA)

    dups = occ.groupby("gshard").map_groups(dup_occurrences, batch_format="pandas")

    # Acero hash joins reject list-typed payload columns, so the per-doc
    # start positions ride the join as a packed little-endian int64 BINARY
    # blob (same trick as the supercell payloads in stages/knn.py).
    _STARTS_SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("starts", pa.binary())])

    def fold_starts(df: pd.DataFrame) -> pa.Table:
        doc = df["doc_id"].to_numpy()
        pos = df["pos"].to_numpy()
        order = np.argsort(doc, kind="stable")
        doc, pos = doc[order], pos[order]
        bnd = np.concatenate([[0], np.flatnonzero(doc[1:] != doc[:-1]) + 1])
        blobs = [a.astype("<i8").tobytes() for a in np.split(pos, bnd[1:])]
        return pa.Table.from_arrays(
            [pa.array(doc[bnd], pa.int64()), pa.array(blobs, pa.binary())],
            schema=_STARTS_SCHEMA)

    starts = drop_empty_blocks(
        dups.groupby("dshard").map_groups(
            fold_starts, batch_format="pandas").materialize())

    joined = aug.join(starts, join_type="left_outer",
                      num_partitions=cap_join_partitions(16),
                      on=("doc_id",))

    def rebuild(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        starts_col = b["starts"].to_pylist()
        n_tok, n_rm, md = [], [], []
        for t, st in zip(texts, starts_col):
            toks = _toks(t)
            n = len(toks)
            if st:
                diff = np.zeros(n + 1, dtype=np.int64)
                s = np.frombuffer(st, dtype="<i8").astype(np.int64)
                np.add.at(diff, s, 1)
                np.subtract.at(diff, np.minimum(s + K, n), 1)
                covered = np.cumsum(diff[:-1]) > 0
                kept = [x for x, c in zip(toks, covered) if not c]
            else:
                kept = toks
            # NULL text: len(NULL)=NULL in the oracle, so n_tokens and
            # n_removed emit NULL; clean_md5 coalesces to md5('')
            n_tok.append(None if t is None else n)
            n_rm.append(None if t is None else n - len(kept))
            md.append(hashlib.md5(" ".join(kept).encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_removed": pa.array(n_rm, pa.int64()),
            "clean_md5": pa.array(md, pa.string())})

    return joined.map_batches(rebuild, batch_format="pyarrow")


def scrub_dup_ngrams_sql(table: str = "documents") -> str:
    from .text import TOKS_SQL

    K = DUPGRAM_K
    fold = _kgram_fold_sql(K)
    return f"""
WITH aug AS ({augment_near_sql(table)}),
ct AS (SELECT doc_id, {TOKS_SQL} AS t FROM aug),
grams AS (
  SELECT doc_id, u.i AS i, {fold} AS gh
  FROM ct, UNNEST(generate_series(1, len(t) - {K - 1})) AS u(i)
  WHERE len(t) >= {K}
),
tot AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) > 1),
dup_starts AS (SELECT g.doc_id, g.i FROM grams g JOIN tot USING (gh)),
pos AS (
  SELECT doc_id, u.i AS i, t[u.i] AS tok
  FROM ct, UNNEST(generate_series(1, len(t))) AS u(i)
),
covered AS (
  SELECT DISTINCT p.doc_id, p.i
  FROM pos p JOIN dup_starts d
    ON d.doc_id = p.doc_id AND p.i BETWEEN d.i AND d.i + {K - 1}
),
kept AS (
  SELECT p.doc_id, p.i, p.tok
  FROM pos p LEFT JOIN covered c ON c.doc_id = p.doc_id AND c.i = p.i
  WHERE c.doc_id IS NULL
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(tok, ' ' ORDER BY i) AS clean
  FROM kept GROUP BY 1
)
SELECT ct.doc_id,
       len(ct.t)::BIGINT AS n_tokens,
       (len(ct.t) - coalesce(p.n_kept, 0))::BIGINT AS n_removed,
       md5(coalesce(p.clean, '')) AS clean_md5
FROM ct LEFT JOIN per_doc p USING (doc_id)
"""


# --- incremental-ingest near-dedup (new snapshot vs frozen base) -------------
# id ranges: base docs keep their ids; incoming docs derive deterministically
# ABOVE every base id, so "keep the smaller id" IS "base always beats
# incoming, earlier incoming beats later" — the production incremental rule
# falls out of the same pairwise keep-first policy near_dedup_survivors uses.
INCR_OFFSET = 4_000_000
INCR_NEAR_MOD = 7    # % 7 == 2: lightly-edited incoming copy (near-dup)
INCR_EXACT_MOD = 11  # % 11 == 3: byte-identical incoming copy
INCR_FRESH_MOD = 13  # % 13 == 4: genuinely new incoming document
INCR_NEAR_SUFFIX = " incremental revision two"


def derive_incremental_batch(b: pa.Table) -> pa.Table:
    """Base corpus rows + the deterministic incoming snapshot: edited
    copies (near-dups of their base doc), exact copies, and fresh documents
    whose shingles are id-specific (they must survive).  Mirrors
    :func:`derive_incremental_sql` row for row."""
    ids = b["doc_id"].to_pylist()
    texts = b["text"].to_pylist()
    out_i, out_t = list(ids), list(texts)
    for i, t in zip(ids, texts):
        if i % INCR_NEAR_MOD == 2:
            out_i.append(i + INCR_OFFSET)
            out_t.append(None if t is None else t + INCR_NEAR_SUFFIX)
        if i % INCR_EXACT_MOD == 3:
            out_i.append(i + INCR_OFFSET + 1_000_000)
            out_t.append(t)
        if i % INCR_FRESH_MOD == 4:
            out_i.append(i + INCR_OFFSET + 2_000_000)
            out_t.append(f"fresh incremental document {i} "
                         f"alpha{i} beta{i} gamma{i} delta{i}")
    return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                     "text": pa.array(out_t, pa.string())})


def derive_incremental_sql(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, text FROM {table} "
        f"UNION ALL SELECT doc_id + {INCR_OFFSET}, "
        f"text || '{INCR_NEAR_SUFFIX}' FROM {table} "
        f"WHERE doc_id % {INCR_NEAR_MOD} = 2 "
        f"UNION ALL SELECT doc_id + {INCR_OFFSET + 1_000_000}, text "
        f"FROM {table} WHERE doc_id % {INCR_EXACT_MOD} = 3 "
        f"UNION ALL SELECT doc_id + {INCR_OFFSET + 2_000_000}, "
        f"'fresh incremental document ' || doc_id || ' alpha' || doc_id || "
        f"' beta' || doc_id || ' gamma' || doc_id || ' delta' || doc_id "
        f"FROM {table} WHERE doc_id % {INCR_FRESH_MOD} = 4")


def incremental_dedup_survivors(ds, ckpt_key: str | None = None):
    """Incremental-ingest near-dedup — the production shape for a corpus
    that GROWS: which INCOMING documents enter the corpus, given that every
    near-dup of a frozen base doc (or of an earlier-accepted incoming doc)
    must be rejected.  Incoming ids sit above every base id, so the whole
    decision reduces to the same pairwise keep-smaller-id rule as
    :func:`near_dedup_survivors`, run over the union with the SAME banded
    LSH + Jaccard verify chain (``augment_fn`` swaps only the derivation;
    the checkpoint key carries an ``:incr`` suffix so the two chains never
    share a cache).  Output: the accepted incoming doc_ids — exact and
    edited copies of base docs are rejected, fresh documents pass.

    Scale notes: at 10^12 docs the base side's band rows are exactly the
    checkpointed artifact the standard chain already persists — an
    incremental run would reuse them and band only the (much smaller)
    incoming slice; the sandbox derivation regenerates both sides in one
    streamed pass, which keeps the gate hermetic."""
    import pyarrow.compute as pc

    surv = near_dedup_survivors(
        ds, ckpt_key=None if ckpt_key is None else f"{ckpt_key}:incr",
        augment_fn=derive_incremental_batch)
    return surv.map_batches(
        lambda b: b.filter(pc.greater_equal(b["doc_id"], INCR_OFFSET)),
        batch_format="pyarrow")


def incremental_dedup_survivors_sql(table: str = "documents") -> str:
    return f"""
WITH {_verified_cte(table, aug_sql=derive_incremental_sql(table))}
SELECT doc_id FROM aug
WHERE doc_id NOT IN (SELECT doc_b FROM verified)
  AND doc_id >= {INCR_OFFSET}
"""
