"""Composite training-data corpus-cleanup pipeline — the three standard
scrubs of a pre-training build chained end-to-end over the near-augmented
corpus (the flagship composition of the dedup/text operator families; each
leg is individually hash-verified by its own driver query):

1. **benchmark decontamination** — drop docs sharing any 8-token shingle
   with the held-out suite (broadcast suite-hash membership, no shuffle);
2. **near-dedup** — drop the larger doc_id of every verified MinHash+LSH /
   Jaccard pair (distributed anti-join; reuses the checkpointed verified
   pairs, so the whole chain tokenizes + MinHashes ONCE per input);
3. **per-lang quality floor** — keep docs at or above the per-language
   median quality of the ORIGINAL documents (exact distributed-histogram
   quantile -> tiny broadcast threshold table).

Scale shape: criteria 1 and 3 fold into ONE streamed ``map_batches`` pass
over the corpus (two broadcast lookups, zero shuffles); criterion 2 is the
single keyed exchange (doc_id anti-join).  Output: surviving
(doc_id, lang, quality) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.common import cap_join_partitions

from ..stages import dedup
from ..stages.text import (
    QUALITY_FILTER_PCT,
    TOKS_SQL,
    quality_score_batch,
    quality_score_sql,
)


def _aug_with_lang(b: pa.Table) -> pa.Table:
    """Near-dup augmentation with the lang column carried: the +1M twin
    inherits its original's lang (same rows as dedup.augment_near_batch)."""
    ids = b["doc_id"].to_pylist()
    texts = b["text"].to_pylist()
    langs = b["lang"].to_pylist()
    out_i, out_t, out_l = list(ids), list(texts), list(langs)
    for i, t, lg in zip(ids, texts, langs):
        if i % dedup.NEAR_DUP_MOD == 0:
            out_i.append(i + 1_000_000)
            out_t.append(t + dedup.NEAR_DUP_SUFFIX)
            out_l.append(lg)
    return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                     "text": pa.array(out_t, pa.string()),
                     "lang": pa.array(out_l, pa.string())})


def clean_corpus(ds, ckpt_key: str | None = None):
    """See module docstring.  ``ds`` = original documents
    (doc_id, text, lang); corpus = near-augmentation minus the benchmark
    suite (identical to ``dedup.decontaminate``'s corpus definition)."""
    import ray

    from ray.data.aggregate import Sum

    from ..stages.common import cached_get, drop_empty_blocks

    # --- stage 1: per-lang quality thresholds over the ORIGINAL docs
    # (lang x 101-value histogram: tiny by construction)
    def hist_partial(b: pa.Table) -> pa.Table:
        q = quality_score_batch(b)["quality"]
        df = pd.DataFrame({"lang": b["lang"].to_pandas(),
                           "q": q.to_numpy(zero_copy_only=False)})
        g = df.groupby(["lang", "q"], sort=False).size().reset_index(name="cnt")
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "q": pa.array(g["q"].to_numpy(), pa.int64()),
                         "cnt": pa.array(g["cnt"].to_numpy(), pa.int64())})

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["lang", "q"]).aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())
    thr: dict[str, int] = {}
    for lang, g in hist.groupby("lang", sort=False):
        g = g.sort_values("q", kind="stable")
        cum = np.cumsum(g["cnt"].to_numpy())
        idx = int(np.searchsorted(cum * 100, QUALITY_FILTER_PCT * int(cum[-1]),
                                  side="left"))
        thr[str(lang)] = int(g["q"].to_numpy()[idx])
    thr_ref = ray.put(thr)

    # --- stage 2: suite shingle hashes (fixed-small eval set -> broadcast)
    bench_ref = ray.put(dedup.decon_suite_hashes(ds))

    # --- stage 3: ONE streamed pass — decontaminate + quality floor
    def keep(b: pa.Table) -> pa.Table:
        bench = cached_get(bench_ref)
        cuts = cached_get(thr_ref)
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
        corpus = ~((ids % dedup.DECON_MOD == 0) & (ids < 1_000_000))
        ids = ids[corpus]
        texts = [t for t, m in zip(b["text"].to_pylist(), corpus) if m]
        langs = pd.Series([x for x, m in zip(b["lang"].to_pylist(), corpus) if m])
        _, n_hits = dedup.decon_hits_per_doc(texts, bench)
        q = quality_score_batch(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string())}))["quality"].to_numpy()
        m = (n_hits == 0) & (q >= langs.map(cuts).to_numpy())
        return pa.table({"doc_id": pa.array(ids[m], pa.int64()),
                         "lang": pa.array(langs[m].to_numpy(), pa.string()),
                         "quality": pa.array(q[m], pa.int64())})

    filtered = (ds.map_batches(_aug_with_lang, batch_format="pyarrow")
                .map_batches(keep, batch_format="pyarrow"))

    # --- stage 4: near-dedup anti-join (the single keyed exchange)
    pairs = drop_empty_blocks(
        dedup.jaccard_verified_pairs(ds, ckpt_key=ckpt_key).materialize())
    if pairs.count() == 0:
        return filtered

    def drop_rows(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_b"],
                         "dropped": pa.array(
                             np.ones(b.num_rows, dtype=np.int8))})

    drop = pairs.map_batches(drop_rows, batch_format="pyarrow")
    joined = filtered.join(drop, join_type="left_outer",
                           num_partitions=cap_join_partitions(16),
                           on=("doc_id",))

    def keep_unmatched(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return (b.filter(pc.is_null(b["dropped"]))
                .select(["doc_id", "lang", "quality"]))

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")


def clean_corpus_sql(table: str = "documents") -> str:
    """Oracle: the same three criteria composed from the shared CTE
    generators (verified pairs, decon shingle folds, quality expression) —
    one statement, bit-exact."""
    fold = dedup._kgram_fold_sql(dedup.DECON_K)
    k, mod = dedup.DECON_K, dedup.DECON_MOD
    corpus_quality = quality_score_sql("corpus").strip()
    orig_quality = quality_score_sql(table).strip()
    return f"""
WITH {dedup._verified_cte(table)},
corpus AS (
  SELECT a.doc_id, a.text, d.lang
  FROM aug a JOIN {table} d ON d.doc_id = a.doc_id % 1000000
  WHERE NOT (a.doc_id % {mod} = 0 AND a.doc_id < 1000000)
),
bt AS (SELECT doc_id, {TOKS_SQL} AS t FROM {table} WHERE doc_id % {mod} = 0),
bsh AS (
  SELECT DISTINCT {fold} AS s
  FROM bt, UNNEST(generate_series(1, len(t) - {k - 1})) AS u(i)
  WHERE len(t) >= {k}
),
ct AS (SELECT doc_id, {TOKS_SQL} AS t FROM corpus),
contaminated AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, {fold} AS s
    FROM ct, UNNEST(generate_series(1, len(t) - {k - 1})) AS u(i)
    WHERE len(t) >= {k}
  ) WHERE s IN (SELECT s FROM bsh)
),
cq AS ({corpus_quality}),
oq AS (
  SELECT s.quality, d.lang
  FROM ({orig_quality}) s JOIN {table} d USING (doc_id)
),
thr AS (
  SELECT lang,
         percentile_disc({QUALITY_FILTER_PCT / 100}) WITHIN GROUP
           (ORDER BY quality) AS cut
  FROM oq GROUP BY lang
)
SELECT c.doc_id, c.lang, q.quality
FROM corpus c JOIN cq q USING (doc_id) JOIN thr USING (lang)
WHERE q.quality >= thr.cut
  AND c.doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND c.doc_id NOT IN (SELECT doc_b FROM verified)
"""
