"""Pins for documented approximation invariants (ADVICE round 2).

These tests fail LOUDLY if the synthetic data ever drifts outside the regime
where an approximate engine path is exact against its all-pairs SQL oracle:

* near_dup_pairs' 2x8-plane hyperplane blocking must co-bucket EVERY pair
  with cosine >= NEAR_COS_MIN (today all such pairs are positive scalings,
  whose signatures agree in every table);
* the engine/oracle tokenizer pair (Python ``str.split()`` vs RE2 ``\\s+``)
  agrees only on ASCII whitespace — the fixtures must not contain the
  divergent characters (``\\x0b``, NBSP, U+2028, ...) or NULL text.

No Ray needed: both run directly over the parquet fixtures.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_near_dup_blocking_complete():
    """Every exact all-pairs near-dup (cosine >= NEAR_COS_MIN) over the
    augmented embeddings is co-bucketed in at least one hyperplane table —
    the condition under which near_dup_pairs equals the exact SQL oracle."""
    from osm_intersections_ray.stages.similarity import (
        N_DUP_PLANES,
        N_DUP_TABLES,
        NEAR_COS_MIN,
        PLANES_SEED,
        _augment_near,
        _planes,
    )

    for sf in SF_DIRS:
        tbl = pq.read_table(f"{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        aug = _augment_near(tbl)
        m = np.stack([np.asarray(e, np.float64) for e in aug["embedding"].to_pylist()])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = mn @ mn.T
        ai, bi = np.nonzero(np.triu(sims >= NEAR_COS_MIN, k=1))
        assert len(ai) > 0, f"{sf}: fixture lost its near-dup pairs"
        d = m.shape[1]
        sigs = []
        for t in range(N_DUP_TABLES):
            planes = _planes(PLANES_SEED + t, d, N_DUP_PLANES)
            bits = ((m @ planes.T > 0).astype(np.int64)
                    * (1 << np.arange(N_DUP_PLANES))).sum(axis=1)
            sigs.append(bits)
        co = np.zeros(len(ai), dtype=bool)
        for bits in sigs:
            co |= bits[ai] == bits[bi]
        missed = np.flatnonzero(~co)
        assert len(missed) == 0, (
            f"{sf}: {len(missed)} qualifying near-dup pair(s) not co-bucketed "
            f"by any hyperplane table — near_dup_pairs would MISS them vs the "
            f"exact oracle (first: {ai[missed[:3]]} vs {bi[missed[:3]]}). "
            f"Either the generator introduced non-collinear near-dups or the "
            f"plane seeds changed; add a table or a verify fallback.")


# Characters where Python str.split() and RE2's '\\s' class diverge:
# everything Unicode-isspace EXCEPT the ASCII [\t\n\f\r ] they share.
_RE2_WS = set("\t\n\f\r ")


def _divergent_ws(text: str) -> set[str]:
    return {c for c in text if c.isspace() and c not in _RE2_WS}


def test_fixture_ascii_whitespace_invariant():
    """documents.text (and the derived pages text) contains no characters on
    which the Python/RE2 tokenizers disagree, and no NULLs — the invariant
    the minhash/simhash/bpe_token_count oracles rely on (noted next to
    _TOKS_EXPR / bpe_token_count_sql in stages/text.py)."""
    for sf in SF_DIRS:
        col = pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"]
        bad: set[str] = set()
        n_null = 0
        for chunk in col.chunks:
            for v in chunk.to_pylist():
                if v is None:
                    n_null += 1
                else:
                    bad |= _divergent_ws(v)
        assert n_null == 0, f"{sf}: NULL text rows (engine fillna(0) vs SQL NULL)"
        assert not bad, (
            f"{sf}: divergent whitespace chars {sorted(map(hex, map(ord, bad)))} "
            f"in documents.text — Python str.split() and the RE2 \\s+ oracles "
            f"would tokenize differently; normalize the engine tokenizer "
            f"before trusting the hash gate.")
