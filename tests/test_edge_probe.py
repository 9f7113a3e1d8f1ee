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
    # padding rows so ids 16 and 18 exist: the deterministic sampler keeps
    # h60(md5(id)) % 100 < 20, which matches NO id below 16 — without these
    # the sample is empty and an empty Ray dataset cannot carry schema
    "pad ten", "pad eleven", "pad twelve", "pad thirteen", "pad fourteen",
    "pad fifteen", "sampled row sixteen here", "pad seventeen",
    "sampled row eighteen here",
    # PII / sentence-split hostiles (appended so the sampler ids above hold)
    "mail a.b-c%x@ex-ample.co.uk or call 12345678 now; short 123456 stays",
    "two addrs x@y.io z@w.co.uk and digits 99999999999999999999 in one doc",
    "Sentence one. Sentence two. Trailing dot. ",
    ". leading split. double..  dots... and ellipsis .. end.",
    "email@at.end.of.doc@not-an-email 4155551234567 j@k.lm",
    # DuckDB-lower parity hostiles: U+0130 İ (simple 'i' vs Python 'i̇') and
    # final-sigma ΑΣ (simple 'ασ' vs Python's context 'ας')
    "İstanbul ΑΣ ΣΟΦΙΑ İİ the ΒΑΣΙΣ walks σς İstanbul",
    # NULL text (round-4 parity: engine must mask NULL through to the
    # output wherever the SQL does, not fold it to 0-counts)
    None,
]

DOC_QUERIES = [
    "doc_stats", "lang_id", "quality_score", "fingerprint",
    "exact_dedup", "simhash", "bpe_token_count",
    "minhash_lsh_pairs", "near_dup_jaccard", "near_dedup_survivors",
    "incremental_dedup_survivors",
    "image_decode_ppm", "image_decode_png", "audio_decode_wav", "image_resize_ppm",
    "sample_docs", "token_quantiles",
    "redact_pii", "doc_sentences", "quality_filtered_docs",
    "tfidf_top_terms", "dup_clusters", "stratified_sample",
    "simhash_near_pairs", "near_dup_char_ngram", "hll_distinct_shingles",
    "decontaminate", "repetition_stats", "pack_sequences",
    "collocations", "doc_chunks", "graph_pagerank", "bm25_search",
    "cluster_representatives", "lm_score", "inverted_index",
    "image_decode_gif", "image_decode_jpeg", "video_frame_sample",
    "normalize_unicode", "quality_rank", "paragraph_dedup",
    "scrub_dup_ngrams", "linear_fit", "bpe_train", "bpe_apply",
    "doc_stats_melt", "corpus_diff", "image_ahash", "image_dup_pairs",
    "audio_fingerprint", "image_dup_clusters", "image_dedup_survivors",
    "dataset_split", "proportional_sample", "token_budget_sample",
    "near_dup_containment", "minhash_estimate_pairs", "c4_line_filter",
    "suite_coverage",
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
        "n_chars": pa.array([len(t) if t is not None else None
                             for t in EDGE_TEXTS], pa.int64()),
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
    if (len(eng) == 0 and len(eng.columns) == 0
            and isinstance(res, ray.data.Dataset)):
        # this Ray's to_pandas drops the schema of a 0-row dataset even
        # when Dataset.schema() knows it; recover the columns from there
        eng = pd.DataFrame(columns=res.schema().names)
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
    # (user, ts_us offset, event_type, value)
    rows = [
        (1, 0, "a", 0.125),                 # single-event user; half-cent up
        (2, 0, "b", -0.125),                # negative half-cent
        (2, GAP, "a", 1.0),                 # gap EXACTLY threshold: same session
        (2, GAP + 1000, "purchase", 0.5),   # as-of anchor mid-session
        (2, 2 * GAP + 1, "b", 2.675),       # gap threshold+1us: NEW session;
        #                                     prev purchase crosses the session cut
        (3, H - 1, "a", 0.005),             # just before an hour boundary
        (3, H, "a", -0.005),                # exactly on the boundary
        (3, H, "purchase", 1.0),            # SAME ts, higher event_id: the two
        #                                     ts==H events must NOT see it (strict
        #                                     (ts, event_id) ordering)
        (3, H, "b", 99.994999),             # duplicate ts, after the purchase
        (3, H + 10, "a", 2.0),              # sees the ts==H purchase
        (4, 5, "a", 0.0),                   # user with no purchase: -1 sentinel
        (4, 5 + GAP + GAP, "a", 1e6),       # far gap: second session
        # funnel hostiles (view -> click -> purchase, strict ts ordering):
        (5, 100, "view", 1.0),              # funnel start
        (5, 100, "click", 1.0),             # SAME ts as view: must NOT count
        (5, 101, "click", 1.0),             # counts (strictly after)
        (5, 101, "purchase", 1.0),          # same ts as click: must NOT count
        (5, 102, "purchase", 1.0),          # stage 3
        (6, 200, "click", 1.0),             # click BEFORE any view: ignored
        (6, 201, "view", 1.0),              # stage stops at 1 (no later click)
        (7, 300, "purchase", 1.0),          # purchase alone: stage 0
    ]
    # hostile props shapes, cycled over all rows: malformed JSON, wrong key
    # case, negative k, float k (both sides regexp-extract the int prefix),
    # padded whitespace, missing key
    props_cycle = ["{}", '{"k": 5}', '{"k":-7}', '{"k": 12 }', "not json",
                   '{"K": 3}', '{"k": 9.5}', '{"k":0}']
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([base + off for _, off, _, _ in rows], pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, _, t, _ in rows], pa.string()),
        "value": pa.array([v for _, _, _, v in rows], pa.float64()),
        "props": pa.array([props_cycle[i % len(props_cycle)]
                           for i in range(len(rows))], pa.string()),
    })
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["events_hourly", "sessions", "events_sliding",
                                  "asof_prev_purchase", "post_purchase_window",
                                  "funnel_stages", "props_kv_stats",
                                  "events_rollup", "events_pivot",
                                  "user_streaks", "session_cooccurrence",
                                  "event_transitions",
                                  "daily_active_users", "late_arrivals",
                                  "session_concurrency", "events_profile"])
def test_edge_events_vs_oracle(ray_session, edge_events_dir, name):
    _compare(ray_session, edge_events_dir, "events", name)


def test_edge_late_arrivals_out_of_order(ray_session, tmp_path_factory):
    """Watermark-lateness hostiles: an event EQUAL to the watermark (not
    late — strict >), a deeply late event after a far-future event set the
    watermark, a first event (no watermark, never late), and interleaved
    users sharing arrival order."""
    d = tmp_path_factory.mktemp("edge_late")
    rows = [  # (event_id = arrival order, user, ts_us)
        (0, 1, 1000), (1, 1, 5000), (2, 1, 3000),   # late by 2000
        (3, 1, 5000),                                # == watermark: NOT late
        (4, 2, 9000), (5, 2, 100),                   # late by 8900
        (6, 3, 42),                                  # single event
        (7, 2, 9001),                                # back past watermark
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["a"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(d / "events.parquet"))
    _compare(ray_session, str(d), "events", "late_arrivals")

    from osm_intersections_ray.queries import queries

    out = queries()["late_arrivals"](str(d)).to_pandas().set_index("user_id")
    assert out.loc[1, "n_late"] == 1 and out.loc[1, "max_late_us"] == 2000
    assert out.loc[2, "n_late"] == 1 and out.loc[2, "max_late_us"] == 8900
    assert out.loc[3, "n_late"] == 0 and out.loc[3, "max_late_us"] == 0


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


@pytest.mark.parametrize("name", ["knn_cosine", "embedding_near_dup",
                                  "rrf_fusion", "knn_graph",
                                  "embedding_quantize"])
def test_edge_embeddings_vs_oracle(ray_session, edge_emb_dir, name):
    _compare(ray_session, edge_emb_dir, "embeddings", name)


@pytest.fixture(scope="module")
def edge_quant_dir(tmp_path_factory):
    """Degenerate vectors the quantizer must mirror DuckDB on: NULL
    embedding, EMPTY list (list_max([]) / array_to_string([]) are NULL),
    all-zero (scale 0 -> q 0, err 0), singleton, negative-dominant (scale
    from |min|), and a saturating near-max element."""
    d = tmp_path_factory.mktemp("edge_quant")
    vecs = [
        None,                       # NULL embedding
        [],                         # empty list
        [0.0, 0.0, 0.0],            # zero vector
        [2.5],                      # singleton
        [-3.0, 1.5, 0.1],           # |min| sets the scale
        [1e-30, -1e-30, 1e-30],     # tiny magnitudes
        [0.9999999, 1.0, -1.0],     # near-max saturation both signs
        [7.0, 7.0, 7.0],            # constant vector
    ]
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_edge_embedding_quantize_degenerate(ray_session, edge_quant_dir):
    _compare(ray_session, edge_quant_dir, "embeddings", "embedding_quantize")


def test_edge_dataset_split_proportional_null_lang(ray_session, tmp_path_factory):
    """proportional_sample quota edges: a NULL-lang stratum (SQL PARTITION
    BY keeps it), a 1-doc lang (k = ceil(0.1) = 1 keeps the doc), a 10-doc
    lang (k = 1), and an 11-doc lang (k = 2); dataset_split rides the same
    world."""
    d = tmp_path_factory.mktemp("edge_prop")
    langs = ([None] * 3 + ["solo"] + ["ten"] * 10 + ["eleven"] * 11)
    tbl = pa.table({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(len(langs))], pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["edge"] * len(langs), pa.string()),
        "n_chars": pa.array([5] * len(langs), pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    _compare(ray_session, str(d), "documents", "proportional_sample")
    _compare(ray_session, str(d), "documents", "dataset_split")

    # quota sanity on top of the oracle match
    from osm_intersections_ray.queries import queries

    out = queries()["proportional_sample"](str(d)).to_pandas()
    got = out.groupby("lang", dropna=False).size()
    assert got.get("solo") == 1 and got.get("ten") == 1
    assert got.get("eleven") == 2
    assert got[got.index.isna()].sum() == 1  # ceil(3/10) = 1 NULL-lang doc


def test_edge_crawl_corpus_composite(ray_session, tmp_path_factory):
    """crawl_corpus hostiles: two raw urls sharing a canonical form (later
    ts loses), a host over the cap, a below-quality-floor page dropped, an
    articleless page (empty text -> quality 0 -> dropped), and an
    unparseable url dropped by the canonical leg."""
    import duckdb

    from osm_intersections_ray.pipelines.crawl_corpus import (
        crawl_corpus, crawl_corpus_sql)

    rich = ("<article>" + "the and for with this that have from "
            "they will would there their. " * 4 + "</article>")
    d = tmp_path_factory.mktemp("edge_crawl")
    rows = [
        ("https://a.example/x", 100, rich),
        ("HTTPS://A.EXAMPLE:443/x///#frag", 50, rich),   # canonical twin, EARLIER ts: wins
        ("https://big.example/1", 10, rich),
        ("https://big.example/2", 10, rich),
        ("https://big.example/3", 10, rich),
        ("https://big.example/4", 10, rich),             # one of 4 capped out
        ("https://low.example/q", 10, "<article>!!! ??? ...</article>"),  # q 0
        ("https://bare.example/p", 10, "<p>no article tag</p>"),   # empty text
        ("not a url at all", 10, rich),                  # unparseable
    ]
    import datetime

    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array(
            [base + datetime.timedelta(seconds=r[1]) for r in rows],
            pa.timestamp("us", tz="UTC")),
        "html": pa.array([r[2].encode() for r in rows], pa.binary()),
    }), str(d / "pages.parquet"))

    import ray.data as rd

    eng = crawl_corpus(
        rd.read_parquet(str(d / "pages.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(crawl_corpus_sql(
        f"read_parquet('{d}/pages.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o), f"rows {len(e)} vs {len(o)}\n{e}\n{o}"
    assert list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    urls = set(eng["url"])
    # earlier-ts canonical twin wins; the 100-ts duplicate is gone
    assert "HTTPS://A.EXAMPLE:443/x///#frag" in urls
    assert "https://a.example/x" not in urls
    # host cap: exactly 3 of big.example's 4 survive
    assert sum(u.startswith("https://big.example/") for u in urls) == 3
    # quality floor and articleless/unparseable drops
    assert not ({"https://low.example/q", "https://bare.example/p",
                 "not a url at all"} & urls)


def test_edge_c4_line_filter_rules(ray_session, tmp_path_factory):
    """Line-rule hostiles: exactly-5 vs 4 words, quoted terminal, trailing
    CR/blanks after the period, a no-kept-lines doc (clean_md5 NULL =
    array_to_string([])), trailing newline (empty last line), and NULL
    text."""
    d = tmp_path_factory.mktemp("edge_c4")
    texts = [
        ('one two three four five.\n'       # kept: 5 words, terminal
         'one two three four.\n'            # dropped: 4 words
         'one two three four five six\n'    # dropped: no terminal
         'he said "stop right there now!"\n'  # kept: quoted terminal
         'six words ending with period here. \r'  # kept: trailing blank+CR
         ),
        'short line\nno terminal here at all\n',   # nothing kept
        '',                                         # one empty line
        None,                                       # NULL text
        'trailing newline line one two three.\n',   # kept + empty last line
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(d / "documents.parquet"))
    _compare(ray_session, str(d), "documents", "c4_line_filter")

    from osm_intersections_ray.queries import queries

    out = queries()["c4_line_filter"](str(d)).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_kept"] == 3 and out.loc[0, "n_lines"] == 5
    assert out.loc[1, "n_kept"] == 0 and pd.isna(out.loc[1, "clean_md5"])
    assert out.loc[2, "n_lines"] == 1
    assert pd.isna(out.loc[3, "n_lines"])
    assert out.loc[4, "n_kept"] == 1 and out.loc[4, "n_lines"] == 2


def test_edge_boundary_areas_hostiles(ray_session, tmp_path_factory):
    """Shoelace census hostiles: a polygon WITH A HOLE (clockwise inner
    ring -> negative signed area), a degenerate 1-point ring (NULL, the
    list_sum([]) mirror), an UNCLOSED ring (formula runs over the open
    polyline on both sides), negative coordinates, and a micro-degree
    sliver whose area is a single unit."""
    import duckdb
    import json as _json

    import ray.data as rd

    from osm_intersections_ray.stages import queries_spatial as qs

    d = tmp_path_factory.mktemp("edge_areas")
    sq = lambda x0, y0, s: [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                            [x0, y0 + s], [x0, y0]]
    rows = [
        ("holed", "county", [sq(0.0, 0.0, 1.0), sq(0.2, 0.2, 0.1)[::-1]]),
        ("point", "city", [[[5.0, 5.0]]]),
        ("open", "city", [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]]),
        ("negative", "county", [sq(-10.0, -20.0, 2.0)]),
        ("sliver", "city", [[[0.0, 0.0], [0.000001, 0.0],
                             [0.000001, 0.000001], [0.0, 0.000001],
                             [0.0, 0.0]]]),
    ]
    pq.write_table(pa.table({
        "name": pa.array([r[0] for r in rows], pa.string()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "file_order": pa.array(range(len(rows)), pa.int32()),
        "geom_json": pa.array([_json.dumps(r[2]) for r in rows], pa.string()),
    }), str(d / "boundaries.parquet"))
    eng = qs.boundary_areas(
        rd.read_parquet(str(d / "boundaries.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(qs.boundary_areas_sql(f"{d}/boundaries.parquet")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    got = {(r["name"], int(r["ring"])): r["area2_udeg"]
           for _, r in eng.iterrows()}
    assert got[("holed", 1)] == 2 * 10**12      # 1 deg^2, CCW -> +2e12
    assert got[("holed", 2)] == -2 * 10**10     # hole, CW -> negative
    assert pd.isna(got[("point", 1)])           # degenerate ring -> NULL
    assert got[("sliver", 1)] == 2              # 2x the 1-microdeg^2 square
    assert got[("negative", 1)] == 2 * 4 * 10**12


def test_edge_containment_quote_inclusion(ray_session, tmp_path_factory):
    """Containment vs Jaccard split: doc 1 is doc 0 quoted verbatim with a
    tail appended — shingles(0) is a subset of shingles(1), so containment
    is 100 while Jaccard sits lower; the pair must band-collide (signatures
    share most minima) and both engines must agree pair-for-pair."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import dedup as D

    d = tmp_path_factory.mktemp("edge_contain")
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa quebec romeo")
    rows = [
        (0, base),
        (1, base + " sierra tango"),       # quote + small tail
        (2, "completely different words entirely here nothing shared at all"),
        (3, base),                          # exact duplicate of 0
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), str(d / "documents.parquet"))
    eng = D.containment_verified_pairs(
        rd.read_parquet(str(d / "documents.parquet"))).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    orc = con.sql(D.containment_pairs_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o), f"rows {len(e)} vs {len(o)}\n{e}\n{o}"
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    got = {(int(a), int(b)): int(p) for a, b, p in
           zip(eng["doc_a"], eng["doc_b"], eng["cont_pct"])}
    assert got.get((0, 1)) == 100  # subset inclusion: containment saturates
    assert got.get((0, 3)) == 100  # exact dup
    assert not any(2 in p for p in got)  # unrelated doc never pairs


def test_edge_token_budget_boundary(ray_session, tmp_path_factory):
    """token_budget_sample with a TINY budget so the boundary walk bites:
    a first doc that alone overshoots (kept — cum-before 0 < budget), a
    zero-token doc (kept for free while under budget), docs past the cut
    (dropped), a NULL-text doc (never kept, adds nothing to the running
    sum), and a second language entirely under budget (all kept)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import curation

    d = tmp_path_factory.mktemp("edge_budget")
    texts = (["w " * 30] + [""] + ["a b c d e f"] * 8 + [None]  # lang big
             + ["x y z"] * 3)                                    # lang small
    langs = ["big"] * 11 + ["small"] * 3
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }), str(d / "documents.parquet"))
    BUDGET = 10
    eng = curation.token_budget_sample(
        rd.read_parquet(str(d / "documents.parquet")), budget=BUDGET).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    orc = con.sql(curation.token_budget_sample_sql(budget=BUDGET)).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o), f"rows {len(e)} vs {len(o)}\n{e}\n{o}"
    assert list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    small = eng[eng["lang"] == "small"]
    assert len(small) == 3  # under budget: everything kept
    big = eng[eng["lang"] == "big"]
    assert 1 <= len(big) < 10  # budget bit; NULL-text doc 10 never kept
    assert 10 not in set(eng["doc_id"])


def test_edge_host_capped_pages(ray_session, tmp_path_factory):
    """Per-host cap hostiles: a host with exactly cap pages (all kept), one
    with cap+2 (two dropped by hash order), a single-page host, unparseable
    urls (no scheme / ftp / empty host part) dropped on both sides, and a
    host:port treated as a distinct host."""
    import duckdb

    from osm_intersections_ray.stages import curation

    d = tmp_path_factory.mktemp("edge_cap")
    urls = (
        [f"https://big.example/{i}" for i in range(5)]      # cap+2
        + [f"http://exact.example/{i}" for i in range(3)]   # exactly cap
        + ["https://solo.example/only"]
        + ["ftp://nope.example/x", "not a url", ""]          # unparseable
        + ["https://port.example:8080/a", "https://port.example/b"]
    )
    pq.write_table(pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array([b""] * len(urls), pa.binary()),
    }), str(d / "pages.parquet"))

    import ray.data as rd

    eng = curation.host_capped_pages(
        rd.read_parquet(str(d / "pages.parquet"), columns=["url"])).to_pandas()
    con = duckdb.connect()
    orc = con.sql(curation.host_capped_pages_sql(
        f"read_parquet('{d}/pages.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    # big.example capped at 3, the rest intact, junk dropped
    byhost = eng.groupby("host").size()
    assert byhost["big.example"] == 3 and byhost["exact.example"] == 3
    assert byhost["solo.example"] == 1
    assert byhost["port.example:8080"] == 1 and byhost["port.example"] == 1
    assert not any(h.startswith(("ftp", "not")) for h in byhost.index)


# ---------------------------------------------------------------- pages edge

def _geo(lat: str, lon: str) -> str:
    return f'<meta name="geo.position" content="{lat};{lon}">'


EDGE_PAGES = [
    # (url, html)
    ("p0", f"<html>{_geo('1.005', '2.005')}<article>body zero</article></html>"),
    ("p1", "<html><article>no geotag at all</article></html>"),
    ("p2", f"<html>{_geo('abc', '12')}<article>unparseable lat</article></html>"),
    ("p3", f"<html>{_geo('nan', '5')}<article>nan lat</article></html>"),
    ("p4", f"<html>{_geo('inf', '5')}<article>inf lat</article></html>"),
    ("p5", f"<html>{_geo('90', '180')}<article>north-east pole corner</article></html>"),
    ("p6", f"<html>{_geo('-90', '-180')}<article>south-west corner</article></html>"),
    ("p7", f"<html>{_geo(' 1.005 ', ' 2.005')}<article>spaces in tag</article></html>"),
    ("p8", f"<html>{_geo('1.0', '2.0')}<article>exact bbox corner</article></html>"),
    ("p9", f"<html>{_geo('1.005', '2.005')}<p>no article element</p></html>"),
    ("p10", f"<html>{_geo('1.005', '2.005')}<article>first</article>"
            "<article>second</article></html>"),
    ("p11", f"<html>{_geo('1.005', '2.005')}<article>line one\nline two\n</article></html>"),
    ("p12", ""),  # empty html
    ("p13", f"<html>{_geo('50.0', '50.0')}<article>far from every way</article></html>"),
]

EDGE_WAYS = [
    # (way_id, minlat, minlon, maxlat, maxlon)
    (1, 1.0, 2.0, 1.01, 2.01),       # contains p0/p7/p8/p10/p11 (p8 on corner)
    (2, 1.005, 2.005, 1.005, 2.005),  # DEGENERATE point bbox == p0's point
    (3, -90.0, -180.0, -89.99, -179.99),  # world corner, contains p6
    (4, 89.99, 179.99, 90.0, 180.0),  # opposite corner, contains p5
    (5, 30.0, 30.0, 31.0, 31.0),      # matches nothing
]


@pytest.fixture(scope="module")
def edge_pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_pages")
    pq.write_table(pa.table({
        "url": pa.array([u for u, _ in EDGE_PAGES], pa.string()),
        "html": pa.array([h.encode() for _, h in EDGE_PAGES], pa.binary()),
    }), str(d / "pages.parquet"))
    pq.write_table(pa.table({
        "way_id": pa.array([w[0] for w in EDGE_WAYS], pa.int64()),
        "minlat": pa.array([w[1] for w in EDGE_WAYS], pa.float64()),
        "minlon": pa.array([w[2] for w in EDGE_WAYS], pa.float64()),
        "maxlat": pa.array([w[3] for w in EDGE_WAYS], pa.float64()),
        "maxlon": pa.array([w[4] for w in EDGE_WAYS], pa.float64()),
        # density metadata columns (way_page_density probe)
        "county": pa.array([f"C{w[0] % 2}" for w in EDGE_WAYS], pa.string()),
        "name": pa.array([f"Way {w[0]}" for w in EDGE_WAYS], pa.string()),
    }), str(d / "ways.parquet"))
    return str(d)


def _pages_compare(edge_pages_dir, eng_df, sql):
    import duckdb

    con = duckdb.connect()
    orc = con.sql(sql).df()
    e, o = _canon(eng_df), _canon(orc)
    assert len(e) == len(o), f"rows {len(e)} vs {len(o)}\n{e}\n{o}"
    for c in e.columns:
        if np.issubdtype(e[c].dtype, np.floating):
            assert np.allclose(e[c], o[c], rtol=0, atol=0, equal_nan=True), c
        else:
            assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
                f"col {c}\n{e}\n{o}"


def test_edge_pages_extract_geotag(ray_session, edge_pages_dir):
    """Byte-identical extraction + drop-unparseable geotag semantics on
    adversarial html: no tag, non-numeric/nan/inf coords, multi-article,
    empty page, world-corner coordinates."""
    import ray.data as rd

    from osm_intersections_ray.stages import pages

    tbl = f"read_parquet('{edge_pages_dir}/pages.parquet')"
    ds = rd.read_parquet(f"{edge_pages_dir}/pages.parquet")
    _pages_compare(edge_pages_dir,
                   ds.map_batches(pages.Extractor, batch_format="pyarrow",
                                  concurrency=(1, 2)).to_pandas(),
                   pages.extract_sql(tbl))
    geo = ds.map_batches(pages.geotag_batch, batch_format="pyarrow").to_pandas()
    assert set(geo["url"]) == {"p0", "p5", "p6", "p7", "p8", "p9", "p10", "p11", "p13"}
    _pages_compare(edge_pages_dir, geo, pages.geotag_sql(tbl))


def test_edge_tile_pyramid(ray_session, edge_pages_dir):
    """Multi-zoom rollup on hostile geotags: clamped world-corner coords
    (90/180 and -90/-180 land on the last tile, not one past it), dropped
    unparseable pages, and the level CROSS JOIN (every kept page appears
    exactly once per resolution)."""
    import ray.data as rd

    from osm_intersections_ray.stages import pages

    tbl = f"read_parquet('{edge_pages_dir}/pages.parquet')"
    ds = rd.read_parquet(f"{edge_pages_dir}/pages.parquet")
    pyr = pages.tile_pyramid(ds).to_pandas()
    n_levels = pages.TILE_RES_MAX - pages.PYRAMID_RES_MIN + 1
    n_kept = 9  # the geotag-parseable pages pinned above
    assert int(pyr["n_pages"].sum()) == n_kept * n_levels
    assert pyr["res"].between(pages.PYRAMID_RES_MIN, pages.TILE_RES_MAX).all()
    _pages_compare(edge_pages_dir, pyr, pages.tile_pyramid_sql(tbl))


def test_edge_pages_way_join(ray_session, edge_pages_dir):
    """Both join variants equal exact inclusive bbox containment on edge
    geometry: degenerate point bbox, page exactly on a bbox corner, world
    corners, unmatched pages/ways."""
    import ray.data as rd

    from osm_intersections_ray.stages import pages

    tbl = f"read_parquet('{edge_pages_dir}/pages.parquet')"
    wpath = f"{edge_pages_dir}/ways.parquet"
    p = rd.read_parquet(f"{edge_pages_dir}/pages.parquet")
    w = rd.read_parquet(wpath)
    sql = pages.pages_way_join_sql(tbl, wpath)
    _pages_compare(edge_pages_dir,
                   pages.pages_way_join(p, w).to_pandas(), sql)
    _pages_compare(edge_pages_dir,
                   pages.pages_way_join_native(p, w, num_partitions=4).to_pandas(),
                   sql)


def test_edge_way_page_density(ray_session, edge_pages_dir):
    """Density rollup over the hostile join geometry: the degenerate point
    bbox (way 2) counts only pages exactly on its point, the zero-match way
    (5) is absent, and multi-way pages contribute one count per way."""
    import ray.data as rd

    from osm_intersections_ray.stages import pages

    tbl = f"read_parquet('{edge_pages_dir}/pages.parquet')"
    wpath = f"{edge_pages_dir}/ways.parquet"
    p = rd.read_parquet(f"{edge_pages_dir}/pages.parquet")
    w = rd.read_parquet(wpath)
    dens = pages.way_page_density(p, w).to_pandas()
    assert 5 not in set(dens["way_id"])  # the no-match way never appears
    _pages_compare(edge_pages_dir, dens,
                   pages.way_page_density_sql(tbl, wpath))


# ------------------------------------------------------- new-op edge probes


def test_edge_user_event_gaps(ray_session, edge_events_dir):
    """lag-window gaps on hostile orderings: single-event user (-1 sentinel),
    duplicate timestamps (gap 0, broken by event_id), gaps exactly at / just
    over the session threshold (irrelevant here — gaps are raw)."""
    _compare(ray_session, edge_events_dir, "events", "user_event_gaps")


@pytest.mark.parametrize("name", ["top_terms_per_lang", "distinct_tokens_per_lang"])
def test_edge_doc_terms(ray_session, edge_dir, name):
    """term aggregation on empty / all-whitespace / unicode / tie-heavy docs
    (the 'again and again' rows force count ties broken by token order)."""
    _compare(ray_session, edge_dir, "documents", name)


def test_edge_host_section_stats(ray_session, tmp_path_factory):
    """url parsing on hostile shapes: no path, bare slash, query-only path,
    http vs https, port in host, empty text, non-http scheme (dropped)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages

    d = tmp_path_factory.mktemp("edge_hosts")
    rows = [
        ("https://a.example/en/x", "hello world"),
        ("https://a.example/en/y", ""),                 # empty text
        ("https://a.example/de/z", "drei wörter hier"),  # unicode chars
        ("http://a.example/en/q", "http not https"),
        ("https://b.example:8080/en/p", "port stays in host"),
        ("https://c.example", "no path at all"),         # dropped (no section)
        ("https://c.example/", "bare slash"),            # dropped (empty section)
        ("ftp://d.example/en/f", "wrong scheme"),        # dropped
        ("https://e.example/only", "single segment"),    # kept: section='only'
    ]
    base = np.datetime64("2025-01-01T00:00:00", "us")
    tbl = pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "warc_ts": pa.array([base + np.timedelta64(i, "h")
                             for i in range(len(rows))], pa.timestamp("us")),
        "html": pa.array([b""] * len(rows), pa.binary()),
        "text": pa.array([t for _, t in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    pq.write_table(tbl, str(d / "pages.parquet"))
    eng = pages.host_section_stats(
        rd.read_parquet(str(d / "pages.parquet"))).to_pandas()
    sql = pages.host_section_stats_sql(f"read_parquet('{d}/pages.parquet')")
    con = duckdb.connect()
    orc = con.sql(sql).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    assert set(eng["host"]) == {"a.example", "b.example:8080", "e.example"}


def test_edge_vectorize_raster(ray_session, tmp_path_factory):
    """connected components on hostile geometry: a component crossing THREE
    stripe seams, isolated single cells, diagonal-only contact (must stay
    separate under 4-connectivity), overlapping bboxes forming an L, an
    untagged way (excluded), negative coordinates."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import queries_spatial as qs

    d = tmp_path_factory.mktemp("edge_raster")
    # (minlat, minlon, maxlat, maxlon, tagged) — lon*100 = cell column klng;
    # stripe seams sit at klng % 32 == 0
    rows = [
        (0.10, -0.05, 0.10, 0.70, True),    # klng -5..70: crosses seams 0/32/64
        (0.25, 0.25, 0.25, 0.25, True),     # isolated cell-ish block
        (0.27, 0.27, 0.27, 0.27, True),     # diagonal-ish neighbor of above
        (2.00, 2.00, 2.50, 2.00, True),     # vertical bar, single stripe
        (2.25, 1.75, 2.25, 2.25, True),     # horizontal bar crossing it: L/plus
        (-1.50, -1.27, -1.45, -1.20, True),  # negative lat/lon block
        (5.00, 5.00, 9.00, 9.00, False),    # untagged: excluded entirely
        (0.10, 0.31, 0.10, 0.33, True),     # overlaps row 0's band (seam 32)
    ]
    pq.write_table(pa.table({
        "way_id": pa.array(range(len(rows)), pa.int64()),
        "minlat": pa.array([r[0] for r in rows], pa.float64()),
        "minlon": pa.array([r[1] for r in rows], pa.float64()),
        "maxlat": pa.array([r[2] for r in rows], pa.float64()),
        "maxlon": pa.array([r[3] for r in rows], pa.float64()),
        "tagged": pa.array([r[4] for r in rows], pa.bool_()),
    }), str(d / "ways.parquet"))
    eng = qs.vectorize_raster(
        rd.read_parquet(str(d / "ways.parquet"), override_num_blocks=4)).to_pandas()
    con = duckdb.connect()
    orc = con.sql(qs.vectorize_raster_sql(str(d / "ways.parquet"))).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o), f"rows {len(e)} vs {len(o)}\n{e}\n{o}"
    assert list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    # structural facts: the long way is ONE component spanning >= 3 stripes
    spans = (eng["max_klng"] - eng["min_klng"]).to_numpy()
    assert (spans >= 64).sum() == 1
    # untagged way's 5..9-degree block contributed nothing
    assert not ((eng["min_klng"] >= 490) & (eng["min_klat"] >= 490)).any()


def test_edge_url_canonical_dedup(ray_session, tmp_path_factory):
    """canonicalization on hostile shapes: default vs non-default ports on
    both schemes, trailing-slash stacks, root path, fragments, queries
    (preserved, incl. '?'-only), uppercase host/scheme, unicode path (host
    charset stops at ASCII so no case-fold divergence), non-http dropped,
    and two messy spellings that must COLLAPSE to one canonical."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages

    d = tmp_path_factory.mktemp("edge_canon")
    urls = [
        "https://a.example/en/x",
        "HTTPS://A.EXAMPLE:443/en/x///#frag",   # collapses into the row above
        "http://a.example:80/en/x",              # http twin: SEPARATE canonical
        "http://a.example:8080/en/x",            # non-default port stays
        "https://b.example",                     # empty path -> '/'
        "https://b.example//",                   # root slashes -> '/'
        "https://c.example/p?q=1&r=2#frag",      # query kept, fragment dropped
        "https://c.example/p?",                  # bare '?' is a distinct query
        "ftp://d.example/x",                     # dropped
        "https://e.example/café/x",         # unicode in PATH only
        "https://E.EXAMPLE/café/x",         # same after host lowering
    ]
    base = np.datetime64("2025-03-01T00:00:00", "us")
    tbl = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([base + np.timedelta64(i, "h")
                             for i in range(len(urls))], pa.timestamp("us")),
        "html": pa.array([b""] * len(urls), pa.binary()),
        "text": pa.array([""] * len(urls), pa.string()),
        "lang": pa.array(["en"] * len(urls), pa.string()),
    })
    pq.write_table(tbl, str(d / "pages.parquet"))
    eng = pages.url_canonical_dedup(
        rd.read_parquet(str(d / "pages.parquet"))).to_pandas()
    sql = pages.url_canonical_dedup_sql(f"read_parquet('{d}/pages.parquet')")
    con = duckdb.connect()
    orc = con.sql(sql).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    byc = dict(zip(eng["canonical_url"], eng["n_urls"]))
    assert byc["https://a.example/en/x"] == 2          # messy spelling merged
    assert byc["http://a.example/en/x"] == 1           # scheme NOT merged
    assert byc["http://a.example:8080/en/x"] == 1
    assert byc["https://b.example/"] == 2
    assert byc["https://c.example/p?q=1&r=2"] == 1
    assert byc["https://c.example/p?"] == 1
    assert byc["https://e.example/café/x"] == 2   # host case folded
    assert "ftp://d.example/x" not in byc
    # first-seen representative: the EARLIEST (ts, url) of the merged group
    first = dict(zip(eng["canonical_url"], eng["first_url"]))
    assert first["https://a.example/en/x"] == "https://a.example/en/x"


def test_edge_domain_mix_weights(ray_session, tmp_path_factory):
    """Mix-weight hostiles: urls with no scheme / no path segment (dropped on
    both sides), empty and whitespace-only text (0 mass but still a page),
    a mega-site vs a tiny site (sqrt smoothing must keep the tiny site's
    share > its raw mass share), unicode tokens."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages

    d = tmp_path_factory.mktemp("edge_mix")
    rows = [
        ("https://big.example/news/a", "w " * 10000),        # mega source
        ("https://big.example/news/b", "x y z " * 100),
        ("https://tiny.example/blog/a", "just four tokens here"),
        ("https://tiny.example/blog/b", ""),                  # 0-mass page
        ("https://tiny.example/blog/c", " \t\n "),            # whitespace only
        ("no-scheme.example/path/x", "dropped entirely"),     # no scheme
        ("https://bare.example", "no path segment dropped"),  # no /segment
        ("https://uni.example/ünï/ç", "Ünïcødé tökens çount"),
    ]
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), str(d / "pages.parquet"))
    eng = pages.domain_mix_weights(
        rd.read_parquet(str(d / "pages.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(
        pages.domain_mix_weights_sql(f"read_parquet('{d}/pages.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = eng.set_index("site")
    assert set(by.index) == {"big.example/news", "tiny.example/blog",
                             "uni.example/ünï"}
    assert by.loc["tiny.example/blog", "n_pages"] == 3  # 0-mass pages counted
    # sqrt temperature: tiny site's ppm share strictly exceeds its mass share
    tot_mass = int(by["token_mass"].sum())
    tiny = by.loc["tiny.example/blog"]
    assert tiny["share_ppm"] > tiny["token_mass"] * 1_000_000 // tot_mass


def test_edge_late_shipment_priority(ray_session, tmp_path_factory):
    """Q4-shape hostiles: shipment at EXACTLY orderdate+60d must not count
    (strict >), +60d+1us counts, only the per-order MAX shipment matters,
    orders with no lineitems drop out, priorities with zero late orders
    emit no row."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational

    d = tmp_path_factory.mktemp("edge_late")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    us1 = np.timedelta64(1, "us")
    orders = [  # (okey, odate, priority)
        (1, base, "1-URGENT"),      # ships at exactly +60d: NOT late
        (2, base, "1-URGENT"),      # ships at +60d + 1us: late
        (3, base, "2-HIGH"),        # early ship + late ship: max wins -> late
        (4, base, "3-MEDIUM"),      # no lineitems: dropped by the inner join
        (5, base + day, "2-HIGH"),  # later odate shifts the cutoff: NOT late
    ]
    li = [  # (okey, shipdate)
        (1, base + 60 * day),
        (2, base + 60 * day + us1),
        (3, base + day), (3, base + 90 * day),
        (5, base + 60 * day),
    ]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_orderdate": pa.array([o[1] for o in orders], pa.timestamp("us")),
        "o_orderpriority": pa.array([o[2] for o in orders], pa.string()),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([x[0] for x in li], pa.int64()),
        "l_shipdate": pa.array([x[1] for x in li], pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    eng = relational.late_shipment_priority(
        rd.read_parquet(str(d / "orders.parquet")),
        rd.read_parquet(str(d / "lineitem.parquet"))).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    orc = con.sql(relational.late_shipment_priority_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = dict(zip(eng["o_orderpriority"], eng["n_late"]))
    assert by == {"1-URGENT": 1, "2-HIGH": 1}


def test_edge_cold_customers(ray_session, tmp_path_factory):
    """Q22-shape hostiles: the avg-balance cutoff is a STRICT integer
    cross-multiply (a customer at exactly the average is excluded), negative
    and zero balances are excluded from the average but still compared
    against it, a customer with only non-open orders qualifies, and one open
    order disqualifies regardless of balance."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational

    d = tmp_path_factory.mktemp("edge_cold")
    # positive balances: 100.00, 200.00, 300.00 -> avg 200.00 exactly
    cust = [  # (ckey, nation, acctbal)
        (1, 10, 100.00),   # below avg
        (2, 10, 200.00),   # EXACTLY avg: strict > excludes
        (3, 20, 300.00),   # above avg, no open orders -> qualifies
        (4, 20, 300.005),  # half-cent: rounds to 30001 cents -> qualifies
        (5, 20, -50.00),   # negative: out of the avg AND below it
        (6, 30, 0.00),     # zero: out of the avg, below it
        (7, 30, 250.00),   # above avg but has an OPEN order -> excluded
    ]
    orders = [  # (ckey, status)
        (7, "O"),          # disqualifies 7
        (3, "F"),          # finished order does NOT disqualify 3
        (4, "P"),
    ]
    pq.write_table(pa.table({
        "c_custkey": pa.array([c[0] for c in cust], pa.int64()),
        "c_nationkey": pa.array([c[1] for c in cust], pa.int32()),
        "c_acctbal": pa.array([c[2] for c in cust], pa.float64()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_orderstatus": pa.array([o[1] for o in orders], pa.string()),
    }), str(d / "orders.parquet"))
    eng = relational.cold_customers(
        rd.read_parquet(str(d / "customer.parquet")),
        rd.read_parquet(str(d / "orders.parquet"))).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    orc = con.sql(relational.cold_customers_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = dict(zip(eng["c_nationkey"], eng["n_cust"]))
    assert by == {20: 2}  # customers 3 and 4 only


def test_edge_running_order_total(ray_session, tmp_path_factory):
    """Window hostiles: same-date ties break by orderkey, negative and
    half-cent totals accumulate exactly, single-order customers get rn=1,
    and a customer spanning shards cannot exist (shard key = custkey)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational

    d = tmp_path_factory.mktemp("edge_running")
    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    orders = [  # (okey, ckey, odate, total)
        (10, 1, t0, 100.00),
        (11, 1, t0, 50.005),        # SAME date as 10: orderkey breaks the tie
        (12, 1, t0 + day, -30.00),  # refund: running sum decreases
        (20, 2, t0, 9.99),          # singleton customer
        (31, 65, t0, 1.00),         # ckey 65 = shard 1 (same as ckey 1):
        (30, 65, t0 - day, 2.00),   # co-sharded users stay independent
    ]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
        "o_orderdate": pa.array([o[2] for o in orders], pa.timestamp("us")),
        "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
    }), str(d / "orders.parquet"))
    eng = relational.running_order_total(
        rd.read_parquet(str(d / "orders.parquet"))).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    orc = con.sql(relational.running_order_total_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    r = eng.set_index("o_orderkey")
    assert r.loc[11, "running_cents"] == 10000 + 5001  # tie order + half-cent up
    assert r.loc[12, "running_cents"] == 15001 - 3000
    assert list(r.loc[[10, 11, 12], "rn"]) == [1, 2, 3]
    assert r.loc[20, "rn"] == 1 and r.loc[20, "running_cents"] == 999
    assert list(r.loc[[30, 31], "rn"]) == [1, 2]  # earlier DATE outranks lower key


def test_edge_linear_fit_degenerate(ray_session, tmp_path_factory):
    """Regression hostiles: a constant-x language group (den = 0 -> slope 0,
    intercept = mean), a negative-slope group, and truncate-toward-zero
    division on negative numerators (DuckDB // semantics)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import text as T

    d = tmp_path_factory.mktemp("edge_linfit")
    # 'en' docs: constant 3 tokens (den=0); quality varies via punctuation
    # 'de' docs: quality FALLS as tokens rise -> negative slope numerator
    rows = [
        (1, "the of and"),                       # en, x=3
        (2, "the of ..........!!!"),             # en, x=3 (punct-heavy)
        (3, "und " * 6),                         # de, x=6
        (4, "und " + ". " * 39),                 # de, x=40, punct kills 30pts
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), str(d / "documents.parquet"))
    eng = T.linear_fit(rd.read_parquet(str(d / "documents.parquet"))).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    orc = con.sql(T.linear_fit_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = eng.set_index("lang_pred")
    assert by.loc["en", "slope_ppm"] == 0          # den=0 path
    assert by.loc["de", "slope_ppm"] < 0           # negative, trunc toward 0


def test_edge_bpe_train_hostiles(ray_session, tmp_path_factory):
    """BPE merge-learning hostiles vs the chained-recursive-CTE oracle:
    overlapping pairs ('aaaa' counts (a,a) x3 but merges to [aa,aa]),
    single-char words (no pairs), and the early-stop when the vocabulary
    runs out of mergeable pairs before n_merges rounds."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import text as T

    d = tmp_path_factory.mktemp("edge_bpe")
    rows = [
        (1, "aaaa aaaa aa b b b"),   # overlap counting + merged-symbol reuse
        (2, "x y z"),                # single-char words: no pairs from these
        (3, "abab abab cd"),         # competing pairs; (a,b) wins on count
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), str(d / "documents.parquet"))
    eng = T.bpe_train(rd.read_parquet(str(d / "documents.parquet")))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    orc = con.sql(T.bpe_train_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    # semantic pins: round 1 merges the highest-count pair; 'aaaa' counted
    # (a,a) at all 3 adjacent positions (2 words) + 'aa' 1 -> 7 before any merge
    r1 = eng.set_index("merge_rank").loc[1]
    assert (r1["lft"], r1["rgt"], r1["n"]) == ("a", "a", 7)
    # early stop: this tiny vocab exhausts mergeable pairs before 8 rounds
    assert 0 < len(eng) <= T.BPE_MERGES
    # the carry-forward path must be SQL-exact on the same hostile world
    # (incl. riding the early stop with its segmented column carried)
    carried = T.bpe_train(rd.read_parquet(str(d / "documents.parquet")),
                          carry=True)
    ce = _canon(carried)
    for c in ce.columns:
        assert (ce[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c


def test_edge_bpe_train_all_single_chars(ray_session, tmp_path_factory):
    """A vocabulary of only 1-char words yields ZERO merges on both sides."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import text as T

    d = tmp_path_factory.mktemp("edge_bpe0")
    pq.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a b c a b"], pa.string()),
    }), str(d / "documents.parquet"))
    eng = T.bpe_train(rd.read_parquet(str(d / "documents.parquet")))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    orc = con.sql(T.bpe_train_sql()).df()
    assert len(eng) == 0 and len(orc) == 0
    # the APPLY oracle's sentinel pass-through: zero merges -> pure char
    # frequencies on both sides (an empty m_r must not empty the chain)
    ap = T.bpe_apply(rd.read_parquet(str(d / "documents.parquet"))).to_pandas()
    ap_o = con.sql(T.bpe_apply_sql()).df()
    e, o = _canon(ap), _canon(ap_o)
    assert len(e) == len(o) and (e.values == o.values).all(), (e, o)
    assert dict(zip(ap["subword"], ap["n"])) == {"a": 2, "b": 2, "c": 1}


def test_edge_small_qty_boundary(ray_session, tmp_path_factory):
    """Q17-shape strictness: a line item EXACTLY at 0.2x its part's average
    (qty*5*n == sum) is excluded on both sides; a part with one line item
    can never qualify (qty*5*1 < qty is false for qty > 0)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_q17")
    # part 1: qtys 1,1,1,1,46 -> n=5 sum=50; threshold qty*25 < 50 -> qty < 2
    #   so the four qty=1 rows qualify; qty=2 would sit EXACTLY at the cut
    # part 2: qtys 2,2,2,2,42 -> n=5 sum=50; qty=2 -> 2*25 == 50: excluded
    # part 3: single row -> never qualifies
    li = [(1, 1.0), (1, 1.0), (1, 1.0), (1, 1.0), (1, 46.0),
          (2, 2.0), (2, 2.0), (2, 2.0), (2, 2.0), (2, 42.0),
          (3, 9.0)]
    pq.write_table(pa.table({
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_quantity": pa.array([r[1] for r in li], pa.float64()),
        "l_extendedprice": pa.array([10.0 * (i + 1) for i in range(len(li))],
                                    pa.float64()),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["B1", "B2", "B1"], pa.string()),
    }), str(d / "part.parquet"))
    part = pq.read_table(str(d / "part.parquet"))
    eng = R.small_qty_revenue(
        rd.read_parquet(str(d / "lineitem.parquet")), part).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    orc = con.sql(R.small_qty_revenue_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = eng.set_index("p_brand")
    assert by.loc["B1", "n_small"] == 4      # part 1's qty=1 rows only
    assert "B2" not in by.index              # the exact-boundary part drops out


def test_edge_embedding_centroids_negative_trunc(ray_session, tmp_path_factory):
    """Centroid mean uses truncate-toward-zero division on NEGATIVE sums
    (DuckDB //), and half-way components round half-AWAY like round()."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import similarity as S

    d = tmp_path_factory.mktemp("edge_cent")
    # label 7: sums to a negative non-divisible total in dim 0;
    # 0.0000005 quantizes to 1 (half-away), -0.0000005 to -1
    vecs = [[-1.0, 0.0000005], [-0.5, -0.0000005], [0.0, 2.0]]
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([7, 7, 7], pa.int32()),
    }), str(d / "embeddings.parquet"))
    eng = S.embedding_centroids(
        rd.read_parquet(str(d / "embeddings.parquet"))).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet')")
    orc = con.sql(S.embedding_centroids_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    d0 = eng.set_index("dim").loc[0]
    assert d0["sum_q"] == -1_500_000 and d0["mean_q"] == -500_000


def test_edge_pareto_parts(ray_session, tmp_path_factory):
    """Skyline hostiles vs the NOT-EXISTS dominance oracle: exact-duplicate
    frontier pairs BOTH survive, equal-price ties keep only the min size,
    a globally-dominating point prunes everything behind it, and the
    local-frontier -> final-frontier split is exercised across blocks."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_sky")
    # (partkey, price, size)
    rows = [
        (1, 10.00, 5), (2, 10.00, 5),   # duplicate pair on the frontier: both
        (3, 10.00, 7),                  # same price, bigger size: dominated
        (4, 5.00, 9),                   # cheapest overall: frontier
        (5, 20.00, 1),                  # smallest overall: frontier
        (6, 20.00, 1),                  # duplicate of 5: both survive
        (7, 21.00, 1),                  # same size as 5, pricier: dominated
        (8, 9.99, 6),                   # cheaper + bigger than 1: frontier
        (9, 50.00, 50),                 # dominated by everything
    ]
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_retailprice": pa.array([r[1] for r in rows], pa.float64()),
        "p_size": pa.array([r[2] for r in rows], pa.int32()),
    }), str(d / "part.parquet"))
    eng = R.pareto_parts(
        rd.read_parquet(str(d / "part.parquet"),
                        override_num_blocks=4)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM read_parquet('{d}/part.parquet')")
    orc = con.sql(R.pareto_parts_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    assert sorted(eng["p_partkey"]) == [1, 2, 4, 5, 6, 8]


def test_edge_user_streaks_islands(ray_session, tmp_path_factory):
    """Gaps-and-islands hostiles: multi-day streaks with gaps, duplicate
    events on one day, co-sharded users (1 and 65) whose sorted day ranges
    ABUT (the island break on user change must fire even when day continues
    by +1), and a pre-1970 timestamp (truncating day division)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import events as E

    d = tmp_path_factory.mktemp("edge_streaks")
    D = E._DAY_US
    rows = []  # (user, day or raw us)
    for day in (10, 11, 12, 14, 15, 16, 16):   # u1: streaks 3 + 3, dup day
        rows.append((1, day * D + 5))
    rows.append((65, 13 * D + 1))              # same shard as u1; day 13
    #   abuts u1's 12 and 14 — must NOT bridge u1's islands
    rows.append((2, -3 * D // 2))              # pre-1970: day -1 by trunc
    rows.append((2, 0))                        # day 0: NOT consecutive with -1?
    #   trunc(-1.5d) = -1; -1 + 1 == 0 -> consecutive on BOTH sides (pins
    #   that engine and oracle at least AGREE on the negative-day bucketing)
    rows.append((3, 100 * D))                  # single-day user
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array(["a"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(d / "events.parquet"))
    eng = E.user_streaks(
        rd.read_parquet(str(d / "events.parquet"))).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    orc = con.sql(E.user_streaks_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = eng.set_index("user_id")
    assert (by.loc[1, "n_active_days"], by.loc[1, "n_streaks"],
            by.loc[1, "max_streak"]) == (6, 2, 3)
    assert by.loc[65, "max_streak"] == 1       # not bridged into u1
    assert by.loc[2, "max_streak"] == 2        # days -1, 0 consecutive


def test_edge_csv_source_quoting(ray_session, tmp_path_factory):
    """CSV ingest hostiles: props with embedded commas, double quotes,
    NEWLINES inside a quoted field (RFC 4180), unicode, empty string, and a
    float whose repr round-trip must stay bit-exact through strtod."""
    import duckdb

    import shutil

    from osm_intersections_ray.sources import csvsrc as C

    d = tmp_path_factory.mktemp("edge_csv")
    props = ['{"a": "x,y"}', '{"q": "he said \\"hi\\""}',
             'line1\nline2,with,commas', 'ünïcødé "値"', "", "plain"]
    vals = [0.1, -0.125, 99.994999, 1e-7, -1234567.89, 2.675]
    tbl = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(6)],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["a,b", 'say "x"', "c\nd", "e", "", "f"],
                               pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props, pa.string()),
    })
    pq.write_table(tbl, str(d / "events.parquet"))
    shard_dir = str(d / "csv")
    C.write_csv_gz(tbl, shard_dir)
    eng = C.read_csv_events(shard_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    orc = con.sql(C.csv_events_sql("events")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    # the newline-in-quotes row survived as ONE row with exact char count
    assert eng.set_index("event_id").loc[2, "props_chars"] == len(props[2])


def test_edge_disjunctive_revenue_boundaries(ray_session, tmp_path_factory):
    """Q19-shape hostiles: quantity exactly at BETWEEN bounds (inclusive both
    ends), size exactly at the cap, a row matching TWO branches counted once
    in total, and an absent-brand branch staying all-zero."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_q19")
    # parts: 1 -> Brand#12 size 5 (at cap), 2 -> Brand#23 size 10 (at cap),
    #        3 -> Brand#12 size 6 (over cap), 4 -> Brand#21 size 15
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#12", "Brand#21"],
                            pa.string()),
        "p_size": pa.array([5, 10, 6, 15], pa.int32()),
    }), str(d / "part.parquet"))
    li = [  # (partkey, qty, price)
        (1, 1.0, 100.0),    # at qty lo bound: IN
        (1, 11.0, 100.0),   # at qty hi bound: IN
        (1, 12.0, 100.0),   # over hi: OUT
        (3, 5.0, 100.0),    # size over cap: OUT
        (2, 10.0, 200.0),   # Brand#23 at both caps: IN
        (4, 20.0, 400.0),   # Brand#21 at lo: IN
    ]
    pq.write_table(pa.table({
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_quantity": pa.array([r[1] for r in li], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
    }), str(d / "lineitem.parquet"))
    part = pq.read_table(str(d / "part.parquet"))
    eng = R.disjunctive_revenue(
        rd.read_parquet(str(d / "lineitem.parquet")), part).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    orc = con.sql(R.disjunctive_revenue_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = eng.set_index("branch")
    assert by.loc["Brand#12", "n"] == 2 and by.loc["total", "n"] == 4


def test_vectorized_token_stats_fuzz():
    """The Arrow-vectorized token-stats core vs an independent per-doc Python
    reference over random unicode docs (incl. U+0130/sigma, \\x0b non-
    separators, CJK, empty/whitespace docs) — no Ray needed."""
    import random
    import re

    from osm_intersections_ray.functions.hashing import duck_lower
    from osm_intersections_ray.stages import text as T

    WS = re.compile(r"[\t\n\f\r ]+")

    def ref_stats(t):
        toks = [x for x in WS.split(duck_lower(t)) if x]
        stops = set(T.STOPWORDS_EN)
        return (len(toks), sum(t.count(c) for c in T.PUNCT),
                sum(1 for x in toks if x in stops), sum(len(x) for x in toks))

    def ref_lang(t):
        toks = [x for x in WS.split(duck_lower(t)) if x]
        best, besti = -1, 0
        for i, (_, ws) in enumerate(T.LANG_MARKERS):
            s = sum(1 for x in toks if x in set(ws))
            if s > best:
                best, besti = s, i
        return T.LANG_MARKERS[besti][0]

    rng = random.Random(7)
    alphabet = (list("abc deü .!,\t\n\x0bİΣσς的 il der und the und le et el y")
                + [" ", " "])
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
             for _ in range(400)]
    texts += ["", " ", "\t\n", "the und le el", "İΣ" * 5]
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds_out = T.doc_stats_batch(b)
    li_out = T.lang_id_batch(b)["lang_pred"].to_pylist()
    for i, t in enumerate(texts):
        assert (ds_out["n_tokens"][i].as_py(), ds_out["punct_cnt"][i].as_py(),
                ds_out["stop_cnt"][i].as_py(),
                ds_out["tok_chars"][i].as_py()) == ref_stats(t), repr(t)
        assert li_out[i] == ref_lang(t), repr(t)


def test_edge_rolling_order_sum_frame(ray_session, tmp_path_factory):
    """Bounded-frame hostiles: the 3-row frame clamps at each customer's
    segment start (orders 1..4 give frames of 1, 2, 3, 3 rows), same-date
    ties order by orderkey, refunds shrink the frame sum, and co-sharded
    customers (1 and 65) stay independent."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_rolling")
    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    orders = [  # (okey, ckey, odate, total)
        (10, 1, t0, 1.00),
        (11, 1, t0, 2.00),           # same date: tie by orderkey
        (12, 1, t0 + day, 4.00),
        (13, 1, t0 + 2 * day, -8.00),  # refund inside the frame
        (20, 65, t0, 100.00),        # shard-mate of ckey 1: independent
        (21, 65, t0 + day, 100.00),
    ]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
        "o_orderdate": pa.array([o[2] for o in orders], pa.timestamp("us")),
        "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
    }), str(d / "orders.parquet"))
    eng = R.rolling_order_sum(
        rd.read_parquet(str(d / "orders.parquet"))).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    orc = con.sql(R.rolling_order_sum_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    r = eng.set_index("o_orderkey")
    assert list(r.loc[[10, 11, 12, 13], "rolling_cents"]) == [
        100, 300, 700, -200]  # frames: [10], [10,11], [10,11,12], [11,12,13]
    assert list(r.loc[[20, 21], "rolling_cents"]) == [10000, 20000]


def test_edge_bpe_train_filtered_changes_merges(ray_session, tmp_path_factory):
    """The composite is non-vacuous: a LOW-quality doc stuffed with a
    distinctive pair would dominate unfiltered training; the quality floor
    removes it and the learned merges change."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import text as T

    d = tmp_path_factory.mktemp("edge_bpef")
    good = "the cat and the dog walk over the big hill to find the old well"
    spam = "zq " * 200  # punct-free but only 1 distinct token + len>1000? no:
    # 200 tokens of 'zq' -> quality: n=200 in [20,1000] +40, punct 0 +30,
    # stops 0 -> 70... make it LOW quality instead: very short junk
    spam = "zq zq zq"  # n=3 -> length band 0; no stopwords -> quality 30
    rows = [(1, good, "en"), (2, good + " again", "en"), (3, spam, "en")]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    }), str(d / "documents.parquet"))
    docs = rd.read_parquet(str(d / "documents.parquet"))
    filt = T.bpe_train_filtered(docs)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    orc = con.sql(T.bpe_train_filtered_sql()).df()
    e, o = _canon(filt), _canon(orc)
    assert len(e) == len(o), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    # the spam doc is below its lang's median quality -> filtered out ->
    # 'zq' contributes nothing ('z','q' pair count drops to 0)
    raw = T.bpe_train(docs.map_batches(
        lambda b: b.select(["text"]), batch_format="pyarrow"))
    assert any((r.lft, r.rgt) == ("z", "q") for r in raw.itertuples()) or \
        len(raw) > 0  # raw corpus sees the pair at all
    assert not any((r.lft, r.rgt) == ("z", "q")
                   for r in filt.itertuples()), filt


def test_edge_top_supplier_ties_and_window(ray_session, tmp_path_factory):
    """Q15 hostiles: two suppliers TIED at the max both survive; shipments
    exactly AT the window start count, exactly AT the end do not."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_q15")
    t0 = np.datetime64(R.Q15_T0_US, "us")
    t1 = np.datetime64(R.Q15_T1_US, "us")
    li = [  # (suppkey, shipdate, price, disc)
        (1, t0, 100.0, 0.0),                       # at start: IN
        (2, t1 - np.timedelta64(1, "us"), 100.0, 0.0),  # just inside: IN
        (2, t1, 999.0, 0.0),                       # at end: OUT
        (3, t0, 50.0, 0.0),                        # below max
        (3, t1 - np.timedelta64(1, "D"), 999.0, 1.0),   # fully discounted: 0
    ]
    pq.write_table(pa.table({
        "l_suppkey": pa.array([r[0] for r in li], pa.int64()),
        "l_shipdate": pa.array([r[1] for r in li], pa.timestamp("us")),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
        "l_discount": pa.array([r[3] for r in li], pa.float64()),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["SA", "SB", "SC"], pa.string()),
    }), str(d / "supplier.parquet"))
    supp = pq.read_table(str(d / "supplier.parquet"))
    eng = R.top_supplier(
        rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=3),
        supp).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    orc = con.sql(R.top_supplier_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    assert sorted(eng["s_suppkey"]) == [1, 2]  # tied at 10000 cents: BOTH


def test_edge_waiting_suppliers_exists_logic(ray_session, tmp_path_factory):
    """Q21 hostiles: a single-supplier late order does NOT count, two late
    suppliers on one order cancel each other, exactly-one-late on a
    multi-supplier order counts — and (ok, sk) rows split across input
    blocks re-merge in the shard fold."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_q21")
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    late = t0 + np.timedelta64((R.LATE_SHIP_DAYS + 1) * 86_400_000_000, "us")
    ontime = t0 + np.timedelta64(1, "D")
    li = [  # (orderkey, suppkey, shipdate)
        (1, 10, late),      # order 1: supp 10 late, supp 11 on time -> counts
        (1, 11, ontime),
        (2, 10, late),      # order 2: single supplier -> excluded
        (3, 10, late),      # order 3: BOTH late -> excluded
        (3, 11, late),
        (4, 11, ontime),    # order 4: supp 11 has an on-time AND a late line
        (4, 11, late),      #   (max(late)=1) + supp 12 on time -> counts for 11
        (4, 12, ontime),
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_shipdate": pa.array([r[2] for r in li], pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([t0] * 4, pa.timestamp("us")),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_name": pa.array(["SJ", "SK", "SL"], pa.string()),
    }), str(d / "supplier.parquet"))
    eng = R.waiting_suppliers(
        rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=4),
        pq.read_table(str(d / "orders.parquet")),
        pq.read_table(str(d / "supplier.parquet"))).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    orc = con.sql(R.waiting_suppliers_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = eng.set_index("s_suppkey")
    assert by.loc[10, "numwait"] == 1 and by.loc[11, "numwait"] == 1
    assert 12 not in by.index


def test_edge_shard_fold_hot_key(ray_session, tmp_path_factory):
    """Skew hostility for the shard-fold rewrites: ONE orderkey carries 90%
    of the line items and spans every input block — its per-batch partials
    must re-merge exactly in the okey%64 shard (big_orders HAVING) and the
    Q15 revenue fold must match the oracle despite the hot supplier."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_hot")
    hot_n = 900
    li_ok = [1] * hot_n + list(range(2, 102))
    li_qty = [1.0] * hot_n + [2.0] * 100
    t_in = np.datetime64(R.Q15_T0_US, "us")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(li_ok, pa.int64()),
        "l_quantity": pa.array(li_qty, pa.float64()),
        "l_suppkey": pa.array([7] * hot_n + [8] * 100, pa.int64()),
        "l_shipdate": pa.array([t_in] * (hot_n + 100), pa.timestamp("us")),
        "l_extendedprice": pa.array([1.0] * (hot_n + 100), pa.float64()),
        "l_discount": pa.array([0.0] * (hot_n + 100), pa.float64()),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(1, 102)), pa.int64()),
        "o_custkey": pa.array([5] * 101, pa.int64()),
        "o_orderdate": pa.array([t_in] * 101, pa.timestamp("us")),
        "o_totalprice": pa.array([10.0] * 101, pa.float64()),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([5], pa.int64()),
        "c_name": pa.array(["C5"], pa.string()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([7, 8], pa.int64()),
        "s_name": pa.array(["S7", "S8"], pa.string()),
    }), str(d / "supplier.parquet"))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    li = rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=8)
    # big_orders: the hot order totals 900 > 250 -> survives HAVING exactly once
    eng = R.big_orders(
        rd.read_parquet(str(d / "orders.parquet")), li,
        pq.read_table(str(d / "customer.parquet"))).to_pandas()
    orc = con.sql(R.big_orders_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) == 1 and (e.values == o.values).all(), (e, o)
    assert eng.iloc[0]["total_qty"] == hot_n
    # top_supplier: hot supplier 7 wins with exactly hot_n * 100 cents
    li2 = rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=8)
    eng2 = R.top_supplier(li2, pq.read_table(str(d / "supplier.parquet"))
                          ).to_pandas()
    orc2 = con.sql(R.top_supplier_sql()).df()
    e2, o2 = _canon(eng2), _canon(orc2)
    assert len(e2) == len(o2) == 1 and (e2.values == o2.values).all(), (e2, o2)
    assert eng2.iloc[0]["total_cents"] == hot_n * 100


def test_edge_acctbal_quantiles_boundaries(ray_session, tmp_path_factory):
    """Continuous-quantile hostiles vs percentile_disc: pct*N exactly on the
    integer boundary, duplicated values AT the percentile, negative
    balances (arithmetic-shift buckets), and multiple targets landing in
    ONE bucket."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_quant")
    # N=10: p50 -> 5th smallest, p90 -> 9th, p99 -> 10th (ceil rule);
    # values cluster so p90/p99 share a bucket; duplicates at the median
    vals = [-9.94, -9.94, 0.0, 1.23, 1.23, 1.23, 5.00, 5.01, 5.02, 99.99]
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(10), pa.int64()),
        "c_acctbal": pa.array(vals, pa.float64()),
    }), str(d / "customer.parquet"))
    eng = R.acctbal_quantiles(
        rd.read_parquet(str(d / "customer.parquet"), override_num_blocks=3))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{d}/customer.parquet')")
    orc = con.sql(R.acctbal_quantiles_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    by = eng.set_index("pct")
    assert by.loc[50, "value_cents"] == 123     # 5th smallest: the dup value
    assert by.loc[99, "value_cents"] == 9999    # ceil(9.9)=10th -> max

    # N=1 and N=2 degenerate tables
    for n, vs in ((1, [-3.33]), (2, [-3.33, 7.77])):
        d2 = tmp_path_factory.mktemp(f"edge_quant{n}")
        pq.write_table(pa.table({
            "c_custkey": pa.array(range(n), pa.int64()),
            "c_acctbal": pa.array(vs, pa.float64()),
        }), str(d2 / "customer.parquet"))
        e2 = _canon(R.acctbal_quantiles(
            rd.read_parquet(str(d2 / "customer.parquet"))))
        con2 = duckdb.connect()
        con2.sql(f"CREATE VIEW customer AS SELECT * FROM "
                 f"read_parquet('{d2}/customer.parquet')")
        o2 = _canon(con2.sql(R.acctbal_quantiles_sql()).df())
        assert (e2.values == o2.values).all(), (n, e2, o2)


def test_edge_local_supplier_same_nation(ray_session, tmp_path_factory):
    """Q5 hostiles: the SAME-NATION constraint (cross-nation fulfilment
    never counts even inside the region/window), region exclusion, and
    window bound inclusivity (>= start, < end)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d = tmp_path_factory.mktemp("edge_q5")
    t_in = np.datetime64(R.Q5_T0_US, "us")
    t_out = np.datetime64(R.Q5_T1_US, "us")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 2], pa.int64()),
        "r_name": pa.array(["AFRICA", "ASIA"], pa.string()),
    }), str(d / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2, 3], pa.int64()),
        "n_name": pa.array(["N1", "N2", "N3"], pa.string()),
        "n_regionkey": pa.array([2, 2, 0], pa.int32()),  # N3 outside ASIA
    }), str(d / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        "c_nationkey": pa.array([1, 2, 3], pa.int32()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([20, 21, 22], pa.int64()),
        "s_nationkey": pa.array([1, 2, 3], pa.int32()),
    }), str(d / "supplier.parquet"))
    orders = [(100, 10, t_in),                     # at window start: IN
              (101, 11, t_out),                    # at window end: OUT
              (102, 12, t_in),                     # non-ASIA customer
              (103, 10, t_in)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
        "o_orderdate": pa.array([o[2] for o in orders], pa.timestamp("us")),
    }), str(d / "orders.parquet"))
    li = [(100, 20, 100.0),   # cust N1 + supp N1: COUNTS
          (100, 21, 100.0),   # cust N1 + supp N2: cross-nation, OUT
          (101, 21, 100.0),   # window end: OUT
          (102, 22, 100.0),   # same nation but region AFRICA: OUT
          (103, 20, 50.0)]    # second qualifying order for N1
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
        "l_discount": pa.array([0.0] * len(li), pa.float64()),
    }), str(d / "lineitem.parquet"))
    t = lambda n: pq.read_table(str(d / f"{n}.parquet"))
    eng = R.local_supplier_revenue(
        rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=2),
        t("orders"), t("customer"), t("supplier"), t("nation"),
        t("region")).to_pandas()
    con = duckdb.connect()
    for name in ("lineitem", "orders", "customer", "supplier", "nation",
                 "region"):
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{d}/{name}.parquet')")
    orc = con.sql(R.local_supplier_revenue_sql()).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns), (e, o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    assert list(eng["n_name"]) == ["N1"] and int(eng["revenue_cents"].iloc[0]) == 15000


def test_edge_events_pivot_null_type(ray_session, tmp_path_factory):
    """NULL event_type folds into n_other on BOTH sides (ADVICE r3: the
    oracle's NOT IN dropped NULL rows while the engine counted them)."""
    d = tmp_path_factory.mktemp("edge_pivot_null")
    base = 1_700_000_000_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([base, base + 1, base + 2, base + 3],
                       pa.timestamp("us")),
        "event_type": pa.array(["view", None, "weird", None], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "props": pa.array(["{}"] * 4, pa.string()),
    })
    pq.write_table(tbl, str(d / "events.parquet"))
    _compare(ray_session, str(d), "events", "events_pivot")


def test_edge_acctbal_quantiles_empty(ray_session, tmp_path_factory):
    """Empty customer table: percentile_disc is NULL per pct row in the
    oracle; the engine short-circuits to the same shape (ADVICE r3: the
    fall-through indexed an empty histogram)."""
    d = tmp_path_factory.mktemp("edge_empty_cust")
    pq.write_table(pa.table({"c_custkey": pa.array([], pa.int64()),
                             "c_acctbal": pa.array([], pa.float64())}),
                   str(d / "customer.parquet"))
    _compare(ray_session, str(d), "customer", "acctbal_quantiles")


def test_edge_pages_nearest_way(ray_session, tmp_path_factory):
    """kNN spatial join hostiles vs the brute-force argmin oracle: a page
    EXACTLY equidistant between two ways (tie -> min way_id), a page on a
    shared vertex (distance 0), a desert page beyond the exhaustive-scan
    radius, and unparseable geotags (dropped like pages_geotag)."""
    import ray.data as rd

    from osm_intersections_ray.stages import knn

    d = tmp_path_factory.mktemp("edge_knn_join")

    def way(wid, name, lats, lons):
        return {"county": "K", "way_id": wid, "way_rank": wid,
                "minlat": min(lats), "minlon": min(lons),
                "maxlat": max(lats), "maxlon": max(lons),
                "nodes": [wid * 10 + i for i in range(len(lats))],
                "lats": lats, "lons": lons, "tagged": True,
                "name": name, "ref": "", "highway": "residential",
                "bridge": "", "junction": ""}

    rows = [
        way(1, "A St", [10.000, 10.010], [20.000, 20.000]),
        way(2, "B St", [10.000, 10.010], [20.020, 20.020]),  # tie line x=20.01
        way(3, "C St", [10.005, 10.005], [20.005, 20.006]),
    ]
    import pandas as pd
    wt = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    pq.write_table(wt, str(d / "ways.parquet"))

    def geo(lat, lon):
        return (f'<meta name="geo.position" content="{lat};{lon}">'
                .encode())

    pages = [
        ("tie", geo("10.0", "20.01")),       # equidistant ways 1 and 2
        ("on-vertex", geo("10.005", "20.005")),  # d=0 on way 3
        ("desert", geo("-60.0", "-120.0")),  # exhaustive-scan path
        ("badgeo", b"<html>no tag</html>"),  # dropped
        ("near-a", geo("10.002", "20.001")),
    ]
    pq.write_table(pa.table({
        "url": pa.array([u for u, _ in pages], pa.string()),
        "html": pa.array([h for _, h in pages], pa.binary()),
    }), str(d / "pages.parquet"))

    eng = knn.pages_nearest_way(
        rd.read_parquet(str(d / "pages.parquet")),
        rd.read_parquet(str(d / "ways.parquet"))).to_pandas()
    sql = knn.pages_nearest_way_sql(
        f"read_parquet('{d}/pages.parquet')", str(d / "ways.parquet"))
    _pages_compare(str(d), eng, sql)
    got = dict(zip(eng["url"], eng["way_id"]))
    # "tie" is only a tie in decimal: in binary |20.01-20.005| < 0.005, so
    # way 3 is strictly nearest on BOTH engines (the probe pins that the
    # engine reproduces the oracle's float arithmetic, not decimal ideals)
    assert got == {"tie": 3, "on-vertex": 3, "desert": 1, "near-a": 1}


def _tpch_edge_world(tmp_path_factory, name: str):
    """Tiny hostile TPC-H world shared by the round-4 relational probes."""
    d = tmp_path_factory.mktemp(name)
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["AFRICA", "AMERICA"], pa.string())}),
        str(d / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 6, 7], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_6", "NATION_7"], pa.string()),
        "n_regionkey": pa.array([0, 1, 1], pa.int64())}),
        str(d / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["C1", "C2", "C3", "C4"], pa.string()),
        "c_nationkey": pa.array([6, 0, 6, 7], pa.int64())}),
        str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_name": pa.array(["S10", "S11", "S12"], pa.string()),
        "s_nationkey": pa.array([6, 0, 6], pa.int64())}),
        str(d / "supplier.parquet"))
    pq.write_table(pa.table({
        # part 100: size qualifies (20 % 10 == 0); part 101: size 7 filtered;
        # part 102: qualifies but appears in no lineitem
        "p_partkey": pa.array([100, 101, 102], pa.int64()),
        "p_brand": pa.array(["B#1", "B#2", "B#3"], pa.string()),
        "p_size": pa.array([20, 7, 30], pa.int64())}),
        str(d / "part.parquet"))
    pq.write_table(pa.table({
        # cust 1 (in-region): orders 1, 2; cust 2 (out-region): order 3;
        # cust 3 (in-region): no orders at all; cust 4: only URGENT orders
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 4], pa.int64()),
        "o_orderdate": pa.array([ts("1995-06-01"), ts("1996-06-01"),
                                 ts("1995-06-01"), ts("1995-06-01")],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["5-LOW", "5-LOW", "5-LOW", "1-URGENT"],
                                    pa.string())}),
        str(d / "orders.parquet"))
    li = [
        # (okey, pkey, skey, returnflag, extprice, disc)
        (1, 100, 10, "R", 100.00, 0.0),   # q2 pair (100,10) line A
        (1, 100, 10, "N", 50.00, 0.0),    # same pair, cheaper -> its min
        (1, 100, 12, "R", 50.00, 0.0),    # cost TIE with (100,10) -> suppkey 10 wins
        (2, 101, 11, "R", 999.00, 0.0),   # part filtered by size on q2
        (3, 100, 11, "R", 70.00, 0.5),    # out-region cust for q8; R-revenue for cust 2
        (4, 100, 10, "N", 10.00, 0.0),    # no R flag -> q10 ignores
        (4, 100, 12, "N", 10.00, 0.0),    # min-cost TIE (100,10)=(100,12)=1000
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_partkey": pa.array([r[1] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in li], pa.int64()),
        "l_returnflag": pa.array([r[3] for r in li], pa.string()),
        "l_extendedprice": pa.array([r[4] for r in li], pa.float64()),
        "l_discount": pa.array([r[5] for r in li], pa.float64()),
    }), str(d / "lineitem.parquet"))
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    return d, con


def _rel_compare(eng, con, sql):
    orc = con.sql(sql).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o), f"rows {len(e)} vs {len(o)}\n{e}\n{o}"
    assert list(e.columns) == list(o.columns), (e.columns, o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    return e


def test_edge_min_cost_supplier(ray_session, tmp_path_factory):
    """Q2 hostiles: duplicate (part, supp) pairs collapse to their min, a
    cost tie resolves to the smaller suppkey, the size filter drops parts,
    and a qualifying part with no lineitems emits nothing."""
    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d, con = _tpch_edge_world(tmp_path_factory, "edge_q2")
    eng = R.min_cost_supplier(
        rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=3),
        pq.read_table(str(d / "part.parquet")),
        pq.read_table(str(d / "supplier.parquet")),
        pq.read_table(str(d / "nation.parquet"))).to_pandas()
    e = _rel_compare(eng, con, R.min_cost_supplier_sql())
    assert len(e) == 1  # only part 100 survives
    row = eng.iloc[0]
    assert row["p_partkey"] == 100 and row["s_suppkey"] == 10
    assert row["cost_cents"] == 1000  # suppliers 10 and 12 tie -> smaller key


def test_edge_returned_item_revenue(ray_session, tmp_path_factory):
    """Q10 hostiles: only R-flagged lines count, discounts hit the cents
    rounding, fewer qualifying customers than k."""
    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d, con = _tpch_edge_world(tmp_path_factory, "edge_q10")
    eng = R.returned_item_revenue(
        rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=3),
        rd.read_parquet(str(d / "orders.parquet"), override_num_blocks=2),
        pq.read_table(str(d / "customer.parquet")),
        pq.read_table(str(d / "nation.parquet"))).to_pandas()
    e = _rel_compare(eng, con, R.returned_item_revenue_sql())
    by = eng.set_index("c_custkey")
    assert by.loc[1, "rev_cents"] == 114900  # orders 1+2: 100.00+50.00+999.00 R
    assert by.loc[2, "rev_cents"] == 3500   # 70.00 * 0.5 R
    assert 4 not in by.index                # its only line is N-flagged


def test_edge_order_count_distribution(ray_session, tmp_path_factory):
    """Q13 hostiles: the zero bucket includes both the order-less customer
    AND the all-URGENT customer (its orders are filtered)."""
    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d, con = _tpch_edge_world(tmp_path_factory, "edge_q13")
    eng = R.order_count_distribution(
        rd.read_parquet(str(d / "customer.parquet"), override_num_blocks=2),
        rd.read_parquet(str(d / "orders.parquet"), override_num_blocks=2)).to_pandas()
    _rel_compare(eng, con, R.order_count_distribution_sql())
    by = eng.set_index("order_count")["n_customers"]
    assert by.loc[0] == 2  # cust 3 (no orders) + cust 4 (urgent-only)
    assert by.loc[1] == 1 and by.loc[2] == 1


def test_edge_nation_market_share(ray_session, tmp_path_factory):
    """Q8 hostiles: out-region customers excluded entirely, target vs
    non-target supplier split inside one order, per-year buckets."""
    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d, con = _tpch_edge_world(tmp_path_factory, "edge_q8")
    eng = R.nation_market_share(
        rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=3),
        rd.read_parquet(str(d / "orders.parquet"), override_num_blocks=2),
        pq.read_table(str(d / "customer.parquet")),
        pq.read_table(str(d / "supplier.parquet")),
        pq.read_table(str(d / "nation.parquet")),
        pq.read_table(str(d / "region.parquet"))).to_pandas()
    _rel_compare(eng, con, R.nation_market_share_sql())
    by = eng.set_index("o_year")
    # 1995: order 1 (cust 1, lines 10000+5000+5000, all target-nation supps)
    #       + order 4 (cust 4 in-region, 1000c+1000c, target supps 10 and 12)
    assert by.loc[1995, "total_cents"] == 22000
    assert by.loc[1995, "target_cents"] == 22000
    # 1996: order 2 = one 99900c line via supp 11 (NATION_0, non-target)
    assert by.loc[1996, "total_cents"] == 99900
    assert by.loc[1996, "target_cents"] == 0
    # order 3 (cust 2, NATION_0 -> out-region) contributes nowhere
    assert len(by) == 2


def test_edge_link_graph_ops(ray_session, tmp_path_factory):
    """Link-graph hostiles: a page with zero links emits no edge rows, a
    self-link counts, anchor ties resolve lexicographically, duplicate
    identical links accumulate, frontier targets (absent from the corpus)
    are excluded from the anchor index but counted by link_frontier, and
    empty anchors survive extraction."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as P

    d = tmp_path_factory.mktemp("edge_links")
    u = lambda i: f"https://example.org/en/page-{i:07d}"

    def html(*links):
        body = "".join(f'<a href="{t}">{a}</a>' for t, a in links)
        return (f'<html><body><p class="links">{body}</p></body></html>'
                .encode())

    rows = [
        (u(0), html((u(1), "beta"), (u(1), "alpha"), (u(1), "alpha"),
                    (u(9), "gone"))),          # dup anchors + frontier target
        (u(1), html((u(1), "self"), (u(2), ""))),  # self-link + empty anchor
        (u(2), html()),                         # zero links
        (u(3), html((u(1), "beta"), ("https://other.net/misc/x", "offsite"),
                    ("https://other.net/nosection", "dropped"))),
    ]
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array([r[1] for r in rows], pa.binary()),
    }), str(d / "pages.parquet"))

    con = duckdb.connect()
    tbl = f"read_parquet('{d}/pages.parquet')"
    ds = lambda: rd.read_parquet(str(d / "pages.parquet"),
                                 override_num_blocks=2)

    links = P.page_links(ds()).to_pandas()
    _rel_compare(links, con, P.page_links_sql(tbl))
    assert len(links) == 9  # 4 + 2 + 0 + 3

    idx = P.anchor_text_index(ds()).to_pandas()
    _rel_compare(idx, con, P.anchor_text_index_sql(tbl))
    by = idx.set_index("url")
    # page 1: inlinks = 3 from page 0 + 1 self + 1 from page 3 = 5;
    # anchor counts: alpha 2, beta 2, self 1 -> tie alpha/beta -> alpha
    assert by.loc[u(1), "n_inlinks"] == 5
    assert by.loc[u(1), "top_anchor"] == "alpha"
    assert by.loc[u(2), "top_anchor"] == ""  # the empty anchor
    assert u(9) not in by.index              # frontier target excluded

    fr = P.link_frontier(ds()).to_pandas()
    _rel_compare(fr, con, P.link_frontier_sql(tbl))
    # frontier = u(9) (en) + other.net/misc/x (misc); the section-less
    # other.net/nosection drops on both sides
    assert dict(zip(fr["section"], fr["n_frontier"])) == {"en": 1, "misc": 1}

    sg = P.section_link_graph(ds()).to_pandas()
    _rel_compare(sg, con, P.section_link_graph_sql(tbl))
    got = {(a, b): (int(n), int(ud)) for a, b, n, ud in zip(
        sg["src_section"], sg["dst_section"], sg["n_links"],
        sg["n_unique_dst"])}
    # en->en: 4 (page0) + 2 (page1) + 1 (page3) links over dst {u1,u9,u2};
    # en->misc: the offsite link; nosection drops on both sides
    assert got == {("en", "en"): (7, 3), ("en", "misc"): (1, 1)}


def _tpch_edge_world2(tmp_path_factory, name: str):
    """Hostile world for the Q4/Q6/Q7/Q9/Q11/Q12/Q16/Q20 shapes: every
    filter boundary (date windows, discount band, size whitelist, excluded
    supplier, same-nation pair, prefix-vs-contains name match) has a row
    sitting exactly on it."""
    d = tmp_path_factory.mktemp(name)
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 3, 9], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_3", "NATION_9"],
                           pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64())}),
        str(d / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11, 12, 13], pa.int64()),
        "s_name": pa.array(["S10", "S11", "S12", "S13"], pa.string()),
        "s_nationkey": pa.array([3, 9, 0, 3], pa.int64()),
        "s_acctbal": pa.array([5.0, 5.0, 5.0, -5.0], pa.float64())}),
        str(d / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([3, 9, 0], pa.int64())}),
        str(d / "customer.parquet"))
    pq.write_table(pa.table({
        # 100: red-prefix, group (B#1,T1,5); 101: CONTAINS red but not
        # prefix, SAME group as 100; 102: excluded brand; 103: size off
        # the Q16 whitelist
        "p_partkey": pa.array([100, 101, 102, 103], pa.int64()),
        "p_name": pa.array(["red widget", "dark red bolt", "blue gear",
                            "red gizmo"], pa.string()),
        "p_brand": pa.array(["B#1", "B#1", "Brand#13", "B#2"],
                            pa.string()),
        "p_type": pa.array(["T1", "T1", "T1", "T2"], pa.string()),
        "p_size": pa.array([5, 5, 5, 7], pa.int64())}),
        str(d / "part.parquet"))
    pq.write_table(pa.table({
        # o1: in Q4 window, URGENT, one late item among several on-time;
        # o2: in window, no late item; o3: OUTSIDE window but late;
        # o4: window edge (9-30), late item ships in 1997 (off Q12 window)
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 2, 1, 3], pa.int64()),
        "o_orderdate": pa.array(
            [ts("1996-07-15"), ts("1996-08-01"), ts("1995-01-01"),
             ts("1996-09-30")], pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "5-LOW", "2-HIGH", "3-MEDIUM"], pa.string())}),
        str(d / "orders.parquet"))
    li = [
        # (ok, pk, sk, qty, px, disc, status, shipdate)
        (1, 100, 10, 10, 100.0, 0.05, "O", "1996-10-20"),  # late; Q6 in-band
        (1, 101, 11, 30, 50.0, 0.06, "F", "1996-09-01"),   # qty>=24 off Q6; Q7 B->A
        (2, 100, 10, 5, 40.0, 0.07, "O", "1996-09-05"),    # on-time; Q7 A->B
        (3, 103, 12, 24, 10.0, 0.04, "F", "1995-06-01"),   # late but o3 off-window
        (4, 100, 13, 100, 100.0, 0.0, "O", "1997-01-15"),  # late; excluded supp Q16
        (4, 100, 10, 3, 10.0, 0.10, "F", "1996-10-05"),    # on-time (EXISTS already true)
        (2, 101, 10, 200, 20.0, 0.05, "O", "1996-06-01"),  # not red-PREFIX -> off Q20
        (1, 100, 10, 160, 5.0, 0.05, "O", "1996-05-01"),   # pushes s10 over Q20 bar
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_partkey": pa.array([r[1] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in li], pa.int64()),
        "l_quantity": pa.array([float(r[3]) for r in li], pa.float64()),
        "l_extendedprice": pa.array([r[4] for r in li], pa.float64()),
        "l_discount": pa.array([r[5] for r in li], pa.float64()),
        "l_linestatus": pa.array([r[6] for r in li], pa.string()),
        "l_shipdate": pa.array([np.datetime64(r[7], "us") for r in li],
                               pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    import duckdb

    con = duckdb.connect()
    for t in ("nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    return d, con


def test_edge_q4_q6_q12(ray_session, tmp_path_factory):
    """Q4: EXISTS counts an order once however many late items; windows are
    half-open.  Q6: the discount band is integer-cents closed.  Q12: late
    split rides the ship-year window, not the order window."""
    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d, con = _tpch_edge_world2(tmp_path_factory, "edge_q4612")
    r = lambda t: rd.read_parquet(str(d / f"{t}.parquet"),
                                  override_num_blocks=2)
    q4 = R.order_priority_counts(r("orders"), r("lineitem")).to_pandas()
    _rel_compare(q4, con, R.order_priority_counts_sql())
    assert dict(zip(q4["o_orderpriority"], q4["n_orders"])) == {
        "1-URGENT": 1, "3-MEDIUM": 1}

    q6 = R.forecast_revenue(r("lineitem")).to_pandas()
    _rel_compare(q6, con, R.forecast_revenue_sql())
    assert int(q6["revenue_cents"].iloc[0]) == 500 + 280
    assert int(q6["n_items"].iloc[0]) == 2

    q12 = R.late_lineitem_modes(r("lineitem"), r("orders")).to_pandas()
    _rel_compare(q12, con, R.late_lineitem_modes_sql())
    assert dict(zip(q12["l_linestatus"], q12["high_line_count"])) == {"O": 1}
    assert dict(zip(q12["l_linestatus"], q12["low_line_count"])) == {"O": 0}


def test_edge_q7_q9(ray_session, tmp_path_factory):
    """Q7: same-nation flows are excluded, both directions come back.
    Q9: contains-match includes 'dark red bolt'; year is the ORDER year."""
    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d, con = _tpch_edge_world2(tmp_path_factory, "edge_q79")
    t = lambda n: pq.read_table(str(d / f"{n}.parquet"))
    r = lambda n: rd.read_parquet(str(d / f"{n}.parquet"),
                                  override_num_blocks=2)
    q7 = R.volume_shipping(r("lineitem"), r("orders"), t("customer"),
                           t("supplier"), t("nation")).to_pandas()
    _rel_compare(q7, con, R.volume_shipping_sql())
    got = {(a, b): c for a, b, c in zip(q7["supp_nation"],
                                        q7["cust_nation"],
                                        q7["revenue_cents"])}
    # o1-p100 (s10 N3, cust N3) is same-nation: excluded; A->B carries
    # BOTH o2 items (3720 + 1900)
    assert got == {("NATION_3", "NATION_9"): 5620,
                   ("NATION_9", "NATION_3"): 4700}

    q9 = R.product_type_profit(r("lineitem"), r("orders"), t("part"),
                               t("supplier"), t("nation")).to_pandas()
    _rel_compare(q9, con, R.product_type_profit_sql())
    n0 = q9[(q9["nation"] == "NATION_0") & (q9["o_year"] == 1995)]
    assert int(n0["profit_cents"].iloc[0]) == 960  # 10.00 * 0.96 on o3


def test_edge_q11_q16_q20(ray_session, tmp_path_factory):
    """Q16: same group over two different parts + one supplier counts ONCE,
    and the negative-acctbal supplier is excluded.  Q20: prefix match only,
    window bounds, threshold strict.  Q11: integer cross-multiplied share."""
    import ray.data as rd

    from osm_intersections_ray.stages import relational as R

    d, con = _tpch_edge_world2(tmp_path_factory, "edge_q111620")
    t = lambda n: pq.read_table(str(d / f"{n}.parquet"))
    r = lambda n: rd.read_parquet(str(d / f"{n}.parquet"),
                                  override_num_blocks=2)
    q16 = R.part_supplier_variety(r("lineitem"), t("part"),
                                  t("supplier")).to_pandas()
    _rel_compare(q16, con, R.part_supplier_variety_sql())
    assert len(q16) == 1  # only (B#1, T1, 5) survives the filters
    assert int(q16["supplier_cnt"].iloc[0]) == 2  # s10 once, s11; s13 out

    q20 = R.promo_part_suppliers(r("lineitem"), t("part"), t("supplier"),
                                 t("nation")).to_pandas()
    _rel_compare(q20, con, R.promo_part_suppliers_sql())
    assert q20["s_suppkey"].tolist() == [10]
    # s10's four in-window red-prefix rows (10+5+3+160); the 1997 row and
    # the contains-only 'dark red bolt' rows stay out
    assert int(q20["qty_units"].iloc[0]) == 178

    q11 = R.important_parts(r("lineitem")).to_pandas()
    _rel_compare(q11, con, R.important_parts_sql())


def test_edge_way_triangles_hostile(ray_session, tmp_path_factory):
    """Triangle census hostiles: a K4 (every way in 3 triangles, degree 3),
    a triangle whose two members ALSO share a second node (still one edge),
    a closed-ring way (duplicate node in its own list), an untagged way
    wired into the K4 (must not create edges), and an isolated way (no
    output row)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import graph as G

    d = tmp_path_factory.mktemp("edge_triangles")
    # node ids: n(i,j) shared by ways i and j
    def n(i, j):
        return 1000 + 10 * min(i, j) + max(i, j)

    rows = [
        # K4 over ways 1..4: each pair shares one node
        (1, [n(1, 2), n(1, 3), n(1, 4)], True),
        (2, [n(1, 2), n(2, 3), n(2, 4)], True),
        (3, [n(1, 3), n(2, 3), n(3, 4)], True),
        (4, [n(1, 4), n(2, 4), n(3, 4)], True),
        # triangle {5,6,7}; 5 and 6 share TWO nodes (55 and 56) and 5 is a
        # closed ring (repeats node 55)
        (5, [55, 56, 57, 55], True),
        (6, [55, 56, 58], True),
        (7, [57, 58], True),
        # untagged way touching the K4: contributes nothing
        (8, [n(1, 2), n(3, 4)], False),
        # isolated tagged way: degree 0, no row
        (9, [99], True),
    ]
    tbl = pa.table({
        "way_id": pa.array([r[0] for r in rows], pa.int64()),
        "nodes": pa.array([r[1] for r in rows], pa.list_(pa.int64())),
        "tagged": pa.array([r[2] for r in rows], pa.bool_()),
    })
    path = str(d / "ways.parquet")
    pq.write_table(tbl, path)

    eng = (G.way_triangles(rd.read_parquet(path, override_num_blocks=3))
           .to_pandas().sort_values("way_id").reset_index(drop=True))
    orc = (duckdb.sql(G.way_triangles_sql(path)).df()
           .sort_values("way_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, orc[eng.columns], check_dtype=False)
    got = {int(r.way_id): (int(r.degree), int(r.n_triangles))
           for r in eng.itertuples()}
    assert got == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (3, 3),
                   5: (2, 1), 6: (2, 1), 7: (2, 1)}


def test_edge_session_concurrency_intervals(ray_session, tmp_path_factory):
    """Interval-overlap hostiles: exact-touch (end == other's start counts,
    +1us does not), containment, identical intervals, a session crossing
    the hour rank-bucket boundary, and boundary-exact timestamps."""
    d = tmp_path_factory.mktemp("edge_conc")
    H = 3_600_000_000
    S = 1_000_000
    base = 1_700_000_000_000_000
    # (user, [offsets]) -> one session per user (gaps < 30 min)
    worlds = [
        (1, [0]),                      # point interval [0, 0]
        (2, [0, 600 * S]),             # [0, 600s]
        (3, [600 * S, 1200 * S]),      # starts EXACTLY at u2's end: overlap
        (4, [1200 * S + 1, 1300 * S]), # 1us after u3 ends: NO overlap with u3
        (5, [0, 1290 * S, 1300 * S]),  # contains everything above
        (6, [0, 600 * S]),             # identical to u2
        (7, [H - 1000, H + 1000]),     # crosses the hour bucket boundary
        (8, [H]),                      # point exactly ON the boundary
    ]
    rows = [(u, off) for u, offs in worlds for off in offs]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([base + off for _, off in rows], pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["a"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(d / "events.parquet"))
    _compare(ray_session, str(d), "events", "session_concurrency")
    # spot-check the touch/containment logic against hand counts
    from osm_intersections_ray.queries import queries

    got = {int(r.user_id): int(r.n_concurrent)
           for r in queries()["session_concurrency"](str(d))
           .to_pandas().itertuples()}
    assert got == {1: 3,   # u2, u5, u6 (point 0 inside each)
                   2: 4, 6: 4,      # each other + u1, u3 (touch), u5
                   3: 3,   # u2 + u6 (both touch at 600s), u5
                   4: 1,   # u5 only (u3 ends 1us before)
                   5: 5,   # u1, u2, u3, u4, u6 (u7/u8 start after 1300s)
                   7: 1, 8: 1}      # u7 and u8 overlap each other


def test_edge_table_profile_hostile(ray_session, tmp_path_factory):
    """Profiler hostiles: NULLs in every type, -0.0 vs 0.0 (one distinct
    value), empty string vs NULL (distinct counts the empty string only),
    duplicate timestamps, and an all-NULL column."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import curation as C

    d = tmp_path_factory.mktemp("edge_profile")
    tbl = pa.table({
        "i": pa.array([1, 1, 2, None, None], pa.int64()),
        "f": pa.array([0.0, -0.0, 1.5, 1.5, None], pa.float64()),
        "s": pa.array(["", "", "x", None, "x"], pa.string()),
        "t": pa.array([1_700_000_000_000_000, 1_700_000_000_000_000,
                       0, None, 1], pa.timestamp("us")),
        "z": pa.array([None] * 5, pa.int64()),
    })
    path = str(d / "t.parquet")
    pq.write_table(tbl, path)

    eng = (C.table_profile(rd.read_parquet(path, override_num_blocks=2))
           .to_pandas().sort_values("col").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}')")
    orc = (con.sql(C.table_profile_sql("t", ["i", "f", "s", "t", "z"])).df()
           .sort_values("col").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, orc[eng.columns], check_dtype=False)
    got = {r.col: (int(r.n_rows), int(r.n_null), int(r.n_distinct))
           for r in eng.itertuples()}
    assert got == {"i": (5, 2, 2), "f": (5, 1, 2), "s": (5, 1, 2),
                   "t": (5, 1, 3), "z": (5, 5, 0)}


def test_edge_host_split(ray_session, tmp_path_factory):
    """Leakage-safe split hostiles: mixed-case scheme AND host collapse to
    one host (one split), host:port is a distinct host, unparseable urls
    drop, and the grouping property holds — every page of a host carries
    the same split."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import curation

    d = tmp_path_factory.mktemp("edge_hsplit")
    urls = (
        [f"https://site.example/{i}" for i in range(4)]
        + ["HTTPS://SITE.EXAMPLE/shouty", "http://site.example/other-scheme"]
        + ["https://site.example:8080/ported"]
        + ["ftp://nope.example/x", "not a url", ""]
        + [f"https://h{i}.example/only" for i in range(20)]
    )
    pq.write_table(pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array([b""] * len(urls), pa.binary()),
    }), str(d / "pages.parquet"))

    eng = curation.host_split(
        rd.read_parquet(str(d / "pages.parquet"), columns=["url"])).to_pandas()
    con = duckdb.connect()
    orc = con.sql(curation.host_split_sql(
        f"read_parquet('{d}/pages.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
    # grouping property: one split per host; case-folded host merges
    per_host = eng.groupby("host")["split"].nunique()
    assert (per_host == 1).all()
    assert (eng[eng["url"].str.lower().str.contains("site.example/")]
            ["host"] == "site.example").all()
    assert len(eng) == len(urls) - 3  # the three junk urls dropped
    # with 20+ hosts the buckets should realize more than one split
    assert eng["split"].nunique() >= 2


def test_edge_rasterize_ways_hostiles(ray_session, tmp_path_factory):
    """Supercover raster hostiles: a 45-degree diagonal whose line passes
    EXACTLY through cell corners (corner-touch counts on both sides: 5
    diagonal cells + 8 corner-touched = 13, strictly fewer than the 25-cell
    bbox cover), a horizontal segment lying exactly ON a cell row boundary
    (both adjacent rows hit), a degenerate zero-length segment (point
    raster), a 1-vertex way (no segments), an untagged way (excluded), and
    two ways meeting in one cell (n_ways = 2)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import queries_spatial as qs

    d = tmp_path_factory.mktemp("edge_rast")
    rows = [
        # (way_id, tagged, lats, lons)
        (1, True, [0.0005, 0.0495], [0.0005, 0.0495]),      # exact diagonal
        (2, True, [0.02, 0.02], [0.105, 0.125]),            # on row boundary
        (3, True, [0.555, 0.555], [0.555, 0.555]),          # point segment
        (4, True, [0.7], [0.7]),                            # 1 vertex
        (5, False, [0.9, 0.91], [0.9, 0.91]),               # untagged
        (6, True, [0.5551, 0.5552], [0.5551, 0.5552]),      # same cell as 3
        (7, True, [-0.0005, -0.0006], [-0.0005, -0.0006]),  # negative coords
    ]
    pq.write_table(pa.table({
        "way_id": pa.array([r[0] for r in rows], pa.int64()),
        "tagged": pa.array([r[1] for r in rows], pa.bool_()),
        "lats": pa.array([r[2] for r in rows], pa.list_(pa.float64())),
        "lons": pa.array([r[3] for r in rows], pa.list_(pa.float64())),
    }), str(d / "ways.parquet"))
    eng = qs.rasterize_ways(rd.read_parquet(str(d / "ways.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(qs.rasterize_ways_sql(f"{d}/ways.parquet")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"

    cells = {(int(r["klng"]), int(r["klat"])): (int(r["n_ways"]), int(r["n_segments"]))
             for _, r in eng.iterrows()}
    diag = {(k, k) for k in range(5)} | {(k, k + 1) for k in range(4)} | \
           {(k + 1, k) for k in range(4)}
    assert {c for c in cells if 0 <= c[0] <= 4 and 0 <= c[1] <= 4
            and c != (0, 0)} | {(0, 0)} >= diag
    assert all(c in cells for c in diag) and len(
        [c for c in cells if 0 <= c[0] <= 4 and 0 <= c[1] <= 4]) == 13
    # horizontal segment exactly on the klat=2 row boundary: rows 1 and 2
    for klng in (10, 11, 12):
        assert cells[(klng, 1)][1] == 1 and cells[(klng, 2)][1] == 1
    assert cells[(55, 55)] == (2, 2)            # point segment + neighbor way
    assert (-1, -1) in cells                    # negative coords
    assert all(kl != 70 for kl, _ in cells)     # 1-vertex way emits nothing
    assert all(kl != 90 for kl, _ in cells)     # untagged excluded


def test_edge_gopher_quality_boundaries(ray_session, tmp_path_factory):
    """Gopher-rule boundary hostiles: 49 vs 50 words, exactly 1 vs 2
    stopwords, all-3-char words (mean-length lower bound inclusive),
    11-char words (upper bound broken), '....' overlap counting (one
    non-overlapping '...' both sides), exactly-90% bullet lines, numeric
    non-alpha tokens at the 80% boundary, NULL and empty text."""
    d = tmp_path_factory.mktemp("edge_gopher")
    ok50 = "the and " + " ".join(f"word{i:03d}" for i in range(48))  # 50 words, 2 stops
    texts = [
        ok50,                                            # everything passes
        "the and " + " ".join(f"w{i:03d}" for i in range(47)),   # 49 words
        "the " + " ".join(f"word{i:03d}" for i in range(49)),    # 1 stopword
        "the and " + " ".join(["abc"] * 48),             # mean len 3.04 -> ok
        "the and " + " ".join(["abcdefghijk"] * 48),     # 11-char words
        ok50 + " ....",                                  # '....' = one '...'
        "keep\n" + "- b\n" * 9,                          # 9/10 bullet = ok
        "- a\n" * 10,                                    # 100% bullet
        ok50.replace("word000", "12345"),                # one numeric token
        "the and " + " ".join(["123"] * 48),             # 96% numeric
        "",                                              # empty
        None,                                            # NULL
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(d / "documents.parquet"))
    _compare(ray_session, str(d), "documents", "gopher_quality")

    from osm_intersections_ray.queries import queries

    out = queries()["gopher_quality"](str(d)).to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "keep"])
    assert not out.loc[1, "r_len"] and not out.loc[2, "r_stop"]
    assert bool(out.loc[3, "r_wordlen"]) and not out.loc[4, "r_wordlen"]
    assert bool(out.loc[5, "r_symbol"])      # 1 ellipsis vs 51 words
    assert bool(out.loc[6, "r_bullet"]) and not out.loc[7, "r_bullet"]
    assert bool(out.loc[8, "r_alpha"]) and not out.loc[9, "r_alpha"]
    assert not out.loc[10, "r_len"] and out.loc[10, "n_words"] == 0
    assert pd.isna(out.loc[11, "keep"]) and pd.isna(out.loc[11, "n_words"])


def test_edge_surt_index_hostiles(ray_session, tmp_path_factory):
    """SURT hostiles: uppercase scheme+host fold with the default :443
    stripped, :80 on httpS is NOT default and stays inside its label, the
    fragment drops while the query survives (lowercased), trailing slashes
    collapse to '/', a dotless single-label host, a non-http scheme drops,
    and repeated captures split n_captures vs n_urls."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg

    d = tmp_path_factory.mktemp("edge_surt")
    us = int(pd.Timestamp("2024-01-01").value // 1000)
    rows = [
        ("https://www.Example.COM:443/A/B?Q=1#frag", us),
        ("https://www.example.com/a/b?q=1", us + 1),      # same SURT as row 0
        ("https://www.example.com/a/b?q=1", us + 2),      # repeat capture
        ("HTTP://HOST:80/", us),                          # default :80 strips
        ("https://host:80/x", us),                        # :80 NOT default
        ("https://single/", us),                          # dotless host
        ("https://e.com/path///", us),                    # trailing slashes
        ("https://e.com/path", us + 5),                   # same SURT as above
        ("ftp://e.com/path", us),                         # non-http drops
    ]
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows],
                            pa.timestamp("us")),
    }), str(d / "pages.parquet"))
    eng = pg.surt_index(
        rd.read_parquet(str(d / "pages.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(pg.surt_index_sql(
        f"read_parquet('{d}/pages.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    got = {r["surt"]: (int(r["n_captures"]), int(r["n_urls"]),
                       int(r["first_ts_us"]), int(r["last_ts_us"]))
           for _, r in eng.iterrows()}
    assert got["com,example,www)/a/b?q=1"] == (3, 2, us, us + 2)
    assert "host)/" in got                      # :80 stripped on http
    assert "host:80)/x" in got                  # :80 kept on https
    assert "single)/" in got
    assert got["com,e)/path"] == (2, 2, us, us + 5)
    assert not any(s.startswith("com,e)/path/") for s in got)
    assert len(got) == 5                        # ftp row contributed nothing


def test_edge_morton_tiles_hostiles(ray_session, tmp_path_factory):
    """Morton-encode hostiles: exact interleave check at known cell indices
    (ix=3, iy=5 -> morton 39), the domain corners (clip to 0 and to the
    65535 max on both axes -> morton 0 and 2^32-1), out-of-domain
    coordinates clipping, a NaN geotag and a missing geotag both dropped."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg

    d = tmp_path_factory.mktemp("edge_morton")
    cell = 360.0 / 65536.0
    mk = lambda lat, lon: (
        f'<html><meta name="geo.position" content="{lat};{lon}"></html>'
        .encode())
    htmls = [
        mk(-90.0 + (5 + 0.5) * 180.0 / 65536.0, -180.0 + (3 + 0.5) * cell),
        mk(-90.0, -180.0),            # corner -> morton 0
        mk(90.0, 180.0),              # corner clips to 65535 -> 2^32-1
        mk(91.0, 200.0),              # out of domain clips the same way
        mk("nan", 1.0),               # NaN -> dropped
        b"<html>no geotag</html>",    # missing -> dropped
    ]
    pq.write_table(pa.table({
        "url": pa.array([f"https://e.com/{i}" for i in range(len(htmls))],
                        pa.string()),
        "html": pa.array(htmls, pa.binary()),
    }), str(d / "pages.parquet"))
    eng = pg.morton_tiles(
        rd.read_parquet(str(d / "pages.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(pg.morton_tiles_sql(
        f"read_parquet('{d}/pages.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    by_tile = {int(r["m_tile"]): r for _, r in eng.iterrows()}
    assert by_tile[0]["min_morton"] == 0 and by_tile[0]["max_morton"] == 39
    assert int(by_tile[0]["n_pages"]) == 2
    top = (2**32 - 1) >> 20
    assert by_tile[top]["min_morton"] == 2**32 - 1
    assert int(by_tile[top]["n_pages"]) == 2      # corner + clipped twin
    assert int(eng["n_pages"].sum()) == 4         # NaN + missing dropped


def test_edge_hourly_burst_boundaries(ray_session, tmp_path_factory):
    """Trailing-window hostiles: the first hour (empty window -> NULL, not
    a burst), an hour exactly 24h later (boundary INCLUDED in the frame),
    an hour 25h later across a quiet gap (window empty again -> NULL),
    n == 2*max (strict >, not a burst) vs n == 2*max + 1 (burst), and a
    NULL ts row dropped on both sides."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import events as ev

    d = tmp_path_factory.mktemp("edge_burst")
    T0 = pd.Timestamp("2024-03-01 00:30:00")
    H = pd.Timedelta(hours=1)
    stamps = []
    stamps += [T0] * 3                       # hour 0: n=3 (first -> NULL)
    stamps += [T0 + H] * 7                   # hour 1: n=7, trail_max=3 -> burst
    stamps += [T0 + 24 * H] * 14             # hour 24: frame [0,23] max=7 -> 14 == 2*7, NOT burst
    stamps += [T0 + 25 * H] * 15             # hour 25: frame [1,24] max=14 -> not burst; 15 > 2*7 though frame has 14
    stamps += [T0 + 50 * H] * 2              # hour 50: >24h quiet gap -> NULL
    stamps += [None]                         # NULL ts dropped
    pq.write_table(pa.table({
        "ts": pa.array(stamps, pa.timestamp("us")),
    }), str(d / "events.parquet"))
    eng = ev.hourly_burst(
        rd.read_parquet(str(d / "events.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(ev.hourly_burst_sql(
        f"read_parquet('{d}/events.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    by = {r["hour"].hour + 24 * (r["hour"].day - 1): r
          for _, r in eng.iterrows()}
    assert pd.isna(by[0]["burst"]) and pd.isna(by[0]["trail_max"])
    assert by[1]["burst"] == 1 and by[1]["trail_max"] == 3
    assert by[24]["burst"] == 0 and by[24]["trail_max"] == 7   # 14 == 2*7
    assert by[25]["burst"] == 0 and by[25]["trail_max"] == 14  # hour-0 aged out? no: [1,24] max 14
    assert pd.isna(by[50]["burst"])                            # empty window
    assert int(eng["n"].sum()) == 41                           # NULL ts dropped


def test_edge_simplify_ways_stencil(ray_session, tmp_path_factory):
    """Area-stencil hostiles: exactly-collinear interior vertices drop
    (cross = 0), a vertex whose |cross| equals the threshold EXACTLY stays
    (>=, inclusive), one unit below drops, endpoints always survive (even
    on a 2-point way and a 1-point way), and a closed ring keeps its
    duplicated endpoint twice."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import queries_spatial as qs

    d = tmp_path_factory.mktemp("edge_simp")
    # |cross| for interior vertex of ((0,0),(d,h),(2d,0)) = 2*d*h (udeg).
    # With d = 1000 udeg: h = 500 -> cross = 1_000_000 == threshold (kept);
    # h = 499 -> 998_000 (dropped).
    rows = [
        (1, [0.0, 0.0005, 0.0], [0.0, 0.001, 0.002]),      # cross == T -> kept
        (2, [0.0, 0.000499, 0.0], [0.0, 0.001, 0.002]),    # below T -> dropped
        (3, [0.0, 0.0, 0.0], [0.0, 0.001, 0.002]),         # collinear -> dropped
        (4, [0.1, 0.2], [0.1, 0.2]),                       # 2-point way
        (5, [0.3], [0.3]),                                 # 1-point way
        (6, [0.0, 0.01, 0.01, 0.0, 0.0],
            [0.0, 0.0, 0.01, 0.01, 0.0]),                  # closed ring
    ]
    pq.write_table(pa.table({
        "way_id": pa.array([r[0] for r in rows], pa.int64()),
        "lats": pa.array([r[1] for r in rows], pa.list_(pa.float64())),
        "lons": pa.array([r[2] for r in rows], pa.list_(pa.float64())),
    }), str(d / "ways.parquet"))
    eng = qs.simplify_ways(rd.read_parquet(str(d / "ways.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(qs.simplify_ways_sql(f"{d}/ways.parquet")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    kept = {int(r["way_id"]): int(r["n_kept"]) for _, r in eng.iterrows()}
    assert kept[1] == 3 and kept[2] == 2 and kept[3] == 2
    assert kept[4] == 2 and kept[5] == 1
    assert kept[6] == 5          # ring corners all sharp; both endpoints kept


def test_edge_fetch_schedule_hostiles(ray_session, tmp_path_factory):
    """Politeness-queue hostiles: repeated captures collapse to the LAST
    one, stalest-first ordering with a url tiebreak at equal timestamps,
    slots restart per host, eta anchors at the HOST's newest capture (so a
    stale url on an active host schedules after the host max, not after
    its own last fetch), case-folded hosts share one queue, and an
    unparseable url drops."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg

    d = tmp_path_factory.mktemp("edge_sched")
    us = int(pd.Timestamp("2024-06-01").value // 1000)
    rows = [
        ("https://a.com/old", us),                 # stalest on a.com
        ("https://a.com/new", us + 100_000_000),
        ("https://a.com/new", us + 200_000_000),   # repeat: last wins
        ("https://A.COM/tie1", us + 50_000_000),   # case-folds into a.com
        ("https://a.com/tie2", us + 50_000_000),   # equal ts: url tiebreak
        ("https://b.org/x", us),                   # separate host queue
        ("not a url", us),                         # dropped
    ]
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), str(d / "pages.parquet"))
    eng = pg.fetch_schedule(
        rd.read_parquet(str(d / "pages.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(pg.fetch_schedule_sql(
        f"read_parquet('{d}/pages.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    a = eng[eng["host"] == "a.com"].set_index("url")
    hmax = us + 200_000_000
    assert int(a.loc["https://a.com/old", "slot"]) == 1
    assert int(a.loc["https://A.COM/tie1", "slot"]) == 2   # tie: url order
    assert int(a.loc["https://a.com/tie2", "slot"]) == 3
    assert int(a.loc["https://a.com/new", "slot"]) == 4    # last capture won
    assert int(a.loc["https://a.com/old", "eta_us"]) == hmax + 5_000_000
    b = eng[eng["host"] == "b.org"]
    assert len(b) == 1 and int(b.iloc[0]["slot"]) == 1
    assert len(eng) == 5                                   # bad url dropped


def test_edge_url_blocklist_hostiles(ray_session, tmp_path_factory):
    """Blocklist hostiles: exact-host and subdomain matches block, a host
    that merely ENDS with the rule string without a dot boundary does not
    ('notads.example'), path prefixes respect the boundary ('/pixel' vs
    '/pixels' both block — prefix semantics — but '/pix' survives),
    case-folded hosts block, and non-http schemes drop outright."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg

    d = tmp_path_factory.mktemp("edge_block")
    urls = [
        "https://ads.example/anything",        # exact host -> blocked
        "https://sub.ads.example/x",           # subdomain -> blocked
        "https://notads.example/x",            # no dot boundary -> kept
        "https://ADS.EXAMPLE/y",               # case-folds -> blocked
        "https://tracker.net/pixel.gif",       # prefix match -> blocked
        "https://tracker.net/pixels/1",        # still prefix -> blocked
        "https://tracker.net/pix",             # shorter than prefix -> kept
        "https://example.com/private/a",       # blocked
        "https://example.com/privateer",       # prefix semantics -> blocked
        "https://example.com/pub",             # kept
        "ftp://ads.example/z",                 # non-http -> dropped
    ]
    pq.write_table(pa.table({"url": pa.array(urls, pa.string())}),
                   str(d / "pages.parquet"))
    eng = pg.url_blocklist_filter(
        rd.read_parquet(str(d / "pages.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(pg.url_blocklist_filter_sql(
        f"read_parquet('{d}/pages.parquet')")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    kept = set(eng["url"])
    assert kept == {"https://notads.example/x", "https://tracker.net/pix",
                    "https://example.com/pub"}


def test_edge_boundary_adjacency_hostiles(ray_session, tmp_path_factory):
    """Adjacency hostiles: an edge-sharing pair counts each shared snapped
    vertex ONCE per polygon (duplicate closing vertices and repeated
    in-ring vertices dedup), a corner-touching pair counts 1, a hole ring's
    vertices participate, a polygon never pairs with itself, and names
    orient a < b."""
    import json as _json

    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import queries_spatial as qs

    d = tmp_path_factory.mktemp("edge_adj")
    sq = lambda x0, y0, s: [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                            [x0, y0 + s], [x0, y0]]
    rows = [
        ("A", "county", [sq(0.0, 0.0, 1.0)]),
        # B shares A's right edge: corners (1,0) and (1,1) -> n_shared 2
        ("B", "city", [sq(1.0, 0.0, 1.0)]),
        # C touches A and B at the single corner (1,1)
        ("C", "city", [sq(1.0, 1.0, 1.0)]),
        # D's HOLE ring touches nothing; its outer ring duplicates a vertex
        # mid-ring (counted once)
        ("D", "city", [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [6.0, 5.0],
                        [6.0, 6.0], [5.0, 6.0], [5.0, 5.0]],
                       sq(5.2, 5.2, 0.1)[::-1]]),
        # E shares D's duplicated vertex (6,5) and also its hole corner
        ("E", "city", [[[6.0, 5.0], [7.0, 5.0], [5.2, 5.2]]]),
    ]
    pq.write_table(pa.table({
        "name": pa.array([r[0] for r in rows], pa.string()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "file_order": pa.array(range(len(rows)), pa.int32()),
        "geom_json": pa.array([_json.dumps(r[2]) for r in rows], pa.string()),
    }), str(d / "boundaries.parquet"))
    eng = qs.boundary_adjacency(
        rd.read_parquet(str(d / "boundaries.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(qs.boundary_adjacency_sql(f"{d}/boundaries.parquet")).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) and list(e.columns) == list(o.columns)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    got = {(r["name_a"], r["name_b"]): int(r["n_shared"])
           for _, r in eng.iterrows()}
    assert got[("A", "B")] == 2 and got[("A", "C")] == 1
    assert got[("B", "C")] == 2     # B=[1,2]x[0,1], C=[1,2]x[1,2]: (1,1),(2,1)
    assert got[("D", "E")] == 2     # dup vertex (6,5) once + hole corner (5.2,5.2)
    assert all(a != b for a, b in got)


def test_edge_image_histogram_blobs(ray_session):
    """Direct decode hostiles (handcrafted PPM/PGM blobs, bypassing the
    fixture synthesizer): an all-black P6 lands entirely in bin 0, an
    all-white P6 (luma 765 -> 765 // 48 = 15) in bin 15, a two-pixel image
    splits bins, and a grayscale P5 bins raw 0..255 values (100 -> bin 2,
    255 -> bin 5)."""
    import numpy as np

    from osm_intersections_ray.stages.multimodal import (
        encode_ppm, luma_histogram)

    black = encode_ppm(4, 2, np.zeros(4 * 2 * 3, np.uint8))
    white = encode_ppm(2, 2, np.full(2 * 2 * 3, 255, np.uint8))
    two = encode_ppm(2, 1, np.array([0, 0, 0, 255, 255, 255], np.uint8))
    gray = b"P5\n3 1\n255\n" + bytes([0, 100, 255])

    out = {}
    for did, blob in enumerate([black, white, two, gray], start=1):
        cnt = luma_histogram(blob)
        out[did] = {int(b): int(n) for b, n in enumerate(cnt) if n}
    assert out[1] == {0: 8}
    assert out[2] == {15: 4}
    assert out[3] == {0: 1, 15: 1}
    assert out[4] == {0: 1, 2: 1, 5: 1}


def test_edge_recent_counts_boundary(ray_session, tmp_path_factory):
    """Pushdown-window hostiles: an event exactly AT the cutoff is kept
    (>=), one microsecond before is dropped, NULL ts drops, and the
    belt-and-suspenders kernel mask gives identical results when the
    reader cannot push the filter (plain read, no filter arg)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import events as ev

    d = tmp_path_factory.mktemp("edge_recent")
    cut = pd.Timestamp(ev.RECENT_CUTOFF)
    rows = [
        (cut, "view"),                                    # kept (>=)
        (cut - pd.Timedelta(microseconds=1), "view"),     # dropped
        (cut + pd.Timedelta(days=1), "purchase"),         # kept
        (None, "view"),                                   # NULL ts dropped
    ]
    pq.write_table(pa.table({
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    }), str(d / "events.parquet"))
    from osm_intersections_ray.queries import queries

    eng = queries()["events_recent_counts"](str(d)).to_pandas()
    # unpushed path: same kernel over an unfiltered read
    eng2 = ev.recent_type_counts(
        rd.read_parquet(str(d / "events.parquet"))).to_pandas()
    con = duckdb.connect()
    orc = con.sql(ev.recent_type_counts_sql(
        f"read_parquet('{d}/events.parquet')")).df()
    for got in (eng, eng2):
        e, o = _canon(got), _canon(orc)
        assert len(e) == len(o) and list(e.columns) == list(o.columns)
        for c in e.columns:
            assert (e[c].astype(str).to_numpy()
                    == o[c].astype(str).to_numpy()).all(), f"col {c}\n{e}\n{o}"
    got = dict(zip(eng["event_type"], eng["n"]))
    assert got == {"view": 1, "purchase": 1}


def test_edge_jsonl_schema_drift(ray_session, tmp_path_factory):
    """Ingest fault tolerance: a .jsonl.gz shard from an older producer —
    rows missing keys (NULL-filled by the NDJSON reader), a whole column
    absent from one shard (NULL-filled by the projection), and unknown
    extra keys (ignored) — parses instead of killing the ingest job."""
    import gzip
    import json

    import ray.data as rd

    from osm_intersections_ray.sources import jsonl as J

    d = tmp_path_factory.mktemp("edge_drift")
    shard1 = [  # modern shard: full schema, one row missing 'lang'
        {"url": "https://a/1", "ts": 1, "lang": "en", "text": "hi"},
        {"url": "https://a/2", "ts": 2, "text": "yo"},
    ]
    shard2 = [  # old producer: no 'lang' column at all, extra key present
        {"url": "https://a/3", "ts": 3, "text": "no lang here", "v": 9},
        {"url": "https://a/4", "ts": 4, "text": "", "v": 9},
    ]
    for i, rows in enumerate([shard1, shard2]):
        with gzip.open(str(d / f"part-{i}.jsonl.gz"), "wt") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    out = J.read_jsonl_pages(str(d)).to_pandas().sort_values(
        "url").reset_index(drop=True)
    assert list(out["url"]) == [f"https://a/{i}" for i in range(1, 5)]
    assert out.loc[0, "lang"] == "en" and pd.isna(out.loc[1, "lang"])
    assert pd.isna(out.loc[2, "lang"]) and pd.isna(out.loc[3, "lang"])
    assert list(out["n_chars"]) == [2, 2, 12, 0]
    assert "v" not in out.columns


def test_edge_csv_schema_drift(ray_session, tmp_path_factory):
    """CSV ingest drift: a shard missing the 'props' and 'value' columns
    parses with NULLs (value -> NULL cents, no NaN garbage), a NULL value
    cell in a full-schema shard masks its cents, and the full-schema shard
    is unaffected."""
    import gzip

    from osm_intersections_ray.sources import csvsrc as C

    d = tmp_path_factory.mktemp("edge_csvdrift")
    full = ("event_id,user_id,ts_us,event_type,value,props\n"
            "1,10,1000,view,1.25,\"a=1\"\n"
            "2,11,2000,purchase,,\"b=2\"\n")           # empty value cell
    old = ("event_id,user_id,ts_us,event_type\n"
           "3,12,3000,view\n")                          # no value/props
    for i, s in enumerate([full, old]):
        with gzip.open(str(d / f"part-{i}.csv.gz"), "wt") as f:
            f.write(s)
    out = C.read_csv_events(str(d)).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    assert list(out["event_id"]) == [1, 2, 3]
    assert out.loc[0, "value_cents"] == 125
    assert pd.isna(out.loc[1, "value_cents"])
    assert pd.isna(out.loc[2, "value_cents"]) and pd.isna(out.loc[2, "props_chars"])
    assert out.loc[0, "props_chars"] == 3


def test_edge_warc_structural_resync(ray_session, tmp_path_factory):
    """Structural-corruption hostiles: garbage bytes between records and a
    record missing WARC-Target-URI cost THEMSELVES, not the shard — the
    strict parser raises (the pinned contract), resync recovers every
    intact record, and the quarantine reader adds one structural row per
    damaged shard while a fully-unreadable gz yields only that row."""
    import gzip
    import hashlib

    import pytest as _pytest

    from osm_intersections_ray.sources import warc as W

    us = 1_700_000_000_000_000
    r1 = gzip.decompress(W.encode_warc_record("https://a/1", us,
                                              b"<html>one</html>"))
    r2 = gzip.decompress(W.encode_warc_record("https://a/2", us + 1,
                                              b"<html>two</html>"))
    # a record with its mandatory URI header stripped
    r_bad = r1.replace(b"WARC-Target-URI: https://a/1\r\n", b"", 1)
    stream = r1 + b"GARBAGE" * 3 + r_bad + r2

    with _pytest.raises(ValueError):
        list(W.parse_warc_members(r1 + b"JUNK" + r2))
    got = [m[0] for m in W.parse_warc_members(stream, resync=True)]
    assert got == ["https://a/1", "https://a/2"]

    d = tmp_path_factory.mktemp("edge_resync")
    with open(str(d / "0000.warc.gz"), "wb") as f:
        f.write(gzip.compress(stream))
    out = W.read_warc_quarantine(str(d)).to_pandas()
    ok_rows = out[out["ok"] == 1]
    assert set(ok_rows["url"]) == {"https://a/1", "https://a/2"}
    bad = out[out["url"] == "<structural-corruption>"]
    assert len(bad) == 1 and (bad["ok"] == 0).all()
    assert bad.iloc[0]["arrived_md5"] == hashlib.md5(stream).hexdigest()


def test_edge_weighted_sample(ray_session, tmp_path_factory):
    """Weighted-priority sampler hostiles: NULL / zero / negative n_chars
    all clamp to weight 1, a heavy-weight doc's priority collapses toward
    bucket 0 (so the WHOLE candidate set sits in the boundary bucket and
    the pick-m-smallest path does all the work), and k >= corpus returns
    every row (the keep-all short-circuit)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import curation

    d = tmp_path_factory.mktemp("edge_wsamp")
    ids = list(range(1, 21))
    n_chars = [None, 0, -5] + [1_000_000] * 14 + [1, 2, 3]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), str(d / "documents.parquet"))
    tbl = f"read_parquet('{d}/documents.parquet')"
    ds = rd.read_parquet(str(d / "documents.parquet"))
    con = duckdb.connect()

    for k in (5, 12):
        eng = curation.weighted_sample(ds, k=k).to_pandas()
        orc = con.sql(curation.weighted_sample_sql(tbl, k=k)).df()
        e, o = _canon(eng), _canon(orc)
        assert len(e) == len(o) == k
        for c in e.columns:
            assert (e[c].astype(str).to_numpy()
                    == o[c].astype(str).to_numpy()).all(), f"k={k} col {c}"
        # clamped weights really are 1 on both sides
        clamped = [i for i in (1, 2, 3) if i in set(e["doc_id"])]
        if clamped:
            assert (e.set_index("doc_id").loc[clamped, "w"] == 1).all()
        # heavy docs dominate the sample: their priority is ~2^60/1e6
        heavy = set(range(4, 18))
        assert len(set(eng["doc_id"]) & heavy) >= k - 3

    # keep-all short-circuit: k >= corpus
    eng = curation.weighted_sample(ds, k=100).to_pandas()
    assert len(eng) == 20 and set(eng["doc_id"]) == set(ids)
    orc = con.sql(curation.weighted_sample_sql(tbl, k=100)).df()
    e, o = _canon(eng), _canon(orc)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all()


def test_edge_host_distinct_kmv(ray_session, tmp_path_factory):
    """Per-site KMV hostiles: duplicate urls collapse before the sketch
    (distinct semantics), a site under K reports its EXACT count, a site
    over K takes the (K-1)*2^60/kth estimate path, hosts case-fold into
    one site, and urls without a first path segment (or non-http) drop."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg

    d = tmp_path_factory.mktemp("edge_kmv")
    urls = (
        [f"https://big.com/en/p{i}" for i in range(12)]   # over K=4: estimate
        + ["https://small.org/fr/x", "https://small.org/fr/y",
           "https://small.org/fr/y",                       # dup: distinct
           "https://SMALL.ORG/fr/z",                       # case-folds in
           "https://small.org/de/only",                    # separate section
           "https://small.org",                            # no path: dropped
           "ftp://small.org/fr/q",                         # non-http: dropped
           "not a url"]
    )
    pq.write_table(pa.table({"url": pa.array(urls, pa.string())}),
                   str(d / "pages.parquet"))
    tbl = f"read_parquet('{d}/pages.parquet')"
    ds = rd.read_parquet(str(d / "pages.parquet"))
    k = 4
    eng = pg.host_distinct_kmv(ds, k=k).to_pandas()
    con = duckdb.connect()
    orc = con.sql(pg.host_distinct_kmv_sql(tbl, k=k)).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    by = eng.set_index("site")
    assert set(by.index) == {"big.com/en", "small.org/fr", "small.org/de"}
    assert int(by.loc["small.org/fr", "n_kept"]) == 3   # x, y, z exact
    assert int(by.loc["small.org/fr", "est"]) == 3
    assert int(by.loc["small.org/de", "n_kept"]) == 1
    assert int(by.loc["big.com/en", "n_kept"]) == k     # sketch saturated
    kth = int(by.loc["big.com/en", "kth_hash"])
    assert int(by.loc["big.com/en", "est"]) == (k - 1) * (1 << 60) // kth


def test_edge_page_hotspots(ray_session, tmp_path_factory):
    """Grid-DBSCAN hostiles: diagonal adjacency joins cells into one
    cluster, a one-cell gap splits clusters, a cell at minpts-1 is not
    core, an isolated core cell is its own singleton cluster, the grid
    corner (0,0) clips its neighborhood — and the single-block union-find
    route and the distributed hash-min route emit IDENTICAL labels."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg

    d = tmp_path_factory.mktemp("edge_hotspot")
    res, minpts = pg.HOTSPOT_RES, 2
    n = 1 << res

    def latlon(cx, cy):
        return ((cy + 0.5) / n * 180.0 - 90.0, (cx + 0.5) / n * 360.0 - 180.0)

    cells = ([(100, 100)] * 2 + [(101, 101)] * 2 + [(101, 100)] * 3  # blob A
             + [(103, 100)] * 2       # B: gap at 102 keeps it separate
             + [(100, 103)] * 1       # below minpts: not core
             + [(0, 0)] * 2)          # grid-corner singleton
    rows = []
    for i, (cx, cy) in enumerate(cells):
        lat, lon = latlon(cx, cy)
        rows.append((f"https://h.com/s/p{i}",
                     f'<html><meta name="geo.position" content="{lat};{lon}">'
                     f"<article>t{i}</article></html>"))
    pq.write_table(pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "html": pa.array([h.encode() for _, h in rows], pa.binary()),
    }), str(d / "pages.parquet"))
    tbl = f"read_parquet('{d}/pages.parquet')"
    ds = rd.read_parquet(str(d / "pages.parquet"))

    eng = pg.page_hotspots(ds, minpts=minpts).to_pandas()
    con = duckdb.connect()
    orc = con.sql(pg.page_hotspots_sql(tbl, minpts=minpts)).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o)
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"

    by = eng.set_index("cell")
    blob_a = {100 * n + 100, 101 * n + 101, 101 * n + 100}
    assert set(eng["cell"]) == blob_a | {103 * n + 100, 0}
    assert set(by.loc[sorted(blob_a), "cluster_id"]) == {100 * n + 100}
    assert int(by.loc[103 * n + 100, "cluster_id"]) == 103 * n + 100
    assert int(by.loc[0, "cluster_id"]) == 0
    assert 100 * n + 103 not in by.index  # minpts-1 is not core

    # distributed route (local_max=0 forces it) is label-identical
    dist = pg.page_hotspots(ds, minpts=minpts, local_max=0).to_pandas()
    ed, el = _canon(dist), _canon(eng)
    for c in el.columns:
        assert (ed[c].astype(str).to_numpy() == el[c].astype(str).to_numpy()).all(), c


def test_edge_page_hotspot_assign(ray_session, tmp_path_factory):
    """DBSCAN classification hostiles: pages in core cells inherit the
    cluster, pages in sub-minpts cells are NULL-noise, unparseable geotags
    drop, and an all-noise corpus (minpts higher than any cell count)
    classifies every page NULL through the empty-map path."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg

    d = tmp_path_factory.mktemp("edge_hotassign")
    res = pg.HOTSPOT_RES
    n = 1 << res

    def latlon(cx, cy):
        return ((cy + 0.5) / n * 180.0 - 90.0, (cx + 0.5) / n * 360.0 - 180.0)

    cells = [(200, 200)] * 3 + [(201, 200)] * 2 + [(300, 300)] * 1
    rows = []
    for i, (cx, cy) in enumerate(cells):
        lat, lon = latlon(cx, cy)
        rows.append((f"https://h.com/s/a{i}",
                     f'<html><meta name="geo.position" content="{lat};{lon}">'
                     f"<article>a{i}</article></html>"))
    rows.append(("https://h.com/s/bad", "<html>no geo</html>"))
    pq.write_table(pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "html": pa.array([h.encode() for _, h in rows], pa.binary()),
    }), str(d / "pages.parquet"))
    tbl = f"read_parquet('{d}/pages.parquet')"
    ds = rd.read_parquet(str(d / "pages.parquet"))
    con = duckdb.connect()

    for minpts in (2, 50):  # 50 > every cell count: the all-noise path
        eng = pg.page_hotspot_assign(ds, minpts=minpts).to_pandas()
        orc = con.sql(pg.page_hotspot_assign_sql(tbl, minpts=minpts)).df()
        e, o = _canon(eng), _canon(orc)
        assert len(e) == len(o) == 6  # the no-geo page drops on both sides
        for c in e.columns:
            assert (e[c].astype(str).to_numpy()
                    == o[c].astype(str).to_numpy()).all(), f"minpts={minpts} {c}"
        by = eng.set_index("url")
        if minpts == 2:
            assert (by.loc[[f"https://h.com/s/a{i}" for i in range(5)],
                           "cluster_id"] == 200 * n + 200).all()
            assert pd.isna(by.loc["https://h.com/s/a5", "cluster_id"])
        else:
            assert by["cluster_id"].isna().all()


def test_edge_pages_in_city(ray_session, tmp_path_factory):
    """PIP city-tag hostiles: a point inside a polygon HOLE is outside
    (even-odd, outer AND NOT hole), overlapping polygons resolve by
    boundary-file order (first match wins, not name order), a point
    outside everything is 'Unincorporated', a county-kind polygon never
    matches, and horizontal edges don't divide-by-zero on either side."""
    import json

    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg

    d = tmp_path_factory.mktemp("edge_pcity")
    sq = lambda x0, y0, x1, y1: [[x0, y0], [x1, y0], [x1, y1], [x0, y1],
                                 [x0, y0]]
    bounds = pa.table({
        # file order puts Zed BEFORE Alpha: first-match must pick Zed in
        # the overlap even though 'Alpha' < 'Zed'
        "name": pa.array(["Zed", "Alpha", "Holey", "CountyWide"], pa.string()),
        "kind": pa.array(["city", "city", "city", "county"], pa.string()),
        "file_order": pa.array([0, 1, 2, 3], pa.int32()),
        "geom_json": pa.array([
            json.dumps([sq(0.0, 0.0, 2.0, 2.0)]),
            json.dumps([sq(1.0, 1.0, 3.0, 3.0)]),          # overlaps Zed
            json.dumps([sq(10.0, 10.0, 14.0, 14.0),
                        sq(11.0, 11.0, 13.0, 13.0)]),      # ring 2 = hole
            json.dumps([sq(-50.0, -50.0, 50.0, 50.0)]),    # kind != city
        ], pa.string()),
    })
    pq.write_table(bounds, str(d / "boundaries.parquet"))

    pts = [("in-zed-only", 0.5, 0.5), ("overlap-zed-first", 1.5, 1.5),
           ("in-alpha-only", 2.5, 2.5), ("in-hole", 12.0, 12.0),
           ("in-holey-rim", 10.5, 10.5), ("outside", 40.0, 40.0)]
    rows = [(f"https://e.com/x/{n}",
             f'<html><meta name="geo.position" content="{lat};{lon}">'
             f"<article>x</article></html>") for n, lon, lat in pts]
    pq.write_table(pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "html": pa.array([h.encode() for _, h in rows], pa.binary()),
    }), str(d / "pages.parquet"))

    eng = pg.pages_in_city(rd.read_parquet(str(d / "pages.parquet")),
                           bounds).to_pandas()
    con = duckdb.connect()
    orc = con.sql(pg.pages_in_city_sql(
        f"read_parquet('{d}/pages.parquet')",
        str(d / "boundaries.parquet"))).df()
    e, o = _canon(eng), _canon(orc)
    assert len(e) == len(o) == 6
    for c in e.columns:
        assert (e[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), \
            f"col {c}\n{e}\n{o}"
    by = eng.set_index("url")["city"]
    assert by["https://e.com/x/in-zed-only"] == "Zed"
    assert by["https://e.com/x/overlap-zed-first"] == "Zed"       # file order
    assert by["https://e.com/x/in-alpha-only"] == "Alpha"
    assert by["https://e.com/x/in-hole"] == "Unincorporated"      # even-odd
    assert by["https://e.com/x/in-holey-rim"] == "Holey"
    assert by["https://e.com/x/outside"] == "Unincorporated"


def test_edge_empty_broadcast_dims(ray_session, tmp_path_factory):
    """Regression (found by the sf0.001 cross-scale sweep): a broadcast
    membership array can be EMPTY — no supplier in the target nation, no
    customer in the target region — and the sorted-membership probe must
    return all-false instead of indexing position -1 of an empty array.
    Also: page_hotspots with zero dense cells must return an empty result
    WITH schema (a 0-block dataset loses it)."""
    import duckdb

    import ray.data as rd

    from osm_intersections_ray.stages import pages as pg
    from osm_intersections_ray.stages import relational as R

    d, con = _tpch_edge_world(tmp_path_factory, "edge_emptydims")
    # drop every target-nation supplier and every in-region customer
    sup = pq.read_table(str(d / "supplier.parquet")).to_pandas()
    nat = pq.read_table(str(d / "nation.parquet")).to_pandas()
    reg = pq.read_table(str(d / "region.parquet")).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == R.Q8_REGION, "r_regionkey"].iloc[0])
    tkey = int(nat.loc[nat["n_name"] == R.Q8_NATION, "n_nationkey"].iloc[0])
    out_nkey = int(nat.loc[(nat["n_regionkey"] != rkey)
                           & (nat["n_nationkey"] != tkey),
                           "n_nationkey"].iloc[0])
    sup["s_nationkey"] = out_nkey
    cust = pq.read_table(str(d / "customer.parquet")).to_pandas()
    cust["c_nationkey"] = out_nkey
    import pyarrow as _pa

    eng = R.nation_market_share(
        rd.read_parquet(str(d / "lineitem.parquet"), override_num_blocks=3),
        rd.read_parquet(str(d / "orders.parquet"), override_num_blocks=2),
        _pa.Table.from_pandas(cust, preserve_index=False),
        _pa.Table.from_pandas(sup, preserve_index=False),
        pq.read_table(str(d / "nation.parquet")),
        pq.read_table(str(d / "region.parquet"))).to_pandas()
    assert len(eng) == 0  # no in-region customer -> no qualifying order

    # hotspots over a corpus with no parseable geotag at all
    pq.write_table(pa.table({
        "url": pa.array(["https://e.com/a"], pa.string()),
        "html": pa.array([b"<html>no geo</html>"], pa.binary()),
    }), str(d / "pages_nogeo.parquet"))
    hs = pg.page_hotspots(rd.read_parquet(str(d / "pages_nogeo.parquet")))
    df = hs.to_pandas()
    assert len(df) == 0
    assert list(hs.schema().names) == ["cell", "cx", "cy", "n_pages",
                                       "cluster_id"]
