"""Query registry: every implemented operator/pipeline from SURVEY.md section
2 (plus the training-data graft ops) as ``name -> callable(sf_dir)`` with a
matching DuckDB oracle where SQL-expressible.

Contract notes (driver):
* Ray is initialized by the caller; nothing here calls ray.init/shutdown.
* Oracles run at sf=0.01 against the pre-registered TPC-H views; spatial
  queries read the deterministic synthetic fixture parquet directly from its
  /tmp path (generated on demand, cached, atomic).
* Column names and integer dtypes match the SQL exactly; aggregates are
  integers (counts/cents) so float summation order never enters the hash.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

import ray
import ray.data as rd

from .sources import csvsrc as csv_src
from .sources import jsonl as jsonl_src
from .sources import warc as warc_src
from .sources.synthetic import ensure_fixtures
from .stages import (
    curation,
    dedup,
    events,
    filters,
    graph,
    knn,
    multimodal,
    pages,
    queries_spatial as qs,
    relational,
    retrieval,
    similarity,
    text,
)

# The driver's correctness scale: oracle_sql() bakes fixture paths for THIS
# scale into its SQL strings (the driver always compares at sf0.01).  The
# env override exists only for cross-scale robustness sweeps
# (tools/check_queries.py with GRAFT_CHECK_SF + GRAFT_ORACLE_SF both set).
ORACLE_SF_DIR = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

# The driver's CORRECTNESS_r{N}.json samples the FIRST 50 registry entries.
# Round-5 rotation (VERDICT r4 "Next round" #1): 101 of the 181 queries have
# a driver-visible green row across r01-r04; this list keeps ONLY the two
# flagships as standing entries and fills the other 48 slots from the 80
# never-driver-checked queries, spanning every family (all of the judge's
# named ops included).  The 32 never-checked queries that still don't fit
# in 50 are all covered by tools/check_queries.py (the full-registry gate)
# and pytest; they lean toward within-family redundancy (e.g. events_rollup
# vs events_pivot, sample_docs vs stratified_sample).  Session 16: the three
# new ops (weighted_sample, host_distinct_kmv, page_hotspots) take the slots
# of events_sliding / doc_sentences / image_histogram, whose families keep
# 5+ driver-visible entries each; the displaced three stay in the full gate.
DRIVER_SAMPLE_50 = [
    # flagships (SQL-exact via the precomputed oracle rows, pass r4)
    "intersections_full", "intersections_geom_only",
    # spatial
    "boundary_adjacency",
    # pages / crawl ops
    "url_blocklist_filter", "page_links", "link_frontier",
    "crawl_corpus",                        # composite crawl pipeline
    "warc_quarantine",                     # corrupt-WARC resync + quarantine
    # text analysis / aggregates
    "c4_line_filter", "tfidf_top_terms", "cms_token_counts",
    "repetition_stats", "redact_pii",
    # dedup / decontamination
    "near_dup_containment", "incremental_dedup_survivors", "decontaminate",
    # similarity / embeddings
    "rrf_fusion", "knn_graph", "embedding_centroids", "embedding_dup_clusters",
    # curation
    "dataset_split", "host_split", "proportional_sample", "documents_profile",
    # multimodal
    "image_decode_gif", "audio_fingerprint", "image_ahash",
    # events / windows
    "events_recent_counts", "funnel_stages",
    "late_arrivals",
    "daily_active_users",
    # session-16 additions (new ops, never driver-checked by definition)
    "weighted_sample", "host_distinct_kmv", "page_hotspots", "pages_in_city",
    # session-17 additions (new ops; displace image_dedup_survivors,
    # event_transitions and session_cooccurrence, whose families keep 3-4
    # driver-visible entries and which stay in the full gate)
    "page_hex_density", "way_bfs_hops", "pages_segment_snap",
    # relational (the never-checked half of the TPC-H family)
    "cold_customers", "local_supplier_revenue", "small_qty_revenue",
    "min_cost_supplier", "nation_market_share", "returned_item_revenue",
    "volume_shipping", "product_type_profit", "important_parts",
    "part_supplier_variety", "promo_part_suppliers", "late_lineitem_modes",
]


def _ways(sf_dir: str):
    fx = ensure_fixtures(sf_dir)
    return rd.read_parquet(os.path.join(fx, "ways.parquet"), override_num_blocks=16)


def _pages(sf_dir: str, columns=None):
    # pages is the big side: force enough input blocks that every stage can
    # fan out (a single parquet file would otherwise read as one block)
    fx = ensure_fixtures(sf_dir)
    return rd.read_parquet(os.path.join(fx, "pages.parquet"),
                           columns=columns, override_num_blocks=32)


def _strip_meta(b):
    # zero-copy: the driver's testdata parquet carries pandas schema
    # metadata, which breaks Ray's block-schema dedup hash ("Failed to hash
    # the schemas: unhashable type: 'dict'") whenever the batcher coalesces
    # read blocks; stripping once at the read keeps every downstream stage
    # clean.  batch_size=None = whole blocks, so the strip itself never
    # coalesces.
    return b.replace_schema_metadata(None)


def _tbl(sf_dir: str, name: str, columns=None, rows_per_block: int = 600):
    # pass a metadata-stripped schema at the READ so even the read operator's
    # own block-schema dedup hash never sees the driver testdata's pandas
    # dict metadata (the worker-side "Failed to hash the schemas" warning);
    # the _strip_meta map stays as the belt for any other metadata source
    path = os.path.join(sf_dir, f"{name}.parquet")
    import pyarrow as pa

    # Multi-file inputs (the production layout — a directory of shards)
    # parallelize at file granularity already; the block-count override
    # below exists ONLY for the single-file sandbox testdata and must
    # never throttle a sharded table (VERDICT r4 "What's wrong" #2).
    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if f.endswith(".parquet")]
             if os.path.isdir(path) else [path])
    sch = pq.read_schema(files[0]).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    if len(files) > 1:
        # one block per shard file at minimum; Ray splits further on size
        return rd.read_parquet(files, columns=columns, schema=sch).map_batches(
            _strip_meta, batch_format="pyarrow", batch_size=None)
    # The driver's testdata tables are SINGLE parquet files, and Ray's
    # reader parallelizes at file granularity: without an override the one
    # read task emits one block per ~target_max_block_size, which for the
    # small-but-kernel-heavy tables (5k documents at sf0.1) means ONE block
    # — every downstream map (BPE segmentation, shingling, scrub) then runs
    # as one task no matter how many CPUs the cluster has.  Forcing
    # ~600-row output blocks (capped at 64) makes Ray insert SplitBlocks so
    # the kernels fan out; at the sf0.01 gate scale this leaves the plans
    # unchanged.  (Real 100-TB inputs are many files and take the
    # no-override branch above.)
    # rows_per_block: the heavy actor-pool codec chains fuse READ->encode->
    # decode into one operator, so the INPUT block count IS the chain's
    # parallelism (batch_size cannot split a fused chain) — those queries
    # pass a smaller value so the fused tasks cover the cluster.
    n_rows = pq.read_metadata(files[0]).num_rows
    nb = max(1, min(64, n_rows // rows_per_block))
    return rd.read_parquet(path, columns=columns, schema=sch,
                           override_num_blocks=nb).map_batches(
        _strip_meta, batch_format="pyarrow", batch_size=None)


def _codec_ids(sf_dir: str):
    # doc_id feed for the codec chains: READ->encode->decode FUSES into one
    # operator, so the input block count IS the chain's parallelism --
    # ~75 rows/block keeps up to 64 fused tasks in flight (gate-scale plans
    # are unchanged: 500 rows still yield a handful of blocks).
    # The feed is MATERIALIZED (it is a driver-testdata-sized id column,
    # ~40 KB) because a single-file read is one streaming generator task
    # whose 2-block in-flight buffer lock-steps the fused codec chain to
    # ~2 concurrent tasks (measured 4.0s -> 0.8s on the flac chain once
    # blocks pre-exist).  Real multi-file inputs fan out at the read and
    # never need this.
    return _tbl(sf_dir, "documents", ["doc_id"], rows_per_block=75).materialize()


def _codec_pool() -> int:
    # heavy-codec pool size, derived from the live cluster at query-build
    # time: capped at 8 (measured fastest once actor startup is priced in)
    # and never above the CPU count (a 4-cpu pytest session should not pay
    # for pending actors it cannot schedule)
    import ray as _ray

    return max(2, min(8, int(_ray.cluster_resources().get("CPU", 8))))


def queries() -> dict:
    q = {}

    # --- spatial operators over the synthetic ways table (SURVEY section 2)
    q["way_names"] = lambda sf: qs.way_names(_ways(sf))
    q["shared_node_candidates"] = lambda sf: qs.shared_node_candidates(_ways(sf))
    q["dead_ends"] = lambda sf: qs.dead_end_rows(_ways(sf))
    q["cell_cover_stats"] = lambda sf: qs.cell_cover_stats(_ways(sf))
    q["cell_population"] = lambda sf: qs.cell_population(_ways(sf))
    q["geom_candidate_pairs"] = lambda sf: qs.geom_candidate_pairs(_ways(sf))
    q["nearest_way"] = lambda sf: knn.nearest_way_queries(_ways(sf))
    q["nearest_two"] = lambda sf: knn.nearest_two_queries(_ways(sf))
    q["pages_segment_snap"] = lambda sf: knn.pages_segment_snap(
        _pages(sf, columns=["url", "html"]), _ways(sf))
    q["snap_distance_profile"] = lambda sf: knn.snap_distance_profile(
        _pages(sf, columns=["url", "html"]), _ways(sf))
    q["pages_nearest_way"] = lambda sf: knn.pages_nearest_way(
        _pages(sf, columns=["url", "html"]), _ways(sf))
    q["block_gps"] = lambda sf: qs.block_gps_lookup(_ways(sf))
    q["vectorize_raster"] = lambda sf: qs.vectorize_raster(_ways(sf))
    q["rasterize_ways"] = lambda sf: qs.rasterize_ways(_ways(sf))
    q["simplify_ways"] = lambda sf: qs.simplify_ways(_ways(sf))
    q["way_l1_lengths"] = lambda sf: qs.way_l1_lengths(_ways(sf))
    q["way_bearing_octants"] = lambda sf: qs.way_bearing_octants(_ways(sf))
    q["way_components"] = lambda sf: graph.way_components(_ways(sf))
    q["way_triangles"] = lambda sf: graph.way_triangles(_ways(sf))
    q["way_bfs_hops"] = lambda sf: graph.way_bfs_hops(_ways(sf))
    q["way_reach_meters"] = lambda sf: graph.way_reach_meters(_ways(sf))

    def boundary_areas(sf):
        fx = ensure_fixtures(sf)
        return qs.boundary_areas(
            rd.read_parquet(os.path.join(fx, "boundaries.parquet")))

    q["boundary_areas"] = boundary_areas

    def boundary_adjacency(sf):
        fx = ensure_fixtures(sf)
        return qs.boundary_adjacency(
            rd.read_parquet(os.path.join(fx, "boundaries.parquet")))

    q["boundary_adjacency"] = boundary_adjacency

    # --- full reference-exact pipeline.  Driver-checkable since round 4:
    # the single-process reference oracle's rows are materialized to parquet
    # (oracle/oracle_rows.py) and the SQL oracle projects them, so the
    # driver hash-checks this end-to-end (plus pytest golden + 4-leg Node
    # conformance as independent evidence).
    def intersections_full(sf):
        from .pipelines.intersections import intersections_pipeline

        fx = ensure_fixtures(sf)
        ds = intersections_pipeline(fx)

        def flatten(b):
            import pyarrow as pa

            streets = ["/".join(s) for s in b["streets"].to_pylist()]
            way_ids = [",".join(str(x) for x in w) for w in b["way_ids"].to_pylist()]
            return pa.table({
                "county": b["county"], "lat": b["lat"], "lon": b["lon"],
                "streets": pa.array(streets, pa.string()),
                "node_id": b["node_id"], "node_id_kind": b["node_id_kind"],
                "way_ids": pa.array(way_ids, pa.string()),
                "city": b["city"], "source": b["source"],
            })

        return ds.map_batches(flatten, batch_format="pyarrow")

    q["intersections_full"] = intersections_full

    def intersections_geom_only(sf):  # geoturf.js variant — rows-only check
        from .pipelines.intersections import geometric_only_pipeline

        ds = geometric_only_pipeline(ensure_fixtures(sf))

        def flatten(b):
            import pyarrow as pa

            return pa.table({
                "county": b["county"], "lat": b["lat"], "lon": b["lon"],
                "streets": pa.array(["/".join(s) for s in b["streets"].to_pylist()],
                                    pa.string()),
                "node_id": b["node_id"], "node_id_kind": b["node_id_kind"],
            })

        return ds.map_batches(flatten, batch_format="pyarrow")

    q["intersections_geom_only"] = intersections_geom_only

    # --- pages graft (input_hint table)
    q["pages_extract"] = lambda sf: _pages(sf, columns=["url", "html"]).map_batches(
        pages.Extractor, batch_format="pyarrow", concurrency=(1, 8), batch_size=4096)
    q["pages_geotag"] = lambda sf: _pages(sf, columns=["url", "html"]).map_batches(
        pages.geotag_batch, batch_format="pyarrow", batch_size=4096)
    q["pages_way_join"] = lambda sf: pages.pages_way_join(
        _pages(sf, columns=["url", "html"]), _ways(sf))
    q["host_section_stats"] = lambda sf: pages.host_section_stats(
        _pages(sf, columns=["url", "text", "warc_ts"]))
    q["url_canonical_dedup"] = lambda sf: pages.url_canonical_dedup(
        _pages(sf, columns=["url", "warc_ts"]))
    q["surt_index"] = lambda sf: pages.surt_index(
        _pages(sf, columns=["url", "warc_ts"]))
    q["morton_tiles"] = lambda sf: pages.morton_tiles(
        _pages(sf, columns=["url", "html"]))
    q["fetch_schedule"] = lambda sf: pages.fetch_schedule(
        _pages(sf, columns=["url", "warc_ts"]))
    q["url_blocklist_filter"] = lambda sf: pages.url_blocklist_filter(
        _pages(sf, columns=["url"]))
    q["domain_mix_weights"] = lambda sf: pages.domain_mix_weights(
        _pages(sf, columns=["url", "text"]))
    q["tile_pyramid"] = lambda sf: pages.tile_pyramid(
        _pages(sf, columns=["url", "html"]))
    q["way_page_density"] = lambda sf: pages.way_page_density(
        _pages(sf, columns=["url", "html"]), _ways(sf))
    q["bloom_url_filter"] = lambda sf: pages.bloom_url_filter(
        _pages(sf, columns=["url"]))
    q["host_distinct_kmv"] = lambda sf: pages.host_distinct_kmv(
        _pages(sf, columns=["url"]))
    q["page_hotspots"] = lambda sf: pages.page_hotspots(
        _pages(sf, columns=["url", "html"]))
    q["page_hotspot_assign"] = lambda sf: pages.page_hotspot_assign(
        _pages(sf, columns=["url", "html"]))
    q["page_hex_density"] = lambda sf: pages.page_hex_density(
        _pages(sf, columns=["url", "html"]))
    q["hex_kring_smooth"] = lambda sf: pages.hex_kring_smooth(
        _pages(sf, columns=["url", "html"]))
    q["bbox_range_count"] = lambda sf: pages.bbox_range_count(
        _pages(sf, columns=["url", "html"]))
    q["hex_mode_lang"] = lambda sf: pages.hex_mode_lang(
        _pages(sf, columns=["url", "html", "lang"]))

    def pages_in_city(sf):
        fx = ensure_fixtures(sf)
        bounds = pq.read_table(os.path.join(fx, "boundaries.parquet"))
        return pages.pages_in_city(_pages(sf, columns=["url", "html"]), bounds)

    q["pages_in_city"] = pages_in_city

    def pages_near_boundary(sf):
        fx = ensure_fixtures(sf)
        bounds = pq.read_table(os.path.join(fx, "boundaries.parquet"))
        return pages.pages_near_boundary(
            _pages(sf, columns=["url", "html"]), bounds)

    q["pages_near_boundary"] = pages_near_boundary
    q["mixture_resample"] = lambda sf: pages.mixture_resample(
        _pages(sf, columns=["url", "text"]))
    q["page_links"] = lambda sf: pages.page_links(
        _pages(sf, columns=["url", "html"]))
    q["anchor_text_index"] = lambda sf: pages.anchor_text_index(
        _pages(sf, columns=["url", "html"]))
    q["link_frontier"] = lambda sf: pages.link_frontier(
        _pages(sf, columns=["url", "html"]))
    q["frontier_priority"] = lambda sf: pages.frontier_priority(
        _pages(sf, columns=["url", "html"]))
    q["section_link_graph"] = lambda sf: pages.section_link_graph(
        _pages(sf, columns=["url", "html"]))

    def crawl_corpus_q(sf):
        from .pipelines.crawl_corpus import crawl_corpus

        return crawl_corpus(_pages(sf, columns=["url", "warc_ts", "html"]))

    q["crawl_corpus"] = crawl_corpus_q

    q["warc_pages"] = lambda sf: warc_src.read_warc_pages(warc_src.ensure_warc(sf))
    q["warc_quarantine"] = lambda sf: warc_src.read_warc_quarantine(
        warc_src.ensure_warc_corrupt(sf))
    q["jsonl_pages"] = lambda sf: jsonl_src.read_jsonl_pages(jsonl_src.ensure_jsonl(sf))
    q["csv_events"] = lambda sf: csv_src.read_csv_events(csv_src.ensure_csv(sf))

    # --- text analysis over documents
    q["doc_stats"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.doc_stats_batch, batch_format="pyarrow")
    q["doc_stats_melt"] = lambda sf: text.doc_stats_melt(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["lang_id"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.lang_id_batch, batch_format="pyarrow")
    q["lang_confusion"] = lambda sf: text.lang_confusion(
        _tbl(sf, "documents", ["doc_id", "text", "lang"]))
    q["quality_score"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.quality_score_batch, batch_format="pyarrow")
    q["gopher_quality"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.gopher_quality_batch, batch_format="pyarrow")
    q["linear_fit"] = lambda sf: text.linear_fit(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["corpus_diff"] = lambda sf: text.corpus_diff(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["fingerprint"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.fingerprint_batch, batch_format="pyarrow")
    q["normalize_unicode"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.normalize_unicode_batch, batch_format="pyarrow")
    q["quality_rank"] = lambda sf: text.quality_rank(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["c4_line_filter"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.c4_line_filter_batch, batch_format="pyarrow")

    # --- dedup family
    q["exact_dedup"] = lambda sf: dedup.exact_dedup(_tbl(sf, "documents", ["doc_id", "text"]))
    q["minhash_lsh_pairs"] = lambda sf: dedup.lsh_candidate_pairs(
        _tbl(sf, "documents", ["doc_id", "text"]))
    # ckpt_key persists the shared band rows + verified pairs once per input
    # (state/checkpoint.cached_dataset): the jaccard/survivor chain then runs
    # tokenize+MinHash ONCE even across both queries.  minhash_lsh_pairs
    # deliberately takes NO key so the bench keeps measuring the full kernel.
    q["near_dup_jaccard"] = lambda sf: dedup.jaccard_verified_pairs(
        _tbl(sf, "documents", ["doc_id", "text"]), ckpt_key=f"docs|{sf}")
    q["simhash"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        dedup.simhash_batch, batch_format="pyarrow", batch_size=8192)
    q["simhash_near_pairs"] = lambda sf: dedup.simhash_near_pairs(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["near_dup_char_ngram"] = lambda sf: dedup.char_ngram_verified_pairs(
        _tbl(sf, "documents", ["doc_id", "text"]), ckpt_key=f"docs|{sf}")
    q["near_dup_containment"] = lambda sf: dedup.containment_verified_pairs(
        _tbl(sf, "documents", ["doc_id", "text"]), ckpt_key=f"docs|{sf}")
    q["minhash_estimate_pairs"] = lambda sf: dedup.minhash_estimate_pairs(
        _tbl(sf, "documents", ["doc_id", "text"]), ckpt_key=f"docs|{sf}")
    q["near_dedup_survivors"] = lambda sf: dedup.near_dedup_survivors(
        _tbl(sf, "documents", ["doc_id", "text"]), ckpt_key=f"docs|{sf}")
    q["incremental_dedup_survivors"] = (
        lambda sf: dedup.incremental_dedup_survivors(
            _tbl(sf, "documents", ["doc_id", "text"]), ckpt_key=f"docs|{sf}"))
    q["dup_clusters"] = lambda sf: dedup.dup_clusters(
        _tbl(sf, "documents", ["doc_id", "text"]), ckpt_key=f"docs|{sf}")
    q["cluster_representatives"] = lambda sf: dedup.cluster_representatives(
        _tbl(sf, "documents", ["doc_id", "text"]), ckpt_key=f"docs|{sf}")
    q["dup_ngram_stats"] = lambda sf: dedup.dup_ngram_stats(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["paragraph_dedup"] = lambda sf: dedup.paragraph_dedup(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["scrub_dup_ngrams"] = lambda sf: dedup.scrub_dup_ngrams(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["bpe_token_count"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.bpe_token_count_batch, batch_format="pyarrow")
    q["bpe_train"] = lambda sf: text.bpe_train(
        _tbl(sf, "documents", ["text"]))
    q["bpe_apply"] = lambda sf: text.bpe_apply(
        _tbl(sf, "documents", ["text"]))
    q["bpe_train_filtered"] = lambda sf: text.bpe_train_filtered(
        _tbl(sf, "documents", ["doc_id", "text", "lang"]))
    q["sample_docs"] = lambda sf: _tbl(sf, "documents", ["doc_id"]).map_batches(
        text.sample_docs_batch, batch_format="pyarrow")
    q["token_quantiles"] = lambda sf: text.token_quantiles(
        _tbl(sf, "documents", ["text", "lang"]))
    q["top_terms_per_lang"] = lambda sf: text.top_terms_per_lang(
        _tbl(sf, "documents", ["text", "lang"]))
    q["distinct_tokens_per_lang"] = lambda sf: text.distinct_tokens_per_lang(
        _tbl(sf, "documents", ["text", "lang"]))
    q["hll_distinct_shingles"] = lambda sf: text.hll_distinct_shingles(
        _tbl(sf, "documents", ["text", "lang"]))
    q["tfidf_top_terms"] = lambda sf: text.tfidf_top_terms(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["stratified_sample"] = lambda sf: text.stratified_sample(
        _tbl(sf, "documents", ["doc_id", "lang"]))
    q["shuffle_assignment"] = lambda sf: text.shuffle_assignment(
        _tbl(sf, "documents", ["doc_id"]))
    q["token_freq_histogram"] = lambda sf: text.token_freq_histogram(
        _tbl(sf, "documents", ["text"]))
    q["cms_token_counts"] = lambda sf: text.cms_token_counts(
        _tbl(sf, "documents", ["text"]))
    q["collocations"] = lambda sf: text.collocations(
        _tbl(sf, "documents", ["text"]))
    q["doc_chunks"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.doc_chunks_batch, batch_format="pyarrow")
    q["decontaminate"] = lambda sf: dedup.decontaminate(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["repetition_stats"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.repetition_stats_batch, batch_format="pyarrow")
    q["pack_sequences"] = lambda sf: text.pack_sequences(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["redact_pii"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.redact_pii_batch, batch_format="pyarrow")
    q["doc_sentences"] = lambda sf: _tbl(sf, "documents", ["doc_id", "text"]).map_batches(
        text.doc_sentences_batch, batch_format="pyarrow")
    def clean_corpus_q(sf):
        from .pipelines.corpus_clean import clean_corpus

        return clean_corpus(_tbl(sf, "documents", ["doc_id", "text", "lang"]),
                            ckpt_key=f"docs|{sf}")

    q["clean_corpus"] = clean_corpus_q
    q["quality_filtered_docs"] = lambda sf: text.quality_filtered_docs(
        _tbl(sf, "documents", ["doc_id", "text", "lang"]))
    q["graph_pagerank"] = lambda sf: graph.graph_pagerank(
        _tbl(sf, "documents", ["doc_id"]))
    q["bm25_search"] = lambda sf: retrieval.bm25_search(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["lm_score"] = lambda sf: text.lm_score(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["inverted_index"] = lambda sf: retrieval.inverted_index(
        _tbl(sf, "documents", ["doc_id", "text"]))

    # --- similarity search over embeddings
    def knn_cosine(sf):
        emb = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        qref = ray.put(similarity.load_queries(emb))
        return similarity.knn_brute(_tbl(sf, "embeddings", ["vec_id", "embedding"]), qref)

    q["knn_cosine"] = knn_cosine

    def rrf_fusion(sf):
        emb = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        qref = ray.put(similarity.load_queries(emb))
        return similarity.rrf_fusion(
            _tbl(sf, "embeddings", ["vec_id", "embedding"]), qref)

    q["rrf_fusion"] = rrf_fusion

    def knn_graph(sf):
        emb = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        dbref = ray.put(similarity.load_db(emb))
        return similarity.knn_graph(
            _tbl(sf, "embeddings", ["vec_id", "embedding"]), dbref)

    q["knn_graph"] = knn_graph

    def knn_graph_chunked(sf):
        # the exact graph's SCALE form: db ships as bounded object-store
        # chunks (4 here so the merge path is exercised at gate scale)
        emb = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        refs = similarity.load_db_chunks(emb, n_chunks=4)
        return similarity.knn_graph_chunked(
            _tbl(sf, "embeddings", ["vec_id", "embedding"]), refs)

    q["knn_graph_chunked"] = knn_graph_chunked
    q["embedding_near_dup"] = lambda sf: similarity.near_dup_pairs(
        _tbl(sf, "embeddings", ["vec_id", "embedding"]))
    q["embedding_centroids"] = lambda sf: similarity.embedding_centroids(
        _tbl(sf, "embeddings", ["embedding", "label"]))
    q["embedding_moments"] = lambda sf: similarity.embedding_moments(
        _tbl(sf, "embeddings", ["embedding", "label"]))
    q["embedding_dup_clusters"] = lambda sf: similarity.embedding_dup_clusters(
        _tbl(sf, "embeddings", ["vec_id", "embedding"]))

    def ann_lsh(sf):  # approximate — no SQL oracle by design
        emb = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        qref = ray.put(similarity.load_queries(emb))
        return similarity.ann_bucketed(_tbl(sf, "embeddings", ["vec_id", "embedding"]), qref)

    q["ann_lsh"] = ann_lsh

    def ann_ivf(sf):  # IVF-flat inverted lists — approximate, no SQL oracle
        emb = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        qref = ray.put(similarity.load_queries(emb))
        return similarity.ann_ivf(_tbl(sf, "embeddings", ["vec_id", "embedding"]), qref)

    q["ann_ivf"] = ann_ivf

    def ann_ivf_pq(sf):  # IVF + packed product-quantized codes — approximate
        emb = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        qref = ray.put(similarity.load_queries(emb))
        return similarity.ann_ivf_pq(
            _tbl(sf, "embeddings", ["vec_id", "embedding"]), qref)

    q["ann_ivf_pq"] = ann_ivf_pq

    # --- corpus curation (round-4 session-13: split / cap / proportional
    # sample / quantize — the assemble-the-training-set family)
    q["dataset_split"] = lambda sf: curation.dataset_split(
        _tbl(sf, "documents", ["doc_id"]))
    q["host_capped_pages"] = lambda sf: curation.host_capped_pages(
        _pages(sf, columns=["url"]))
    q["host_split"] = lambda sf: curation.host_split(
        _pages(sf, columns=["url"]))
    q["proportional_sample"] = lambda sf: curation.proportional_sample(
        _tbl(sf, "documents", ["doc_id", "lang"]))
    q["embedding_quantize"] = lambda sf: curation.embedding_quantize(
        _tbl(sf, "embeddings", ["vec_id", "embedding"]))
    q["token_budget_sample"] = lambda sf: curation.token_budget_sample(
        _tbl(sf, "documents", ["doc_id", "text", "lang"]))
    q["weighted_sample"] = lambda sf: curation.weighted_sample(
        _tbl(sf, "documents", ["doc_id", "n_chars"]))

    # --- multimodal: REAL pure-Python decodes (netpbm raster, RIFF/WAVE
    # PCM16) over deterministic doc_id-keyed payloads; the actor-pool decode
    # stage reads the actual bytes, the oracle predicts them in closed form
    q["image_decode_ppm"] = lambda sf: (
        _codec_ids(sf)
        .map_batches(multimodal.ppm_media_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(multimodal.PPMDecode, batch_format="pyarrow",
                     batch_size=256, concurrency=(1, 8)))
    q["image_decode_png"] = lambda sf: (
        _codec_ids(sf)
        .map_batches(multimodal.png_media_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(multimodal.PNGDecode, batch_format="pyarrow",
                     batch_size=256, concurrency=(1, 8)))
    q["image_decode_gif"] = lambda sf: (
        _codec_ids(sf)
        .map_batches(multimodal.gif_media_batch, batch_format="pyarrow", batch_size=512)
        # the encode stage FUSES into this actor pool, so the pool cap is the
        # pipeline's parallelism — size it to the node, not a fraction of it
        .map_batches(multimodal.GIFDecode, batch_format="pyarrow",
                     # FIXED pool: pre-provision all actors (an autoscaling
                     # (1, N) pool never ramps up inside a seconds-long job)
                     batch_size=64, concurrency=_codec_pool()))
    q["image_decode_jpeg"] = lambda sf: (
        _codec_ids(sf)
        .map_batches(multimodal.jpeg_media_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(multimodal.JPEGDecode, batch_format="pyarrow",
                     # FIXED pool: pre-provision all actors (an autoscaling
                     # (1, N) pool never ramps up inside a seconds-long job)
                     batch_size=64, concurrency=_codec_pool()))
    q["video_frame_sample"] = lambda sf: (
        _codec_ids(sf)
        .map_batches(multimodal.avi_media_batch, batch_format="pyarrow", batch_size=256)
        .map_batches(multimodal.MJPEGFrameSample, batch_format="pyarrow",
                     # FIXED pool: pre-provision all actors (an autoscaling
                     # (1, N) pool never ramps up inside a seconds-long job)
                     batch_size=64, concurrency=_codec_pool()))
    q["audio_decode_flac"] = lambda sf: (
        _codec_ids(sf)
        .map_batches(multimodal.flac_media_batch, batch_format="pyarrow", batch_size=256)
        .map_batches(multimodal.FLACDecode, batch_format="pyarrow",
                     # FIXED pool: pre-provision all actors (an autoscaling
                     # (1, N) pool never ramps up inside a seconds-long job)
                     batch_size=64, concurrency=_codec_pool()))
    q["audio_decode_wav"] = lambda sf: (
        _codec_ids(sf)
        .map_batches(multimodal.wav_media_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(multimodal.WavDecode, batch_format="pyarrow",
                     batch_size=256, concurrency=(1, 8)))
    q["image_resize_ppm"] = lambda sf: (
        _codec_ids(sf)
        .map_batches(multimodal.ppm_media_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(multimodal.PPMResize, batch_format="pyarrow",
                     batch_size=256, concurrency=(1, 8))
        .map_batches(lambda b: b.select(["doc_id", "width", "height", "sum_px"]),
                     batch_format="pyarrow"))
    q["audio_fingerprint"] = lambda sf: multimodal.audio_fingerprint(
        _codec_ids(sf))
    q["image_ahash"] = lambda sf: multimodal.image_ahash(
        _codec_ids(sf))
    q["image_histogram"] = lambda sf: multimodal.image_histogram(
        _codec_ids(sf))
    q["image_dup_pairs"] = lambda sf: multimodal.image_dup_pairs(
        _codec_ids(sf))
    q["image_dup_clusters"] = lambda sf: multimodal.image_dup_clusters(
        _codec_ids(sf))
    q["image_dedup_survivors"] = lambda sf: multimodal.image_dedup_survivors(
        _codec_ids(sf))

    # --- events (stream-shaped)
    q["events_hourly"] = lambda sf: events.hourly_window(
        _tbl(sf, "events", ["event_type", "ts", "value"]))
    q["hourly_burst"] = lambda sf: events.hourly_burst(
        _tbl(sf, "events", ["ts"]))

    def events_recent_counts(sf):
        # row-filter pushdown at the READ: parquet row groups whose ts
        # max falls before the cutoff never decode a byte
        import numpy as np
        import pyarrow.compute as pc_

        ds = rd.read_parquet(
            os.path.join(sf, "events.parquet"),
            columns=["event_type", "ts"],
            filter=pc_.field("ts") >= pc_.scalar(
                np.datetime64(events.RECENT_CUTOFF.replace(" ", "T"), "us")))
        return events.recent_type_counts(ds)

    q["events_recent_counts"] = events_recent_counts
    q["sessions"] = lambda sf: events.sessionize(
        _tbl(sf, "events", ["user_id", "event_id", "ts"]))
    q["events_sliding"] = lambda sf: events.sliding_window(
        _tbl(sf, "events", ["event_type", "ts", "value"]))
    q["asof_prev_purchase"] = lambda sf: events.asof_prev_purchase(
        _tbl(sf, "events", ["user_id", "event_id", "ts", "event_type"]))
    q["user_event_gaps"] = lambda sf: events.user_event_gaps(
        _tbl(sf, "events", ["user_id", "event_id", "ts"]))
    q["post_purchase_window"] = lambda sf: events.post_purchase_window(
        _tbl(sf, "events", ["user_id", "event_id", "ts", "event_type", "value"]))
    q["funnel_stages"] = lambda sf: events.funnel_stages(
        _tbl(sf, "events", ["user_id", "ts", "event_type"]))
    q["retention_cohorts"] = lambda sf: events.retention_cohorts(
        _tbl(sf, "events", ["user_id", "ts"]))
    q["props_kv_stats"] = lambda sf: events.props_kv_stats(
        _tbl(sf, "events", ["event_type", "props"]))
    q["events_rollup"] = lambda sf: events.events_rollup(
        _tbl(sf, "events", ["event_type", "ts", "value"]))
    q["events_pivot"] = lambda sf: events.events_pivot(
        _tbl(sf, "events", ["event_type", "ts", "value"]))
    q["user_streaks"] = lambda sf: events.user_streaks(
        _tbl(sf, "events", ["user_id", "ts"]))
    q["session_cooccurrence"] = lambda sf: events.session_cooccurrence(
        _tbl(sf, "events", ["user_id", "event_id", "ts", "event_type"]))
    q["event_transitions"] = lambda sf: events.event_transitions(
        _tbl(sf, "events", ["user_id", "event_id", "ts", "event_type"]))
    q["suite_coverage"] = lambda sf: dedup.suite_coverage(
        _tbl(sf, "documents", ["doc_id", "text"]))
    q["late_arrivals"] = lambda sf: events.late_arrivals(
        _tbl(sf, "events", ["event_id", "ts", "user_id"]))
    q["daily_active_users"] = lambda sf: events.daily_active_users(
        _tbl(sf, "events", ["user_id", "ts"]))
    q["session_concurrency"] = lambda sf: events.session_concurrency(
        _tbl(sf, "events", ["user_id", "event_id", "ts"]))
    q["events_profile"] = lambda sf: curation.table_profile(_tbl(sf, "events"))
    q["documents_profile"] = lambda sf: curation.table_profile(
        _tbl(sf, "documents"))

    # --- relational building blocks
    q["pricing_summary"] = lambda sf: relational.pricing_summary(
        _tbl(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                              "l_extendedprice", "l_discount"]))

    def rev_nation(sf):
        cust = pq.read_table(os.path.join(sf, "customer.parquet"),
                             columns=["c_custkey", "c_nationkey"])
        nat = pq.read_table(os.path.join(sf, "nation.parquet"))
        return relational.revenue_by_nation(
            _tbl(sf, "orders", ["o_custkey", "o_totalprice"]), cust, nat)

    q["revenue_by_nation"] = rev_nation
    def ship_prio(sf):
        return relational.shipping_priority(
            _tbl(sf, "customer", ["c_custkey", "c_mktsegment"]),
            _tbl(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                "o_orderpriority"]),
            _tbl(sf, "lineitem", ["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"]))

    q["shipping_priority"] = ship_prio

    def big_ords(sf):
        cust = pq.read_table(os.path.join(sf, "customer.parquet"),
                             columns=["c_custkey", "c_name"])
        return relational.big_orders(
            _tbl(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                "o_totalprice"]),
            _tbl(sf, "lineitem", ["l_orderkey", "l_quantity"]), cust)

    q["big_orders"] = big_ords
    q["cold_customers"] = lambda sf: relational.cold_customers(
        _tbl(sf, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
        _tbl(sf, "orders", ["o_custkey", "o_orderstatus"]))
    q["rolling_order_sum"] = lambda sf: relational.rolling_order_sum(
        _tbl(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"]))
    q["running_order_total"] = lambda sf: relational.running_order_total(
        _tbl(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"]))
    q["late_shipment_priority"] = lambda sf: relational.late_shipment_priority(
        _tbl(sf, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]),
        _tbl(sf, "lineitem", ["l_orderkey", "l_shipdate"]))
    def promo_rev(sf):
        part = pq.read_table(os.path.join(sf, "part.parquet"),
                             columns=["p_partkey", "p_type"])
        return relational.promo_revenue(
            _tbl(sf, "lineitem", ["l_partkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"]), part)

    q["promo_revenue"] = promo_rev
    def small_qty(sf):
        part = pq.read_table(os.path.join(sf, "part.parquet"),
                             columns=["p_partkey", "p_brand"])
        return relational.small_qty_revenue(
            _tbl(sf, "lineitem", ["l_partkey", "l_quantity",
                                  "l_extendedprice"]), part,
            stats_lineitem_ds=_tbl(sf, "lineitem",
                                   ["l_partkey", "l_quantity"]))

    q["small_qty_revenue"] = small_qty
    def disj_rev(sf):
        part = pq.read_table(os.path.join(sf, "part.parquet"),
                             columns=["p_partkey", "p_brand", "p_size"])
        return relational.disjunctive_revenue(
            _tbl(sf, "lineitem", ["l_partkey", "l_quantity",
                                  "l_extendedprice"]), part)

    q["disjunctive_revenue"] = disj_rev

    def top_supp(sf):
        supp = pq.read_table(os.path.join(sf, "supplier.parquet"),
                             columns=["s_suppkey", "s_name"])
        return relational.top_supplier(
            _tbl(sf, "lineitem", ["l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"]), supp)

    q["top_supplier"] = top_supp

    def wait_supp(sf):
        orders = pq.read_table(os.path.join(sf, "orders.parquet"),
                               columns=["o_orderkey", "o_orderdate"])
        supp = pq.read_table(os.path.join(sf, "supplier.parquet"),
                             columns=["s_suppkey", "s_name"])
        return relational.waiting_suppliers(
            _tbl(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]),
            orders, supp)

    q["waiting_suppliers"] = wait_supp
    def local_supp(sf):
        t = lambda n, cols: pq.read_table(os.path.join(sf, f"{n}.parquet"),
                                          columns=cols)
        return relational.local_supplier_revenue(
            _tbl(sf, "lineitem", ["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"]),
            t("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            t("customer", ["c_custkey", "c_nationkey"]),
            t("supplier", ["s_suppkey", "s_nationkey"]),
            t("nation", ["n_nationkey", "n_name", "n_regionkey"]),
            t("region", ["r_regionkey", "r_name"]))

    q["local_supplier_revenue"] = local_supp
    def min_cost_supp(sf):
        t = lambda n, cols: pq.read_table(os.path.join(sf, f"{n}.parquet"),
                                          columns=cols)
        return relational.min_cost_supplier(
            _tbl(sf, "lineitem", ["l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"]),
            t("part", ["p_partkey", "p_brand", "p_size"]),
            t("supplier", ["s_suppkey", "s_name", "s_nationkey"]),
            t("nation", ["n_nationkey", "n_name"]))

    q["min_cost_supplier"] = min_cost_supp

    def ret_rev(sf):
        t = lambda n, cols: pq.read_table(os.path.join(sf, f"{n}.parquet"),
                                          columns=cols)
        return relational.returned_item_revenue(
            _tbl(sf, "lineitem", ["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"]),
            _tbl(sf, "orders", ["o_orderkey", "o_custkey"]),
            t("customer", ["c_custkey", "c_name", "c_nationkey"]),
            t("nation", ["n_nationkey", "n_name"]))

    q["returned_item_revenue"] = ret_rev
    q["order_count_distribution"] = lambda sf: relational.order_count_distribution(
        _tbl(sf, "customer", ["c_custkey"]),
        _tbl(sf, "orders", ["o_custkey", "o_orderpriority"]))

    def mkt_share(sf):
        t = lambda n, cols: pq.read_table(os.path.join(sf, f"{n}.parquet"),
                                          columns=cols)
        return relational.nation_market_share(
            _tbl(sf, "lineitem", ["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"]),
            _tbl(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            t("customer", ["c_custkey", "c_nationkey"]),
            t("supplier", ["s_suppkey", "s_nationkey"]),
            t("nation", ["n_nationkey", "n_name", "n_regionkey"]),
            t("region", ["r_regionkey", "r_name"]))

    q["nation_market_share"] = mkt_share
    q["acctbal_quantiles"] = lambda sf: relational.acctbal_quantiles(
        _tbl(sf, "customer", ["c_acctbal"]))
    q["pareto_parts"] = lambda sf: relational.pareto_parts(
        _tbl(sf, "part", ["p_partkey", "p_retailprice", "p_size"]))
    q["top_parts"] = lambda sf: relational.top_parts(
        _tbl(sf, "part", ["p_partkey", "p_name", "p_retailprice"]))
    q["top_parts_per_brand"] = lambda sf: relational.top_parts_per_brand(
        _tbl(sf, "part", ["p_partkey", "p_name", "p_brand", "p_retailprice"]))

    def anti_join(sf):
        orders = pq.read_table(os.path.join(sf, "orders.parquet"),
                               columns=["o_custkey", "o_orderstatus"])
        return filters.customers_without_orders(
            _tbl(sf, "customer", ["c_custkey", "c_name"]), orders)

    q["customers_without_orders"] = anti_join

    def pri_counts(sf):
        return relational.order_priority_counts(
            _tbl(sf, "orders", ["o_orderkey", "o_orderdate",
                                "o_orderpriority"]),
            _tbl(sf, "lineitem", ["l_orderkey", "l_shipdate"]))

    q["order_priority_counts"] = pri_counts
    q["forecast_revenue"] = lambda sf: relational.forecast_revenue(
        _tbl(sf, "lineitem", ["l_shipdate", "l_discount", "l_quantity",
                              "l_extendedprice"]))

    def vol_ship(sf):
        t = lambda n, cols: pq.read_table(os.path.join(sf, f"{n}.parquet"),
                                          columns=cols)
        return relational.volume_shipping(
            _tbl(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"]),
            _tbl(sf, "orders", ["o_orderkey", "o_custkey"]),
            t("customer", ["c_custkey", "c_nationkey"]),
            t("supplier", ["s_suppkey", "s_nationkey"]),
            t("nation", ["n_nationkey", "n_name"]))

    q["volume_shipping"] = vol_ship

    def prod_profit(sf):
        t = lambda n, cols: pq.read_table(os.path.join(sf, f"{n}.parquet"),
                                          columns=cols)
        return relational.product_type_profit(
            _tbl(sf, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"]),
            _tbl(sf, "orders", ["o_orderkey", "o_orderdate"]),
            t("part", ["p_partkey", "p_name"]),
            t("supplier", ["s_suppkey", "s_nationkey"]),
            t("nation", ["n_nationkey", "n_name"]))

    q["product_type_profit"] = prod_profit
    q["late_lineitem_modes"] = lambda sf: relational.late_lineitem_modes(
        _tbl(sf, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"]),
        _tbl(sf, "orders", ["o_orderkey", "o_orderdate",
                            "o_orderpriority"]))

    def psv(sf):
        t = lambda n, cols: pq.read_table(os.path.join(sf, f"{n}.parquet"),
                                          columns=cols)
        return relational.part_supplier_variety(
            _tbl(sf, "lineitem", ["l_partkey", "l_suppkey"]),
            t("part", ["p_partkey", "p_brand", "p_type", "p_size"]),
            t("supplier", ["s_suppkey", "s_acctbal"]))

    q["part_supplier_variety"] = psv
    q["important_parts"] = lambda sf: relational.important_parts(
        _tbl(sf, "lineitem", ["l_partkey", "l_extendedprice",
                              "l_discount"]))

    def promo_supp(sf):
        t = lambda n, cols: pq.read_table(os.path.join(sf, f"{n}.parquet"),
                                          columns=cols)
        return relational.promo_part_suppliers(
            _tbl(sf, "lineitem", ["l_partkey", "l_suppkey", "l_shipdate",
                                  "l_quantity"]),
            t("part", ["p_partkey", "p_name"]),
            t("supplier", ["s_suppkey", "s_name", "s_nationkey"]),
            t("nation", ["n_nationkey", "n_name"]))

    q["promo_part_suppliers"] = promo_supp

    # Reorder so the driver's first-50 sample spans every family (see
    # DRIVER_SAMPLE_50).  Python dicts preserve insertion order, so this is
    # the entire mechanism.
    assert len(DRIVER_SAMPLE_50) == 50, len(DRIVER_SAMPLE_50)
    missing = [k for k in DRIVER_SAMPLE_50 if k not in q]
    assert not missing, f"DRIVER_SAMPLE_50 names absent from registry: {missing}"
    ordered = {k: q[k] for k in DRIVER_SAMPLE_50}
    ordered.update((k, v) for k, v in q.items() if k not in ordered)
    return ordered


def oracle_sql() -> dict:
    from .oracle import oracle_rows

    fx = ensure_fixtures(ORACLE_SF_DIR)
    ways_path = os.path.join(fx, "ways.parquet")
    # pages.parquet is a sharded DIRECTORY since fixture v5; DuckDB needs
    # the glob (sorted, so row order matches the old single file)
    pages_tbl = f"read_parquet('{os.path.join(fx, 'pages.parquet', '*.parquet')}')"
    # flagship oracles: the single-process reference oracle's rows are
    # materialized once per scale (independent implementation, golden +
    # 4-leg Node-conformance tested) and the SQL is a bare projection —
    # this makes the headline pipeline hash-checkable by the driver.
    full_orc, geom_orc = oracle_rows.ensure_intersections_oracle(ORACLE_SF_DIR)
    return {
        "intersections_full": oracle_rows.intersections_full_sql(full_orc),
        "intersections_geom_only": oracle_rows.intersections_geom_only_sql(geom_orc),
        "way_names": qs.way_names_sql(ways_path),
        "shared_node_candidates": qs.shared_node_candidates_sql(ways_path),
        "dead_ends": qs.dead_ends_sql(ways_path),
        "cell_cover_stats": qs.cell_cover_stats_sql(ways_path),
        "cell_population": qs.cell_population_sql(ways_path),
        "geom_candidate_pairs": qs.geom_candidate_pairs_sql(ways_path),
        "nearest_way": knn.nearest_way_sql(ways_path),
        "nearest_two": knn.nearest_two_sql(ways_path),
        "pages_nearest_way": knn.pages_nearest_way_sql(pages_tbl, ways_path),
        "pages_segment_snap": knn.pages_segment_snap_sql(pages_tbl, ways_path),
        "snap_distance_profile": knn.snap_distance_profile_sql(
            pages_tbl, ways_path),
        "block_gps": qs.block_gps_sql(ways_path),
        "vectorize_raster": qs.vectorize_raster_sql(ways_path),
        "rasterize_ways": qs.rasterize_ways_sql(ways_path),
        "simplify_ways": qs.simplify_ways_sql(ways_path),
        "way_l1_lengths": qs.way_l1_lengths_sql(ways_path),
        "way_bearing_octants": qs.way_bearing_octants_sql(ways_path),
        "way_components": graph.way_components_sql(ways_path),
        "way_triangles": graph.way_triangles_sql(ways_path),
        "way_bfs_hops": graph.way_bfs_hops_sql(ways_path),
        "way_reach_meters": graph.way_reach_meters_sql(ways_path),
        "boundary_areas": qs.boundary_areas_sql(
            os.path.join(fx, "boundaries.parquet")),
        "boundary_adjacency": qs.boundary_adjacency_sql(
            os.path.join(fx, "boundaries.parquet")),
        "pages_extract": pages.extract_sql(pages_tbl),
        "pages_geotag": pages.geotag_sql(pages_tbl),
        "pages_way_join": pages.pages_way_join_sql(pages_tbl, ways_path),
        "host_section_stats": pages.host_section_stats_sql(pages_tbl),
        "page_links": pages.page_links_sql(pages_tbl),
        "section_link_graph": pages.section_link_graph_sql(pages_tbl),
        "anchor_text_index": pages.anchor_text_index_sql(pages_tbl),
        "link_frontier": pages.link_frontier_sql(pages_tbl),
        "frontier_priority": pages.frontier_priority_sql(pages_tbl),
        "url_canonical_dedup": pages.url_canonical_dedup_sql(pages_tbl),
        "surt_index": pages.surt_index_sql(pages_tbl),
        "morton_tiles": pages.morton_tiles_sql(pages_tbl),
        "fetch_schedule": pages.fetch_schedule_sql(pages_tbl),
        "url_blocklist_filter": pages.url_blocklist_filter_sql(pages_tbl),
        "crawl_corpus": __import__(
            "osm_intersections_ray.pipelines.crawl_corpus",
            fromlist=["crawl_corpus_sql"]).crawl_corpus_sql(pages_tbl),
        "domain_mix_weights": pages.domain_mix_weights_sql(pages_tbl),
        "tile_pyramid": pages.tile_pyramid_sql(pages_tbl),
        "way_page_density": pages.way_page_density_sql(pages_tbl, ways_path),
        "bloom_url_filter": pages.bloom_url_filter_sql(pages_tbl),
        "host_distinct_kmv": pages.host_distinct_kmv_sql(pages_tbl),
        "page_hotspots": pages.page_hotspots_sql(pages_tbl),
        "page_hotspot_assign": pages.page_hotspot_assign_sql(pages_tbl),
        "page_hex_density": pages.page_hex_density_sql(pages_tbl),
        "hex_kring_smooth": pages.hex_kring_smooth_sql(pages_tbl),
        "bbox_range_count": pages.bbox_range_count_sql(pages_tbl),
        "hex_mode_lang": pages.hex_mode_lang_sql(pages_tbl),
        "pages_in_city": pages.pages_in_city_sql(
            pages_tbl, os.path.join(fx, "boundaries.parquet")),
        "pages_near_boundary": pages.pages_near_boundary_sql(
            pages_tbl, os.path.join(fx, "boundaries.parquet")),
        "mixture_resample": pages.mixture_resample_sql(pages_tbl),
        "warc_pages": warc_src.warc_pages_sql(pages_tbl),
        "warc_quarantine": warc_src.warc_quarantine_sql(pages_tbl),
        "jsonl_pages": jsonl_src.jsonl_pages_sql(pages_tbl),
        "csv_events": csv_src.csv_events_sql("events"),
        "doc_stats": text.doc_stats_sql(),
        "doc_stats_melt": text.doc_stats_melt_sql(),
        "lang_id": text.lang_id_sql(),
        "lang_confusion": text.lang_confusion_sql(),
        "quality_score": text.quality_score_sql(),
        "gopher_quality": text.gopher_quality_sql(),
        "linear_fit": text.linear_fit_sql(),
        "fingerprint": text.fingerprint_sql(),
        "corpus_diff": text.corpus_diff_sql(),
        "normalize_unicode": text.normalize_unicode_sql(),
        "quality_rank": text.quality_rank_sql(),
        "c4_line_filter": text.c4_line_filter_sql(),
        "exact_dedup": dedup.exact_dedup_sql(),
        "minhash_lsh_pairs": dedup.lsh_pairs_sql(),
        "near_dup_jaccard": dedup.jaccard_pairs_sql(),
        "simhash": dedup.simhash_sql(),
        "simhash_near_pairs": dedup.simhash_near_pairs_sql(),
        "near_dup_char_ngram": dedup.char_ngram_pairs_sql(),
        "near_dup_containment": dedup.containment_pairs_sql(),
        "minhash_estimate_pairs": dedup.minhash_estimate_pairs_sql(),
        "near_dedup_survivors": dedup.near_dedup_survivors_sql(),
        "incremental_dedup_survivors": dedup.incremental_dedup_survivors_sql(),
        "dup_clusters": dedup.dup_clusters_sql(),
        "cluster_representatives": dedup.cluster_representatives_sql(),
        "dup_ngram_stats": dedup.dup_ngram_stats_sql(),
        "paragraph_dedup": dedup.paragraph_dedup_sql(),
        "scrub_dup_ngrams": dedup.scrub_dup_ngrams_sql(),
        "bpe_token_count": text.bpe_token_count_sql(),
        "bpe_train": text.bpe_train_sql(),
        "bpe_apply": text.bpe_apply_sql(),
        "bpe_train_filtered": text.bpe_train_filtered_sql(),
        "sample_docs": text.sample_docs_sql(),
        "token_quantiles": text.token_quantiles_sql(),
        "top_terms_per_lang": text.top_terms_per_lang_sql(),
        "distinct_tokens_per_lang": text.distinct_tokens_per_lang_sql(),
        "hll_distinct_shingles": text.hll_distinct_shingles_sql(),
        "tfidf_top_terms": text.tfidf_top_terms_sql(),
        "stratified_sample": text.stratified_sample_sql(),
        "shuffle_assignment": text.shuffle_assignment_sql(),
        "token_freq_histogram": text.token_freq_histogram_sql(),
        "cms_token_counts": text.cms_token_counts_sql(),
        "collocations": text.collocations_sql(),
        "doc_chunks": text.doc_chunks_sql(),
        "decontaminate": dedup.decontaminate_sql(),
        "repetition_stats": text.repetition_stats_sql(),
        "pack_sequences": text.pack_sequences_sql(),
        "redact_pii": text.redact_pii_sql(),
        "doc_sentences": text.doc_sentences_sql(),
        "quality_filtered_docs": text.quality_filtered_docs_sql(),
        "graph_pagerank": graph.graph_pagerank_sql(),
        "bm25_search": retrieval.bm25_search_sql(),
        "lm_score": text.lm_score_sql(),
        "inverted_index": retrieval.inverted_index_sql(),
        "clean_corpus": __import__(
            "osm_intersections_ray.pipelines.corpus_clean",
            fromlist=["clean_corpus_sql"]).clean_corpus_sql(),
        "image_decode_ppm": multimodal.image_decode_sql(),
        "image_decode_png": multimodal.png_decode_sql(),
        "image_decode_gif": multimodal.gif_decode_sql(),
        "image_decode_jpeg": multimodal.jpeg_decode_sql(),
        "video_frame_sample": multimodal.avi_decode_sql(),
        "audio_decode_flac": multimodal.flac_decode_sql(),
        "audio_decode_wav": multimodal.audio_decode_sql(),
        "image_resize_ppm": multimodal.image_resize_sql(),
        "image_ahash": multimodal.image_ahash_sql(),
        "image_histogram": multimodal.image_histogram_sql(),
        "image_dup_pairs": multimodal.image_dup_pairs_sql(),
        "audio_fingerprint": multimodal.audio_fingerprint_sql(),
        "image_dup_clusters": multimodal.image_dup_clusters_sql(),
        "image_dedup_survivors": multimodal.image_dedup_survivors_sql(),
        "dataset_split": curation.dataset_split_sql(),
        "host_capped_pages": curation.host_capped_pages_sql(pages_tbl),
        "host_split": curation.host_split_sql(pages_tbl),
        "proportional_sample": curation.proportional_sample_sql(),
        "embedding_quantize": curation.embedding_quantize_sql(),
        "token_budget_sample": curation.token_budget_sample_sql(),
        "weighted_sample": curation.weighted_sample_sql(),
        "knn_cosine": similarity.knn_sql(),
        "knn_graph": similarity.knn_graph_sql(),
        "knn_graph_chunked": similarity.knn_graph_sql(),  # identical result
        "rrf_fusion": similarity.rrf_fusion_sql(),
        "embedding_near_dup": similarity.near_dup_sql(),
        "embedding_centroids": similarity.embedding_centroids_sql(),
        "embedding_moments": similarity.embedding_moments_sql(),
        "embedding_dup_clusters": similarity.embedding_dup_clusters_sql(),
        "events_hourly": events.hourly_window_sql(),
        "hourly_burst": events.hourly_burst_sql(),
        "events_recent_counts": events.recent_type_counts_sql(),
        "sessions": events.sessionize_sql(),
        "events_sliding": events.sliding_window_sql(),
        "asof_prev_purchase": events.asof_prev_purchase_sql(),
        "post_purchase_window": events.post_purchase_window_sql(),
        "user_event_gaps": events.user_event_gaps_sql(),
        "funnel_stages": events.funnel_stages_sql(),
        "props_kv_stats": events.props_kv_stats_sql(),
        "retention_cohorts": events.retention_cohorts_sql(),
        "events_rollup": events.events_rollup_sql(),
        "events_pivot": events.events_pivot_sql(),
        "user_streaks": events.user_streaks_sql(),
        "event_transitions": events.event_transitions_sql(),
        "suite_coverage": dedup.suite_coverage_sql(),
        "late_arrivals": events.late_arrivals_sql(),
        "session_concurrency": events.session_concurrency_sql(),
        "events_profile": curation.table_profile_sql(
            "events", ["event_id", "ts", "user_id", "event_type", "value",
                       "props"]),
        "documents_profile": curation.table_profile_sql(
            "documents", ["doc_id", "text", "lang", "source", "n_chars"]),
        "daily_active_users": events.daily_active_users_sql(),
        "session_cooccurrence": events.session_cooccurrence_sql(),
        "pricing_summary": relational.pricing_summary_sql(),
        "revenue_by_nation": relational.revenue_by_nation_sql(),
        "shipping_priority": relational.shipping_priority_sql(),
        "big_orders": relational.big_orders_sql(),
        "cold_customers": relational.cold_customers_sql(),
        "running_order_total": relational.running_order_total_sql(),
        "rolling_order_sum": relational.rolling_order_sum_sql(),
        "late_shipment_priority": relational.late_shipment_priority_sql(),
        "promo_revenue": relational.promo_revenue_sql(),
        "small_qty_revenue": relational.small_qty_revenue_sql(),
        "pareto_parts": relational.pareto_parts_sql(),
        "disjunctive_revenue": relational.disjunctive_revenue_sql(),
        "top_supplier": relational.top_supplier_sql(),
        "waiting_suppliers": relational.waiting_suppliers_sql(),
        "acctbal_quantiles": relational.acctbal_quantiles_sql(),
        "min_cost_supplier": relational.min_cost_supplier_sql(),
        "returned_item_revenue": relational.returned_item_revenue_sql(),
        "order_count_distribution": relational.order_count_distribution_sql(),
        "nation_market_share": relational.nation_market_share_sql(),
        "local_supplier_revenue": relational.local_supplier_revenue_sql(),
        "top_parts": relational.top_parts_sql(),
        "top_parts_per_brand": relational.top_parts_per_brand_sql(),
        "customers_without_orders": filters.customers_without_orders_sql(),
        "order_priority_counts": relational.order_priority_counts_sql(),
        "forecast_revenue": relational.forecast_revenue_sql(),
        "volume_shipping": relational.volume_shipping_sql(),
        "product_type_profit": relational.product_type_profit_sql(),
        "late_lineitem_modes": relational.late_lineitem_modes_sql(),
        "part_supplier_variety": relational.part_supplier_variety_sql(),
        "important_parts": relational.important_parts_sql(),
        "promo_part_suppliers": relational.promo_part_suppliers_sql(),
        # ann_lsh / ann_ivf / ann_ivf_pq: rows-only by design (approximate ANN paths;
        # recall-tested against knn_brute in tests instead)
    }
