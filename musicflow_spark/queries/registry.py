"""Registry plumbing for driver-facing queries."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One driver-checkable query.

    name:   stable key (appears in CORRECTNESS_r{N}.json)
    survey: SURVEY.md §2 operator ids this query exercises
    spark:  (spark, sf_dir) -> DataFrame — the engine under test
    oracle: DuckDB-runnable ANSI SQL over the pre-registered views,
            or None for non-SQL-expressible operators
    bench:  include in bench.py headline timings
    """

    name: str
    survey: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False


# Queries with a green driver row in a past CORRECTNESS_r{N}.json.  The
# driver correctness-checks only the FIRST 50 registry entries per round,
# so already-proven queries rotate to the tail and every never-proven
# query sits inside the window.  Round-4 rotation: the 50 round-3 greens
# rolled in from CORRECTNESS_r03.json, leaving the 41 never-checked
# round-3 additions (winnow/incremental dedup, SemDeDup, Gram/PCA,
# CMS/qsketch/mergeable-HLL, VARIANT, recursive/pipe SQL, classic
# shapes, LOCF/interpolation, overlap join, profile, BLAS knn) as
# tier 0 plus up to 9 round-4 additions to fill the window.  Update
# after each round from CORRECTNESS_r{N}.json.
_DRIVER_PROVEN: tuple[str, ...] = (
    # green in CORRECTNESS_r02.json
    "pricing_summary", "iso_duration_parse", "snowflake_flatten",
    "customers_without_orders", "order_ratio_by_nation",
    "parts_in_multiple_orders", "lineitems_in_line_order",
    "guarded_upsert_parts", "nation_surrogate_ids", "part_surrogate_ids",
    "order_priority_routing", "conservation_counts", "distinct_flag_status",
    "top_revenue_orders", "pricing_rollup", "customer_segment_deciles",
    "top_orders_per_nation", "small_quantity_revenue", "sole_late_shippers",
    "nullaware_segment_anti", "late_order_priority_counts",
    "latest_event_per_user", "session_window_stats", "hourly_event_stats",
    "event_value_as_clock", "event_props_extract", "event_outliers",
    "signup_conversion_funnel", "weekly_cohort_retention", "events_asof_order",
    "fix_title_parts", "doc_fingerprint", "doc_token_stats", "doc_quality",
    "doc_lang_id", "doc_exact_dedup", "doc_jaccard_pairs",
    "doc_dedup_clusters", "doc_hash_embedding",
    # green in CORRECTNESS_r01.json only
    "knn_bruteforce", "embedding_label_stats", "embedding_neardup_pairs",
    "media_frame_stats",
    # green in CORRECTNESS_r03.json
    "dormant_rich_customers", "promo_revenue_brackets",
    "nation_pair_trade_volume", "market_share_by_year", "important_parts",
    "large_volume_orders", "user_sessions", "user_event_pivot",
    "daily_event_spine", "event_value_histogram", "first_week_event_window",
    "doc_length_profile", "corpus_clean", "doc_text_knn",
    "doc_minhash_dedup", "doc_simhash_pairs", "doc_tfidf_topk",
    "doc_frequent_ngrams", "doc_dup_spans", "doc_split_assign",
    "doc_stratified_sample", "doc_pack_sequences", "doc_chunks",
    "doc_split_contamination", "doc_bernoulli_sample", "doc_global_sample",
    "doc_mixture_schedule", "customer_pii_redact", "doc_repetition_stats",
    "user_erasure_audit", "knn_lsh", "knn_ivf", "embedding_lsh_neardup",
    "skew_salted_agg", "skew_salted_join", "order_status_cube",
    "daily_moving_stats", "scd2_customer_history", "incremental_user_rollup",
    "zorder_key_preview", "incremental_value_moments",
    "nation_value_percentiles", "segment_customer_overlap",
    "nation_metrics_unpivot", "customer_snapshot_diff",
    "order_revenue_range_window", "hll_distinct_users",
    "approx_median_prices", "weighted_sample_orders", "fuzzy_customer_pairs",
    # green in CORRECTNESS_r04.json
    "pipe_return_status_stats", "regional_supplier_volume",
    "forecast_revenue_delta", "returned_item_customers",
    "customer_order_gaps", "lateral_top_customers", "regional_rollup",
    "log_found_videos_mart", "log_for_tableau_mart",
    "log_not_found_videos_mart", "match_cascade_catalog",
    "skipped_during_run_analysis", "found_ratio_analysis",
    "found_by_stats_analysis", "best_supplier_per_part",
    "nation_profit_by_year", "ship_latency_priority_counts",
    "promo_revenue_share", "top_supplier_revenue", "part_supplier_variety",
    "excess_inventory_suppliers", "event_props_variant_stats",
    "user_value_locf", "recursive_yearly_revenue",
    "daily_value_interpolated", "user_activity_streaks",
    "shipment_overlap_pairs", "doc_bigram_condprob",
    "doc_incremental_dedup", "doc_winnow_fingerprints", "doc_winnow_pairs",
    "corpus_vocab_topk", "doc_rarity_score", "doc_bpe_token_stats",
    "doc_canonical_selection", "knn_bruteforce_blas",
    "embedding_gram_moments", "embedding_semantic_dedup",
    "media_feature_values", "customer_profile",
    "orders_with_customer_version", "customer_profile_sketch",
    "hll_mergeable_daily", "approx_top_tokens", "cms_token_counts",
    "quantile_sketch_daily", "event_type_quantiles", "theta_year_overlap",
    "kll_value_quantiles",
    # green in CORRECTNESS_r05.json (49/50; the 50th row is the
    # documented rows-only embedding_pca_scores, which stays unproven)
    "collection_cascade_catalog", "others_cascade_catalog",
    "stream_user_rollup", "stream_customer_merge",
    "stream_hourly_event_stats", "stream_latest_event_user",
    "stream_event_dedup", "stream_minhash_dedup",
    "doc_hard_negatives", "doc_url_canonical", "knn_pq", "knn_graph_lsh",
    "embedding_pca_invariants", "bloom_filtered_revenue",
    "customer_merge_upsert", "nation_trade_pagerank",
    "embedding_centrality_pagerank",
    # green in CORRECTNESS_r06.json (49/50 incl. the proven window-fill
    # pricing_summary; the 50th row was the rows-only
    # embedding_pca_scores, retired from the registry in round 7 in
    # favour of the closed-form embedding_pca_scores_2d oracle twin)
    "part_price_size_skyline", "brand_price_ols", "part_association_rules",
    "segment_conversion_wilson", "user_rolling_event_rate",
    "event_value_mad_outliers", "user_funnel_sequences",
    "event_attribution", "stream_sketch_users", "stream_segment_rollup",
    "stream_session_stats", "stream_sliding_event_stats",
    "stream_click_purchase_join", "stream_asof_purchase",
    "nb_classifier_eval", "corpus_zipf_fit", "doc_lang_nb_classifier",
    "doc_bm25_search", "corpus_source_divergence", "doc_perplexity_filter",
    "doc_containment_pairs", "corpus_training_selection",
    "corpus_pmi_collocations", "doc_allpairs_exact", "doc_paragraph_dedup",
    "doc_star_components", "corpus_temperature_mixture",
    "doc_weighted_sample", "corpus_dsir_selection", "knn_sq8",
    "knn_ivf_trained", "embedding_centroid_classifier", "knn_ivfpq",
    "knn_mmr", "embedding_kmeans", "media_binary_dedup",
    "orders_benford_screen", "orders_psi_drift", "orders_table_checksum",
    "segment_priority_chi2", "segment_join_view_ivm",
    "customer_entity_mart", "skew_salted_topk", "customer_rfm_segments",
    "part_copurchase_reach", "knn_graph_triangles", "knn_link_prediction",
    "part_copurchase_kcore",
    # green in CORRECTNESS_r07.json (50/50, first round with no grey row)
    "stream_click_purchase_leftjoin", "corpus_bpe_merges",
    "doc_quality_logreg", "doc_bpe_encode", "embedding_pca_scores_2d",
    "knn_pca2_reduced", "media_phash_neardup", "media_phash_ingest",
    "media_phash_groups",
    # green in CORRECTNESS_r08.json (50/50; the other 29 window rows
    # were round-keyed re-certifications of already-proven queries)
    "stream_click_purchase_fulljoin", "stream_scd2_history",
    "doc_span_scrub", "corpus_unigram_vocab", "doc_unigram_encode",
    "doc_tokenizer_compare", "doc_quality_adaboost", "doc_pack_bpe",
    "doc_preference_pairs", "customer_kanonymity_audit",
    "corpus_retrieval_mart", "knn_ivf_recall", "knn_ivf_ingest",
    "embedding_lsh_recall", "media_audio_features", "media_audio_neardup",
    "media_video_framestats", "media_video_scenecuts", "media_audio_ingest",
    "media_audio_groups", "corpus_multimodal_mart",
    # green in CORRECTNESS_r09.json (50/50; the other 37 window rows
    # were round-keyed re-certifications of already-proven queries)
    "stream_suffix_dedup", "doc_kn_perplexity", "doc_suffix_dedup",
    "doc_quality_calibration", "knn_graph_ingest", "knn_pq_trained",
    "knn_beam", "knn_graph_nndescent", "knn_graph_refine_recall",
    "embedding_coreset", "knn_beam_recall", "corpus_crossmodal_mart",
    "crossmodal_retrieval",
    # green in CORRECTNESS_r10.json (50/50; the other 41 window rows
    # were round-keyed re-certifications of already-proven queries)
    "stream_crossmodal_mart", "corpus_shard_manifest", "knn_opq",
    "knn_hnsw", "knn_hnsw_recall", "knn_hnsw_ingest",
    "corpus_crossmodal_training_mart", "crossmodal_semantic_dedup",
    "crossmodal_lsh_retrieval",
    # green in CORRECTNESS_r11.json (50/50; the other 43 window rows
    # were round-keyed re-certifications of already-proven queries)
    "stream_unicode_dedup", "corpus_training_batch_mart",
    "doc_unicode_dedup", "doc_unicode_quality", "doc_unicode_normalize",
    "knn_ivf_at_rest", "knn_ivf_at_rest_ingest",
)

#: Current build round — bump when rotating the previous round's greens
#: into ``_DRIVER_PROVEN``.  Drives the proven-tier window fill: the
#: driver correctness-checks the FIRST 50 registry entries each round,
#: and after tier 0/1 (never-proven queries) the remaining slots are
#: filled from ``_DRIVER_PROVEN`` starting at a round-keyed offset —
#: ``(_ROUND * _FILL_STRIDE) % len(_DRIVER_PROVEN)`` — so the WHOLE
#: proven tier re-earns a driver-green row every ~len/stride rounds
#: instead of the same module-order prefix being re-checked forever
#: (VERDICT r07 item 1).
_ROUND = 12
_FILL_STRIDE = 41

# Queries added AFTER the current round's 50-query window was frozen.
# They sort after the window but before the proven tail, so they enter
# the window automatically next round when this round's greens move to
# _DRIVER_PROVEN.  Round-12 rotation: all 7 round-11 additions (the
# unicode tier batch+stream, the training-batch capstone mart, at-rest
# IVF serve+ingest) went driver-green in CORRECTNESS_r11.json and
# rolled into _DRIVER_PROVEN; the window head is now the round-12
# additions plus the round-keyed proven fill.
_NEW_THIS_ROUND: tuple[str, ...] = ()


def get_queries() -> list[Query]:
    """All registered queries, never-driver-proven first (see
    ``_DRIVER_PROVEN``); module order is stable within each tier."""
    from musicflow_spark.queries import approx as _approx
    from musicflow_spark.queries import classic as _classic
    from musicflow_spark.queries import cleanse as _cleanse
    from musicflow_spark.queries import events as _events
    from musicflow_spark.queries import graph as _graph
    from musicflow_spark.queries import matchflow as _matchflow
    from musicflow_spark.queries import multimodal as _multimodal
    from musicflow_spark.queries import relational as _relational
    from musicflow_spark.queries import sampling as _sampling
    from musicflow_spark.queries import streamtwins as _streamtwins
    from musicflow_spark.queries import textops as _textops
    from musicflow_spark.queries import timeseries as _timeseries
    from musicflow_spark.queries import vectors as _vectors
    from musicflow_spark.queries import warehouse as _warehouse

    out: list[Query] = []
    for mod in (
        _relational,
        _matchflow,
        _classic,
        _events,
        _streamtwins,
        _timeseries,
        _textops,
        _sampling,
        _cleanse,
        _vectors,
        _multimodal,
        _warehouse,
        _approx,
        _graph,
    ):
        out.extend(mod.QUERIES)
    names = [q.name for q in out]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate query names: {dupes}")
    proven_pos = {n: i for i, n in enumerate(_DRIVER_PROVEN)}
    fresh = set(_NEW_THIS_ROUND)
    n_proven = len(_DRIVER_PROVEN)
    offset = (_ROUND * _FILL_STRIDE) % n_proven
    # tier 0: never proven, in the driver window; tier 1: added after
    # the window froze; tier 2: driver-proven, ROTATED by round so the
    # window fill re-certifies a different proven slice each round.
    # Stable within tiers 0/1 (module order).
    def _key(q: Query) -> tuple[int, int]:
        if q.name in proven_pos:
            return (2, (proven_pos[q.name] - offset) % n_proven)
        return (1 if q.name in fresh else 0, 0)

    out.sort(key=_key)
    return out


ALL_QUERIES = get_queries
