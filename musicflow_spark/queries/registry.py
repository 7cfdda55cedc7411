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
# query (round-2's 11 HUGEINT reds, the 4 round-1 reds, and the
# never-checked sampling/warehouse/vectors/cleanse/approx families) sits
# inside the window.  Update after each round from CORRECTNESS_r{N}.json.
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
)

# Queries added AFTER the round-3 window was frozen.  They sort after
# the 50 never-driver-proven entries (which exactly fill this round's
# window — every one must get its driver row) but before the proven
# tail, so they enter the window automatically next round when this
# round's greens move to _DRIVER_PROVEN.
_NEW_THIS_ROUND: tuple[str, ...] = (
    "shipment_overlap_pairs",
    "hll_mergeable_daily",
    "corpus_vocab_topk",
    "doc_rarity_score",
    "doc_bpe_token_stats",
    "embedding_gram_moments",
    "embedding_semantic_dedup",
    "media_feature_values",
    "regional_supplier_volume",
    "forecast_revenue_delta",
    "returned_item_customers",
    "embedding_pca_scores",
    "customer_profile",
    "orders_with_customer_version",
    "doc_canonical_selection",
    "lateral_top_customers",
    "regional_rollup",
    "customer_order_gaps",
    "customer_profile_sketch",
    "best_supplier_per_part",
    "nation_profit_by_year",
    "ship_latency_priority_counts",
    "promo_revenue_share",
    "top_supplier_revenue",
    "part_supplier_variety",
    "excess_inventory_suppliers",
    "user_activity_streaks",
    "cms_token_counts",
    "event_props_variant_stats",
    "daily_value_interpolated",
    "knn_bruteforce_blas",
    "approx_top_tokens",
    "user_value_locf",
    "recursive_yearly_revenue",
    "pipe_return_status_stats",
    "doc_bigram_condprob",
    "quantile_sketch_daily",
    "doc_incremental_dedup",
    "doc_winnow_fingerprints",
    "doc_winnow_pairs",
    "event_type_quantiles",
)


def get_queries() -> list[Query]:
    """All registered queries, never-driver-proven first (see
    ``_DRIVER_PROVEN``); module order is stable within each tier."""
    from musicflow_spark.queries import approx as _approx
    from musicflow_spark.queries import classic as _classic
    from musicflow_spark.queries import cleanse as _cleanse
    from musicflow_spark.queries import events as _events
    from musicflow_spark.queries import multimodal as _multimodal
    from musicflow_spark.queries import relational as _relational
    from musicflow_spark.queries import sampling as _sampling
    from musicflow_spark.queries import textops as _textops
    from musicflow_spark.queries import timeseries as _timeseries
    from musicflow_spark.queries import vectors as _vectors
    from musicflow_spark.queries import warehouse as _warehouse

    out: list[Query] = []
    for mod in (
        _relational,
        _classic,
        _events,
        _timeseries,
        _textops,
        _sampling,
        _cleanse,
        _vectors,
        _multimodal,
        _warehouse,
        _approx,
    ):
        out.extend(mod.QUERIES)
    names = [q.name for q in out]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate query names: {dupes}")
    proven = set(_DRIVER_PROVEN)
    fresh = set(_NEW_THIS_ROUND)
    # tier 0: never proven, in the driver window; tier 1: added after
    # the window froze; tier 2: driver-proven.  Stable within tiers.
    out.sort(key=lambda q: 2 if q.name in proven else (1 if q.name in fresh else 0))
    return out


ALL_QUERIES = get_queries
