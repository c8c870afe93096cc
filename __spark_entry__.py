"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual query surface lives in ``lakehouse_architecture_spark.queries``
(one module per operator family, each query registered with its oracle
twin); this file only adapts that registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from lakehouse_architecture_spark.queries.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, SF0001_DIR)


# The verify driver checks queries in dict-insertion order (first N).
# Ordering strategy: a couple of stable sentinels, then the queries that
# most need a FRESH driver row this round (never-checked operators and
# regression fixes), then operator families. Queries already green in
# r1/r2 CORRECTNESS files keep that evidence even when rotated past the
# window, so the window is spent on new information.
_SENTINELS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
]
# Round-8 priority (the precision round): (a) EVERY query whose code
# or oracle changed this round — the three r7 driver-RED queries
# (orders_trend_by_segment: centered regressor; ztest + skew profile:
# exact integer/decimal payloads with decision booleans), the p95
# null-filter oracle, the full-precision-hardened numeric surfaces
# (kmeans/scalar-math/norms/centroid/int8, corr), and the new
# ExactSubstr span family; (b) the 13 queries whose
# standing row is still r3; (c) all 39 r4-stale rows, the r7-touched
# minhash/shingle families first (they sit atop the explode_grams
# rewrite). The whole r7 wave got fresh green rows in r7 and rotates
# out. 2 sentinels + 4 + 13 + 31 of the r4 block fill the 50-slot
# window; the last 8 r4 rows lead r9.
_PRIORITY = [
    # (a) r8 fixes — red r7 rows and the oracle-touched p95 — plus
    # the two never-checked r8 additions (substring-level dedup)
    "docs_shared_span_pairs",
    "docs_copied_span_profile",
    "docs_incremental_copied_spans",
    "stats_corr_price_qty",
    "orders_trend_by_segment",
    "lineitem_key_skew_profile",
    "events_ab_test_value_ztest",
    "events_value_p95_by_type",
    "emb_kmeans_clusters",
    "scalar_math_funcs",
    "emb_norms",
    "emb_centroid_norm_by_label",
    "emb_int8_quantization",
    # (b) r3-stale (standing row five rounds old)
    "docs_test_contamination",
    "docs_pii_scrub",
    "docs_repetition_score",
    "docs_token_entropy",
    "docs_novelty_score",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "events_sessionization",
    "events_ohlc_downsample",
    "events_gapfilled_hourly",
    "window_percent_rank_cume",
    "q2_min_cost_supplier",
    "ri_dangling_lineitems",
    # (c) r4-stale — r7-touched operator families first
    "minhash_lsh_near_dups",
    "minhash_signatures_sample",
    "docs_ngram_jaccard_pairs",
    "docs_shingle_stats",
    "docs_incremental_near_dups",
    "validate_orders_invalid",
    "validate_orders_rejection_summary",
    "validate_orders_split_stats",
    "validate_lineitem_fk_invalid",
    "validate_lineitem_fk_summary",
    "docs_exact_dup_groups",
    "docs_exact_dedupe_count",
    "docs_token_stats",
    "docs_quality_score",
    "docs_lang_id",
    "docs_top_terms",
    "docs_tfidf_top_terms",
    "docs_fingerprint",
    "docs_hash_split_counts",
    "docs_stratified_sample",
    "docs_mixture_resample",
    "docs_chunk_manifest",
    "emb_knn_lsh",
    "emb_knn_bruteforce_decimal",
    "events_hourly_by_type",
    "events_funnel",
    "events_retention_cohorts",
    "events_anomaly_zscore",
    "events_type_value_stats",
    "events_props_extract",
    "events_tumbling_window",
    "events_daily_active_users",
    "events_hll_accuracy_qa",
    "agg_argmax_by_status",
    "approx_distinct_and_quantile",
]
_FAMILY_ORDER = [
    "profiling",
    "dedup_sim",
    "events",
    "text",
    "embeddings",
    "sampling",
    "validation_queries",
    "curation",
    "catalog_sql",
    "advanced",
]
# Queries pushed past the driver's check horizon this round: all have
# FRESH green rows in CORRECTNESS_r5 or r6 and their code is unchanged
# in r7, so the window is spent on the never-checked queries and the
# r3/r4-stale rotation above.
_SECOND_TIER = {
    "agg_cube_flags",
    "agg_grouping_sets",
    "agg_rollup_status_priority",
    "agg_stats_by_status",
    "asof_join_purchase_click",
    "basket_brand_pairs",
    "case_when_conditional_agg",
    "correlated_min_per_group_join",
    "dedup_latest_order_per_customer",
    "distinct_segments",
    "docs_curation_funnel",
    "docs_dedup_keep_best",
    "docs_dedup_savings_report",
    "docs_dup_cluster_size_histogram",
    "docs_dup_profile_by_source",
    "docs_incremental_near_dups_indexed",
    "docs_rare_token_ratio",
    "emb_ivf_probe_stats",
    "emb_kmeans_clusters",
    "emb_knn_bruteforce",
    "emb_knn_ivf",
    "emb_knn_ivf_md5",
    "emb_lsh_candidate_stats",
    "emb_near_dup_lsh",
    "emb_near_dup_lsh_strict",
    "emb_near_dup_pairs",
    "events_anomaly_mad",
    "events_daily_new_vs_returning",
    "events_dow_hour_heatmap",
    "events_hll_sketch_rollup",
    "events_signup_to_purchase_1h",
    "events_trailing_24h_volume",
    "events_type_transitions",
    "events_user_lifetime",
    "events_value_p95_by_type",
    "join_cross_region_pairs",
    "join_full_outer_nation_presence",
    "join_inner_orders_customer",
    "join_left_anti_inactive_customers",
    "join_left_outer_order_counts",
    "join_left_semi_active_customers",
    "join_right_outer_part_lineitems",
    "lineitem_discount_band_profile",
    "lineitem_unpivot_measure_stats",
    "minhash_estimate_qa",
    "minhash_recall_curve",
    "not_exists_insert_guard",
    "orders_cohort_monthly_value",
    "orders_interarrival_stats",
    "orders_rfm_segments",
    "pivot_status_by_priority",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_priority_counts",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_sole_late_supplier",
    "q22_dormant_customers",
    "q4_priority_late_ship",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quantiles_exact",
    "range_join_price_bands",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "scalar_subquery_above_avg",
    "setop_except_all_dup_aware",
    "setop_except_no_order_customers",
    "setop_intersect_keys",
    "setop_union_all_parties",
    "sql_catalog_roundtrip",
    "sql_insert_not_exists",
    "sql_probe_orders",
    "sql_revenue_by_nation",
    "stats_skew_kurtosis_qty",
    "supplier_fulfillment_latency",
    "topk_orders",
    "window_first_last_dense",
    "window_lag_order_gaps",
    "window_lead_ntile",
    "window_moving_avg_frame",
    "window_rank_orders",
    "window_running_spend",
}


def _ordered_names() -> list[str]:
    from lakehouse_architecture_spark.queries import QUERIES
    from lakehouse_architecture_spark.queries.registry import MODULES

    names = [n for n in _SENTINELS + _PRIORITY if n in QUERIES]
    seen = set(names)
    for family in _FAMILY_ORDER:
        for n in QUERIES:
            if n not in seen and n not in _SECOND_TIER and MODULES.get(n) == family:
                names.append(n)
                seen.add(n)
    names.extend(n for n in QUERIES if n not in seen)
    return names


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lakehouse_architecture_spark.queries import QUERIES

    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every oracle-expressible query."""
    from lakehouse_architecture_spark.queries import ORACLES

    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
