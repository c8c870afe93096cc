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
# Round-15 priority. Standing-row staleness after r14
# (CORRECTNESS_r01..r14, latest round per query): 38 rows last checked
# r10, 43 r11, 46 r12, 46 r13, 50 r14 (plus the retired
# emb_near_dup_lsh's r9 row). Window arithmetic, 50 slots:
# 2 sentinels
# + 4 r15 NEW queries (docs_prefix_filter_jaccard_join_strict — the
#   production-regime t=0.8 twin the r14 verdict ordered: the prefix
#   index PRUNES there, 25 candidates vs 3,058 at t=0.3 on sf0.01;
#   lineitem_price_equidepth_bands — equal-count 20-band price
#   histogram, the third global_row_number consumer and the gate
#   witness for its near-unique-key regime, 20 per-band rows;
#   asof_join_forward_tolerance — FORWARD as-of with a 1h tolerance
#   window, one-shuffle union-and-carry in descending time;
#   docs_script_census — per-source character-class census as regex
#   MATCH COUNTS on both engines, all-integer)
# + 6 r15-TOUCHED queries (orders_customer_spend_gini — the r14 red:
#   determinants restated in plain BIGINT after the decimal(38,0)
#   hash-surface adjudication, AND riding the reworked operator;
#   docs_length_decile_profile — same global_row_number rework
#   (two-phase range offsets, no unpartitioned window);
#   docs_bpe_encode_stats — empty-document zero rows restored via
#   left join, oracle restated to match (r14 ADVICE);
#   docs_prefix_filter_jaccard_join — the ordered-prefix persisted
#   relation is now threshold-independent (shared slot refactor);
#   parts_coorder_weighted_pagerank — non-positive-weight guard;
#   sql_recursive_cte_calendar — carried-hi recursion, the 19x fix:
#   Spark inlines non-recursive CTEs, so the old bounds-join re-ran
#   the orders min/max aggregate in all ~80 recursion steps)
# + all 38 remaining r10-stale rows (the rotation the r14 verdict
#   ordered — after this window no standing row is older than r11)
# = 50 exactly (asserted by
# tests/test_oracle_gate.py::test_driver_window_composition).
# The 43 r11-stale rows lead r16; the board keeps the
# <=4-round refresh cadence.
_PRIORITY = [
    # (a) r15 new: first driver rows
    "docs_prefix_filter_jaccard_join_strict",
    "lineitem_price_equidepth_bands",
    "asof_join_forward_tolerance",
    "docs_script_census",
    # (b) r15-touched (gini BIGINT + global_row_number rework; BPE
    #     zero-row left join; prefix-slot refactor; weight guard)
    "orders_customer_spend_gini",
    "docs_length_decile_profile",
    "docs_bpe_encode_stats",
    "docs_prefix_filter_jaccard_join",
    "parts_coorder_weighted_pagerank",
    "sql_recursive_cte_calendar",
    # (c) the 38 remaining r10-stale rows
    "asof_join_purchase_click",
    "customers_fuzzy_name_stats",
    "docs_copied_span_profile",
    "docs_curation_funnel",
    "docs_ngram_jaccard_pairs",
    "docs_shared_span_pairs",
    "emb_knn_ivf",
    "emb_semantic_dedup",
    "events_chi2_type_dow",
    "events_hll_intersection_qa",
    "events_hll_sketch_rollup",
    "events_kmv_daily_rollup",
    "events_kmv_intersection_qa",
    "events_stickiness_ratio",
    "lineitem_key_skew_profile",
    "not_exists_insert_guard",
    "orders_bloom_prune_stats",
    "parts_coorder_triangles",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_sole_late_supplier",
    "q4_priority_late_ship",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quantiles_exact",
    "range_join_price_bands",
    "simhash_near_pairs",
    "sql_catalog_roundtrip",
    "sql_insert_not_exists",
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
# Queries pushed past the driver's check horizon this round:
# everything outside the 50-slot window above. All have standing green
# driver rows no older than r11 (the full r10-stale block is IN the
# window), and none was touched in r15, so the window is spent on the
# rotation plus the round's six changed/new queries. Regenerated
# each round as registry - sentinels - priority.
_SECOND_TIER = {
    "agg_argmax_by_status",
    "agg_cube_flags",
    "agg_grouping_sets",
    "agg_rollup_status_priority",
    "agg_stats_by_status",
    "approx_distinct_and_quantile",
    "basket_brand_pairs",
    "case_when_conditional_agg",
    "correlated_min_per_group_join",
    "customers_entity_resolution",
    "customers_fuzzy_pairs_d2",
    "customers_fuzzy_pairs_d2_capped",
    "dedup_latest_order_per_customer",
    "distinct_segments",
    "docs_bigram_cross_entropy",
    "docs_bpe_merge_qa",
    "docs_chunk_manifest",
    "docs_dedup_keep_best",
    "docs_dedup_savings_report",
    "docs_dup_cluster_size_histogram",
    "docs_dup_components",
    "docs_dup_profile_by_source",
    "docs_exact_dedupe_count",
    "docs_exact_dup_groups",
    "docs_fingerprint",
    "docs_hash_split_counts",
    "docs_incremental_copied_spans",
    "docs_incremental_near_dups",
    "docs_incremental_near_dups_indexed",
    "docs_lang_id",
    "docs_learned_filter_apply",
    "docs_length_histogram",
    "docs_mixture_resample",
    "docs_novelty_score",
    "docs_overlap_coefficient_pairs",
    "docs_packing_manifest",
    "docs_pii_scrub",
    "docs_prefix_entity_resolution",
    "docs_prefix_fuzzy_pairs_d2",
    "docs_quality_classifier_qa",
    "docs_quality_score",
    "docs_rare_token_ratio",
    "docs_repetition_score",
    "docs_shingle_stats",
    "docs_source_shingle_overlap",
    "docs_stratified_sample",
    "docs_test_contamination",
    "docs_tfidf_top_terms",
    "docs_token_entropy",
    "docs_token_freq_spectrum",
    "docs_token_stats",
    "docs_top_terms",
    "docs_vocab_growth_by_source",
    "docs_weighted_sample_topk",
    "docs_zipf_slope",
    "emb_centroid_norm_by_label",
    "emb_dim_variance_topk",
    "emb_int8_quantization",
    "emb_ivf_probe_stats",
    "emb_kmeans_clusters",
    "emb_knn_bruteforce",
    "emb_knn_bruteforce_decimal",
    "emb_knn_ivf_md5",
    "emb_knn_lsh",
    "emb_lsh_candidate_stats",
    "emb_near_dup_lsh_strict",
    "emb_near_dup_pairs",
    "emb_norms",
    "emb_pq_quantization_qa",
    "emb_top_pc_power_iteration",
    "events_ab_test_value_ztest",
    "events_anomaly_mad",
    "events_anomaly_zscore",
    "events_cms_topk_accuracy",
    "events_concurrent_sessions",
    "events_cusum_daily_drift",
    "events_daily_active_users",
    "events_daily_count_ewma",
    "events_daily_new_vs_returning",
    "events_dow_hour_heatmap",
    "events_funnel",
    "events_gapfilled_hourly",
    "events_hll_accuracy_qa",
    "events_hourly_by_type",
    "events_kmv_new_vs_returning",
    "events_ohlc_downsample",
    "events_props_extract",
    "events_retention_cohorts",
    "events_seasonal_anomaly",
    "events_session_length_percentiles",
    "events_session_overlap_pairs",
    "events_sessionization",
    "events_signup_to_purchase_1h",
    "events_trailing_24h_volume",
    "events_tumbling_window",
    "events_type_transitions",
    "events_type_value_stats",
    "events_user_lifetime",
    "events_user_volume_concentration",
    "events_value_p95_by_type",
    "events_value_quantile_rollup",
    "events_value_quantile_rollup_by_type",
    "join_cross_region_pairs",
    "join_full_outer_nation_presence",
    "join_inner_orders_customer",
    "join_left_anti_inactive_customers",
    "join_left_outer_order_counts",
    "join_left_semi_active_customers",
    "join_right_outer_part_lineitems",
    "lineitem_discount_band_profile",
    "lineitem_ols2_price_qty_discount",
    "lineitem_ols_price_on_qty",
    "lineitem_price_percentiles_by_flag",
    "lineitem_salted_agg_by_flag",
    "lineitem_unpivot_measure_stats",
    "minhash_estimate_qa",
    "minhash_lsh_near_dups",
    "minhash_recall_curve",
    "minhash_signatures_sample",
    "orders_benford_first_digit",
    "orders_cohort_monthly_value",
    "orders_expectation_report",
    "orders_incremental_rollup_state",
    "orders_interarrival_stats",
    "orders_monthly_growth",
    "orders_open_backlog_by_day",
    "orders_pareto_concentration",
    "orders_rfm_segments",
    "orders_trend_by_segment",
    "parts_coorder_core_numbers",
    "parts_coorder_kcore",
    "parts_coorder_link_prediction",
    "parts_coorder_pagerank",
    "parts_coorder_ppr",
    "parts_supplier_concentration",
    "pivot_status_by_priority",
    "profile_orders_columns",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_priority_counts",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "ri_dangling_lineitems",
    "scalar_array_funcs",
    "scalar_bitwise_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_null_semantics",
    "scalar_string_funcs",
    "scalar_subquery_above_avg",
    "scd2_customer_history",
    "setop_except_all_dup_aware",
    "setop_except_no_order_customers",
    "setop_intersect_keys",
    "setop_union_all_parties",
    "simhash_fingerprints",
    "snapshot_diff_counts",
    "sql_bucketed_colocated_join",
    "sql_lateral_top_orders",
    "sql_probe_orders",
    "sql_revenue_by_nation",
    "stats_corr_price_qty",
    "stats_skew_kurtosis_qty",
    "supplier_fulfillment_latency",
    "topk_orders",
    "validate_lineitem_fk_invalid",
    "validate_lineitem_fk_summary",
    "validate_orders_invalid",
    "validate_orders_rejection_summary",
    "validate_orders_split_stats",
    "window_first_last_dense",
    "window_lag_order_gaps",
    "window_lead_ntile",
    "window_moving_avg_frame",
    "window_percent_rank_cume",
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
