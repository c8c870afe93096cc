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
# Round-10 priority (the cache-bounding round). Standing-row staleness
# after r9 (CORRECTNESS_r01..r09, latest round per query): 15 rows last
# checked r5 (all TPC-H), 46 r6, 44 r7, 43 r8, 50 r9. Window
# arithmetic, 50 slots: 2 sentinels
# + 15 r5-stale TPC-H rows (the rotation the r9 verdict ordered —
#   after this window no standing row is older than r6)
# + 25 r10-touched/new (every query whose plan gained a one-slot /
#   identity-keyed persist this round, plus the two new KMV sketch
#   queries)
# + 8 oldest r6-stale rows = 50 exactly (asserted by
#   tests/test_oracle_gate.py::test_driver_window_composition).
# The 35 remaining r6-stale rows lead r11.
_PRIORITY = [
    # (a) r5-stale TPC-H (standing row five rounds old)
    "q4_priority_late_ship",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_sole_late_supplier",
    # (b) r10-touched: plain .cache() sites replaced by bounded
    # one-slot persists (operators/caching), span/gram slots now
    # identity-keyed — same logical plans, new persist choreography
    "parts_coorder_triangles",
    "orders_bloom_prune_stats",
    "lineitem_key_skew_profile",
    "minhash_lsh_near_dups",
    "minhash_estimate_qa",
    "minhash_recall_curve",
    "docs_ngram_jaccard_pairs",
    "docs_incremental_near_dups",
    "simhash_near_pairs",
    "customers_fuzzy_name_stats",
    "customers_entity_resolution",
    "events_chi2_type_dow",
    "events_stickiness_ratio",
    "events_hll_intersection_qa",
    "emb_semantic_dedup",
    "emb_knn_ivf",
    "docs_dup_components",
    "docs_dedup_keep_best",
    "docs_dup_cluster_size_histogram",
    "docs_curation_funnel",
    "docs_shared_span_pairs",
    "docs_copied_span_profile",
    "docs_incremental_copied_spans",
    "events_kmv_intersection_qa",  # NEW in r10: first driver row
    "events_kmv_daily_rollup",  # NEW in r10: first driver row
    # (c) 9 oldest r6-stale rows (session-state-sensitive families
    # first: persisted corpus index, catalog/temp-view round-trips,
    # write-path guards)
    "docs_incremental_near_dups_indexed",
    "events_hll_sketch_rollup",
    "asof_join_purchase_click",
    "range_join_price_bands",
    "sql_catalog_roundtrip",
    "not_exists_insert_guard",
    "sql_insert_not_exists",
    "quantiles_exact",
    # r11 leads (36 r6-stale incl. scalar_subquery_above_avg and
    # pivot_status_by_priority, which yielded their slots to the two
    # new KMV queries): agg_cube_flags, agg_grouping_sets,
    # agg_rollup_status_priority, agg_stats_by_status,
    # case_when_conditional_agg, correlated_min_per_group_join,
    # dedup_latest_order_per_customer, distinct_segments,
    # docs_rare_token_ratio, events_daily_new_vs_returning,
    # events_signup_to_purchase_1h, events_trailing_24h_volume,
    # join_* (7), q22_dormant_customers, scalar_date_funcs,
    # scalar_string_funcs, setop_* (4), sql_probe_orders,
    # sql_revenue_by_nation, topk_orders, window_* (5)
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
# standing green rows from r6/r7/r8 (or are r5-stale TPC-H rows named
# in the r10-leads comment above) and their code is unchanged in r9, so
# the window is spent on the hugeint fixes and the r4/r5-stale rotation
# above. Names that also appear in _PRIORITY are deduped there first.
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
