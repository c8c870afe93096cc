"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the noop sink (count() would let
Catalyst prune the computed columns).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_architecture_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q9_product_profit",
    "q13_customer_order_distribution",
    "q18_large_volume_customers",
    "q21_sole_late_supplier",
    "join_left_outer_order_counts",
    "agg_stats_by_status",
    "window_rank_orders",
    "dedup_latest_order_per_customer",
    "validate_lineitem_fk_invalid",
    "events_sessionization",
    "events_hourly_by_type",
    "docs_exact_dup_groups",
    "docs_token_stats",
    "minhash_lsh_near_dups",
    "docs_ngram_jaccard_pairs",
    "docs_hash_split_counts",
    "events_funnel",
    "emb_near_dup_pairs",
    "emb_knn_bruteforce",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_architecture_spark.queries import QUERIES

    spark = get_spark("lakehouse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing so per-query numbers measure the queries
    materialize(QUERIES["q6_forecast_revenue"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 3)

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
