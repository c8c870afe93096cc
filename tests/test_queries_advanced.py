"""Semantics checks that the oracle can't express: approximate-aggregate
accuracy vs exact, and as-of join ordering edge (same-timestamp click
counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_spark.queries.advanced import (
    approx_distinct_and_quantile,
    asof_join_purchase_click,
)
from lakehouse_architecture_spark.sources.tables import load_table


def test_approx_aggregates_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.n, r.med)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("med"),
        )
        .collect()
    }
    approx = {
        r.l_returnflag: (r.approx_orders, r.approx_median)
        for r in approx_distinct_and_quantile(spark, sf_dir).collect()
    }
    for flag, (n, med) in exact.items():
        an, amed = approx[flag]
        assert abs(an - n) / n < 0.05
        assert abs(amed - med) / med < 0.05


def test_asof_join_same_ts_click_counts(spark, sf_dir):
    out = asof_join_purchase_click(spark, sf_dir)
    rows = out.collect()
    assert all(
        r.asof_click_ms is None or r.asof_click_ms <= r.purchase_ms
        for r in rows
    )
    # purchases with no prior click yield null asof (left-join semantics)
    assert {r.asof_click_ms is None for r in rows} <= {True, False}


def test_hll_sketch_estimates_close_to_exact(spark, sf_dir):
    """The mergeable-sketch rollup's HLL estimates must sit within 5%
    of the exact distinct counts, per day and for the merged total."""
    from lakehouse_architecture_spark.queries.events import (
        events_hll_sketch_rollup,
    )
    from lakehouse_architecture_spark.sources.tables import load_table

    rows = events_hll_sketch_rollup(spark, sf_dir).collect()
    per_day = [r for r in rows if r.day is not None]
    assert per_day, "no daily rows"
    for r in per_day:
        assert abs(r.est_users - r.exact_users) <= max(1, 0.05 * r.exact_users)

    total_row = next(r for r in rows if r.day is None)
    exact_total = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(total_row.est_users - exact_total) <= max(1, 0.05 * exact_total)
