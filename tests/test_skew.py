"""Salting operators preserve semantics: salted plans equal unsalted."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.skew import (
    salted_agg_count_sum,
    salted_join,
)
from lakehouse_architecture_spark.sources.tables import load_table


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = {
        r.l_returnflag: (r.n_rows, r.sum_value)
        for r in salted_agg_count_sum(li, "l_returnflag", "l_quantity").collect()
    }
    plain = {
        r.l_returnflag: (r.n_rows, r.sum_value)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = salted_join(li, orders, "l_orderkey", n_salts=8)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    s = salted.groupBy("o_orderpriority").count().collect()
    p = plain.groupBy("o_orderpriority").count().collect()
    assert {r.o_orderpriority: r["count"] for r in s} == {
        r.o_orderpriority: r["count"] for r in p
    }
