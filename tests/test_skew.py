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


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew handling must activate on a planted hot key
    (thresholds lowered to make the 50k-row key 'skewed' at test scale)
    — at 100 TB this is what keeps one reducer from owning the hot key,
    complementing the deterministic salting operators above."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "20KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(60000).select(
            F.when(F.col("id") < 50000, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-payload-payload-"),
                     F.col("id").cast("string")).alias("pl"),
        )
        right = spark.range(2000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 50000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # the hot partition was split
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
