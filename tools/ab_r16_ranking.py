"""r16 interleaved A/B: old per-row-rank form vs new group-level form
of the three global_row_number consumers, one session, alternating
reps (the r4-r5 doctrine — never compare timings across sessions).

Usage: python tools/ab_r16_ranking.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_architecture_spark.operators.ranking import (  # noqa: E402
    global_row_number,
)
from lakehouse_architecture_spark.queries import QUERIES  # noqa: E402
from lakehouse_architecture_spark.session import get_spark  # noqa: E402
from lakehouse_architecture_spark.sources.tables import load_table  # noqa: E402


def old_equidepth(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    ranked = global_row_number(
        li, ["cents"], ["l_orderkey", "l_linenumber"], out_col="rk"
    )
    n_total = li.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select(F.expr("((rk - 1) * 20) DIV _n + 1").alias("band"), "cents")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("band")
    )


def old_gini(spark, sf_dir):
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    ranked = global_row_number(spend, ["cents"], ["o_custkey"], out_col="rk")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("rk") * F.col("cents")).alias("rank_weighted_cents"),
    )


def old_decile(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_row_number(docs, ["n_chars"], ["doc_id"], out_col="rk")
    tot = docs.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.expr("CAST((rk - 1) * 10 DIV _n + 1 AS INT)").alias("decile"),
            "n_chars",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("decile")
    )


PAIRS = {
    "lineitem_price_equidepth_bands": old_equidepth,
    "orders_customer_spend_gini": old_gini,
    "docs_length_decile_profile": old_decile,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark(
        "ab-r16-ranking", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def mat(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # value identity first: collected sorted rows must be identical
    for name, old_fn in PAIRS.items():
        a = sorted(map(str, old_fn(spark, sf_dir).collect()))
        b = sorted(map(str, QUERIES[name](spark, sf_dir).collect()))
        assert a == b, f"VALUE MISMATCH {name}"
        print(f"values identical: {name} ({len(a)} rows)")

    for name, old_fn in PAIRS.items():  # warmup both forms
        mat(old_fn)
        mat(QUERIES[name])

    olds: dict[str, list[float]] = {n: [] for n in PAIRS}
    news: dict[str, list[float]] = {n: [] for n in PAIRS}
    for _ in range(reps):
        for name, old_fn in PAIRS.items():
            olds[name].append(mat(old_fn))
            news[name].append(mat(QUERIES[name]))
    for name in PAIRS:
        mo = statistics.median(olds[name])
        mn = statistics.median(news[name])
        print(
            f"{name}: old median {mo:.3f}s (min {min(olds[name]):.3f})"
            f" -> new median {mn:.3f}s (min {min(news[name]):.3f})"
            f"  [{mo / mn:.2f}x]"
        )


if __name__ == "__main__":
    main()
