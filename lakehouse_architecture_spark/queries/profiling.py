"""Data-profiling queries: the pre/post-load column summary
(operators/profile.py) over the ``orders`` fact table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.profile import profile_table
from lakehouse_architecture_spark.queries.registry import query
from lakehouse_architecture_spark.sources.tables import load_table

_COLS = {
    "o_orderkey": "bigint",
    "o_custkey": "bigint",
    "o_orderstatus": "string",
    "o_totalprice": "double",
    "o_orderdate": "date",
    "o_orderpriority": "string",
}


def _col_sql(c: str, t: str) -> str:
    mn, mx = f"MIN({c})", f"MAX({c})"
    if t == "double":
        mn, mx = f"CAST({mn} AS DECIMAL(18,2))", f"CAST({mx} AS DECIMAL(18,2))"
    return f"""
SELECT '{c}' AS col_name, n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  COUNT(DISTINCT {c}) AS n_distinct,
  CAST({mn} AS VARCHAR) AS min_value,
  CAST({mx} AS VARCHAR) AS max_value
FROM base, n GROUP BY n_rows"""


PROFILE_ORACLE = (
    """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
  FROM orders
),
n AS (SELECT COUNT(*) AS n_rows FROM base)
"""
    + " UNION ALL ".join(_col_sql(c, t) for c, t in _COLS.items())
    + "\nORDER BY col_name"
)


@query("profile_orders_columns", oracle=PROFILE_ORACLE)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of orders: nulls, distincts, min/max per
    column — the load-validation summary (operators/profile.py)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("date")
    )
    return profile_table(orders, _COLS)


SCD2_ORACLE = """
WITH b AS (
  SELECT c_custkey, c_mktsegment,
         (CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
          AS BIGINT) % 100) AS bk
  FROM customer
)
SELECT c_custkey, c_mktsegment,
       DATE '2024-01-01' AS valid_from,
       CASE WHEN bk < 10 THEN DATE '2024-06-01'
            ELSE DATE '9999-12-31' END AS valid_to,
       (bk >= 10) AS is_current
FROM b
UNION ALL
SELECT c_custkey, 'MOVED', DATE '2024-06-01', DATE '9999-12-31', TRUE
FROM b WHERE bk < 10
ORDER BY c_custkey, valid_from
"""


@query("scd2_customer_history", oracle=SCD2_ORACLE)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 lifecycle as a checkable query: bootstrap the customer
    dimension, then apply a deterministic segment change (hash bucket
    < 10 -> 'MOVED') effective mid-year; return the full version
    history. The oracle reconstructs the same history set-theoretically
    — closed originals for changed keys, open originals for the rest,
    new open versions for the changes (operators/scd.py)."""
    from lakehouse_architecture_spark.operators.scd import (
        scd2_apply,
        scd2_bootstrap,
    )
    from lakehouse_architecture_spark.queries.sampling import hash_bucket

    snap = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    hist = scd2_bootstrap(snap, "c_custkey", ["c_mktsegment"], "2024-01-01")
    upd = snap.withColumn(
        "c_mktsegment",
        F.when(hash_bucket(F.col("c_custkey")) < 10, "MOVED").otherwise(
            F.col("c_mktsegment")
        ),
    )
    hist2 = scd2_apply(hist, upd, "c_custkey", ["c_mktsegment"], "2024-06-01")
    return hist2.orderBy("c_custkey", "valid_from")


BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS leading_digit
  FROM orders
),
g AS (SELECT leading_digit, COUNT(*) AS n_orders FROM d GROUP BY 1),
t AS (SELECT SUM(n_orders) AS tot FROM g)
SELECT leading_digit, CAST(n_orders AS BIGINT) AS n_orders,
       CAST((n_orders * 1000000) // tot AS BIGINT) AS share_ppm
FROM g, t
ORDER BY leading_digit
"""


@query("orders_benford_first_digit", oracle=BENFORD_ORACLE)
def orders_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order totals — the Benford's-law
    profile used as a fraud / synthetic-data / unit-mixup detector in
    data-quality audits (naturally-grown monetary amounts follow
    P(d) = log10(1 + 1/d); a flat or truncated profile flags generated
    or clipped data — as it does on THIS synthetic corpus, where the
    price generator's uniform range caps the digit mass at 1-4).

    Exactness doctrine: the digit is taken from the integer CENTS
    rendering (prices are 2-decimal by construction), never from a
    double's string form, and the share is parts-per-million via
    integer DIV — every emitted value is an exact integer, no libm and
    no float division anywhere. One scan, one 9-row aggregate, a 1-row
    broadcast for the total."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    by_digit = (
        orders.select(
            F.substring(cents.cast("string"), 1, 1)
            .cast("int")
            .alias("leading_digit")
        )
        .groupBy("leading_digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = by_digit.agg(F.sum("n_orders").alias("_tot"))
    return (
        by_digit.crossJoin(F.broadcast(tot))
        .select(
            "leading_digit",
            "n_orders",
            F.expr("(n_orders * 1000000) DIV _tot").alias("share_ppm"),
        )
        .orderBy("leading_digit")
    )
