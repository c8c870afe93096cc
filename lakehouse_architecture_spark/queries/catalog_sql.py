"""Catalog / SQL-string surface queries.

The reference's user-facing query path is Athena SQL over Glue-cataloged
curated tables: probe SELECTs in the orchestration
(/root/reference/stepfunctions/delta-lake.json:147-215) and
INSERT ... SELECT ... WHERE NOT EXISTS upserts (README.md:252-374).
These queries replay those shapes through the Spark-native equivalent
(lakehouse_architecture_spark.catalog): temp-view / saveAsTable
registration + ``spark.sql`` strings, planned by Catalyst like any
DataFrame query.

Each Spark query literally executes a SQL string — the oracle runs the
same ANSI text on DuckDB, so this family also proves dialect-portable
SQL generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_architecture_spark.catalog import save_as_table, sql
from lakehouse_architecture_spark.queries.registry import query
from lakehouse_architecture_spark.sources.tables import load_table

# Athena probe 1 (`SELECT * from clean_orders limit 5`), made
# deterministic: explicit total order + date rendering.
PROBE_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM orders
ORDER BY o_orderkey
LIMIT 5
"""


@query("sql_probe_orders", oracle=PROBE_SQL)
def sql_probe_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog probe: the reference's post-crawl Athena smoke query,
    via ``catalog.sql`` over registered views."""
    return sql(spark, PROBE_SQL, sf_dir=sf_dir)


# README.md:260-282's ACID INSERT guard, as the SELECT it feeds: staged
# orders that are NOT already present in the curated target (here the
# curated set is modeled as orders below a key watermark).
INSERT_GUARD_SQL = """
SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus,
       CAST(s.o_totalprice AS DOUBLE) AS o_totalprice
FROM orders s
WHERE NOT EXISTS (
  SELECT 1 FROM orders t
  WHERE t.o_orderkey = s.o_orderkey AND t.o_orderkey < 7500
)
ORDER BY s.o_orderkey
"""


@query("sql_insert_not_exists", oracle=INSERT_GUARD_SQL)
def sql_insert_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's INSERT ... WHERE NOT EXISTS dedup guard as a user
    SQL string; Catalyst rewrites the correlated NOT EXISTS into a
    left-anti join (no per-row subquery execution)."""
    return sql(spark, INSERT_GUARD_SQL, sf_dir=sf_dir)


REVENUE_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@query("sql_revenue_by_nation", oracle=REVENUE_SQL)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full analytic join+agg as user SQL over the registered views —
    nation/customer broadcast under AQE, decimal fixed-point sums for
    cross-engine float parity."""
    return sql(spark, REVENUE_SQL, sf_dir=sf_dir)


SEGMENT_STATS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("sql_catalog_roundtrip", oracle=SEGMENT_STATS_SQL)
def sql_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """saveAsTable round-trip: curate an aggregate, persist it as an
    external catalog table (parquet + catalog metadata), then answer
    from the TABLE via SQL — the reference's curated-zone contract
    (write to lake, query through the catalog).

    NOTE: deliberately eager — the write happens when the query is
    built, because the materialized table IS the thing under test. The
    table name and path carry an sf_dir tag so building this query for
    two scale factors (or re-running) never cross-reads."""
    import re

    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    table = f"curated_segment_stats_{tag}"
    curated = sql(spark, SEGMENT_STATS_SQL, sf_dir=sf_dir)
    save_as_table(
        curated,
        table,
        path=f"/tmp/lakehouse_catalog/segment_stats_{tag}",
    )
    return sql(
        spark,
        "SELECT c_mktsegment, n_customers, total_acctbal "
        f"FROM {table} ORDER BY c_mktsegment",
    )


# Recursive CTE (Spark 4.1 WITH RECURSIVE): generate the month spine
# of the order-date range by recursion, then profile coverage — the
# SQL-standard recursion form (sequence()/explode covers the same need
# natively, events_gapfilled_hourly). Engine dialects differ only in
# the month increment (Spark add_months + MAX RECURSION LEVEL clause,
# DuckDB interval arithmetic); everything else is shared ANSI.
_RCTE_BODY = """
months(m, hi) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT {next_month}, hi FROM months WHERE m < hi
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1
)
SELECT COUNT(*) AS n_months,
       COUNT(monthly.cnt) AS n_months_with_orders,
       COUNT(*) - COUNT(monthly.cnt) AS n_gap_months,
       CAST(SUM(COALESCE(monthly.cnt, 0)) AS BIGINT) AS total_orders
FROM months LEFT JOIN monthly ON months.m = monthly.m
"""

_RCTE_PRELUDE = """
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
  FROM orders
),
"""

RCTE_SPARK_SQL = _RCTE_PRELUDE + _RCTE_BODY.format(
    next_month="add_months(m, 1)"
)
RCTE_ORACLE_SQL = _RCTE_PRELUDE + _RCTE_BODY.format(
    next_month="CAST(m + INTERVAL 1 MONTH AS DATE)"
)


@query("sql_recursive_cte_calendar", oracle=RCTE_ORACLE_SQL)
def sql_recursive_cte_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard WITH RECURSIVE over the registered views: build the
    order-date month spine by recursion and profile its coverage
    (months with orders, gap months, total orders — integer-only
    compared surface). Recursion depth is the month-range length,
    bounded and independent of row volume; each step is a tiny
    relation, so the plan is driver-bounded iteration exactly like the
    engine's other fixpoint operators (components, PCA, BPE).

    r15 measured fix (the sweep's only unadjudicated >10 s row): the
    recursive step used to join ``months`` with ``bounds`` — and Spark
    INLINES non-recursive CTEs, so all ~80 recursion steps re-ran the
    min/max aggregate over orders (DuckDB materializes the CTE once,
    which is why the oracle never showed it). The bounds row is now
    carried as a COLUMN of the recursive relation (months(m, hi)), the
    standard carried-constant recursion shape, so orders is aggregated
    once in the anchor: interleaved same-session A/B at sf0.1 read
    16.35 -> 0.84 s minima (19x), rows identical."""
    return sql(spark, RCTE_SPARK_SQL, sf_dir=sf_dir)


# Bucketed co-located join: the pre-shuffled layout save_as_table's
# bucket_by documents. Both tables are bucketed (and sorted) on the
# join key with the same bucket count, so the custkey equi-join reads
# co-located buckets and Catalyst plans it WITHOUT an Exchange on
# either side (tests/test_plans.py asserts this against a non-bucketed
# control). At 100 TB this turns a recurring fact-dim-fact join from an
# every-query shuffle of the big table into a per-bucket local merge —
# the batch analogue of the reference's partitioned curated zone
# (/root/reference/src/glue_etl.py:300-320), one axis finer.
BUCKETED_JOIN_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

N_BUCKETS = 8


def bucketed_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Materialize orders + customer as catalog tables bucketed on the
    custkey join key (eager, sf-tagged like sql_catalog_roundtrip) and
    return the two table handles. repartition(n, key) before the write
    aligns tasks with buckets (same Murmur3 hash), so each bucket is a
    single file and the sortBy order survives for merge reads."""
    import re

    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    names = {}
    for tbl, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        name = f"bkt_{tbl}_{tag}"
        save_as_table(
            load_table(spark, sf_dir, tbl).repartition(N_BUCKETS, key),
            name,
            path=f"/tmp/lakehouse_catalog/bkt_{tbl}_{tag}",
            bucket_by=(N_BUCKETS, [key]),
        )
        names[tbl] = name
    return spark.table(names["orders"]), spark.table(names["customer"])


@query("sql_bucketed_colocated_join", oracle=BUCKETED_JOIN_ORACLE)
def sql_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue per market segment answered from the BUCKETED
    tables: under sort-merge the join is shuffle-free on BOTH sides
    (pre-hashed on custkey at write time; tests/test_plans.py asserts
    no Exchange), leaving the segment rollup as the plan's only
    shuffle. At demo scale the planner may instead broadcast the small
    dimension — equally shuffle-free for the fact side. Results are
    identical to the plain parquet join; the oracle computes exactly
    that."""
    from lakehouse_architecture_spark.functions.numeric import dsum

    orders, customer = bucketed_pair(spark, sf_dir)
    from pyspark.sql import functions as F

    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# Per-group top-N as a LATERAL correlated subquery — the SQL-surface
# twin of the window-function top-k family: the same text runs on
# Spark (DecorrelateInnerQuery plans the per-row LIMIT as a ranked
# join, not a per-customer re-scan) and on DuckDB.
LATERAL_TOP_ORDERS_SQL = """
WITH topc AS (
  SELECT o_custkey, CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY o_custkey
  ORDER BY spend_cents DESC, o_custkey LIMIT 10
)
SELECT c.o_custkey, c.spend_cents, t.o_orderkey, t.price_cents
FROM topc c,
LATERAL (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT)
           AS price_cents
  FROM orders WHERE o_custkey = c.o_custkey
  ORDER BY price_cents DESC, o_orderkey LIMIT 2
) t
ORDER BY c.spend_cents DESC, c.o_custkey, t.price_cents DESC, t.o_orderkey
"""


@query("sql_lateral_top_orders", oracle=LATERAL_TOP_ORDERS_SQL)
def sql_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with per-row ORDER BY + LIMIT: each
    of the ten biggest customers joined to its own top-2 orders — the
    ANSI lateral-join surface (Spark 3.2+ FROM-clause correlation;
    the optimizer decorrelates the per-customer LIMIT into a ranked
    window join rather than executing the subquery per outer row).
    Money compared as exact integer cents (ROUND(x*100) on 2-decimal
    prices), so every emitted value is an exact BIGINT."""
    return sql(spark, LATERAL_TOP_ORDERS_SQL, sf_dir=sf_dir)
