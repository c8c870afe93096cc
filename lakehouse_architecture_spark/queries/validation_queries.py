"""The validation engine exercised as oracle-checkable queries over the
driver's star schema (FIXTURES.md maps orders->orders, order_items->
lineitem). The rule thresholds are chosen so each rule actually fires on
the synthetic data — an all-pass validation query would prove nothing.

Error-message ordering contract (must match the oracle CONCAT_WS order):
nullability rules in schema order, then domain rules, then FK rules —
/root/reference/src/etl_utils.py:113-169.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.validation import (
    ForeignKeyRule,
    NotNullRule,
    PositiveRule,
    RangeRule,
    rejection_summary,
    validate,
)
from lakehouse_architecture_spark.queries.registry import query
from lakehouse_architecture_spark.sources.tables import load_table

_ORDERS_RULES = [
    NotNullRule("o_orderkey"),
    NotNullRule("o_custkey"),
    NotNullRule("o_orderdate"),
    PositiveRule("o_totalprice"),
    RangeRule("o_totalprice", hi=450000.0),
]

_ORDERS_CHECK_SQL = """
SELECT o_orderkey,
  NULLIF(CONCAT_WS('; ',
    CASE WHEN o_orderkey IS NULL THEN 'Null o_orderkey' END,
    CASE WHEN o_custkey IS NULL THEN 'Null o_custkey' END,
    CASE WHEN o_orderdate IS NULL THEN 'Null o_orderdate' END,
    CASE WHEN o_totalprice IS NOT NULL AND o_totalprice <= 0 THEN 'Non-positive o_totalprice' END,
    CASE WHEN o_totalprice IS NOT NULL AND o_totalprice > 450000 THEN 'Out-of-range o_totalprice' END
  ), '') AS validation_errors
FROM orders
"""


def _validated_orders(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    return validate(orders, _ORDERS_RULES)


@query(
    "validate_orders_invalid",
    oracle=f"""
WITH checked AS ({_ORDERS_CHECK_SQL})
SELECT o_orderkey, validation_errors FROM checked
WHERE validation_errors IS NOT NULL
""",
)
def validate_orders_invalid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-compiler output: the rejected rows with their '; '-joined
    error strings (SURVEY §2.10-1)."""
    _, invalid = _validated_orders(spark, sf_dir)
    return invalid.select("o_orderkey", "validation_errors")


@query(
    "validate_orders_split_stats",
    oracle=f"""
WITH checked AS ({_ORDERS_CHECK_SQL})
SELECT
  COUNT(*) FILTER (WHERE validation_errors IS NULL) AS n_valid,
  COUNT(*) FILTER (WHERE validation_errors IS NOT NULL) AS n_invalid,
  CAST(COUNT(*) FILTER (WHERE validation_errors IS NULL) AS DOUBLE) * 100.0
    / COUNT(*) AS valid_pct
FROM checked
""",
)
def validate_orders_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid/invalid split ratio (reference A6 metric,
    /root/reference/src/etl_utils.py:189-194) computed in-plan, not on the
    driver."""
    valid, invalid = _validated_orders(spark, sf_dir)
    return (
        valid.select(F.lit(1).alias("is_valid"))
        .unionByName(invalid.select(F.lit(0).alias("is_valid")))
        .agg(
            F.sum("is_valid").cast("long").alias("n_valid"),
            F.sum(1 - F.col("is_valid")).cast("long").alias("n_invalid"),
            (
                F.sum("is_valid").cast("double") * 100.0 / F.count(F.lit(1))
            ).alias("valid_pct"),
        )
    )


@query(
    "validate_orders_rejection_summary",
    oracle=f"""
WITH checked AS ({_ORDERS_CHECK_SQL})
SELECT validation_errors, COUNT(*) AS count
FROM checked WHERE validation_errors IS NOT NULL
GROUP BY validation_errors
ORDER BY count DESC, validation_errors
LIMIT 5
""",
)
def validate_orders_rejection_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 error-type histogram
    (/root/reference/src/glue_etl.py:282-289)."""
    _, invalid = _validated_orders(spark, sf_dir)
    return rejection_summary(invalid, top_k=5)


_LINEITEM_CHECK_SQL = """
WITH ref AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderstatus <> 'P'),
checked AS (
  SELECT l.l_orderkey, l.l_linenumber,
    NULLIF(CONCAT_WS('; ',
      CASE WHEN l.l_orderkey IS NULL THEN 'Null l_orderkey' END,
      CASE WHEN l.l_quantity IS NOT NULL AND l.l_quantity <= 0 THEN 'Non-positive l_quantity' END,
      CASE WHEN l.l_discount IS NOT NULL AND l.l_discount > 0.08 THEN 'Out-of-range l_discount' END,
      CASE WHEN l.l_orderkey IS NOT NULL AND r.o_orderkey IS NULL THEN 'Invalid l_orderkey reference' END
    ), '') AS validation_errors
  FROM lineitem l LEFT JOIN ref r ON l.l_orderkey = r.o_orderkey
)
"""


@query(
    "validate_lineitem_fk_invalid",
    oracle=f"""
{_LINEITEM_CHECK_SQL}
SELECT l_orderkey, l_linenumber, validation_errors FROM checked
WHERE validation_errors IS NOT NULL
""",
)
def validate_lineitem_fk_invalid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar rules + FK anti-join semantics in one pass (reference
    J1/J2, /root/reference/src/etl_utils.py:124-159). The reference dim is
    restricted (status <> 'P') so dangling keys actually exist."""
    li = load_table(spark, sf_dir, "lineitem")
    ref = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    rules = [
        NotNullRule("l_orderkey"),
        PositiveRule("l_quantity"),
        RangeRule("l_discount", hi=0.08),
    ]
    fks = [ForeignKeyRule("l_orderkey", ref, "o_orderkey")]
    _, invalid = validate(li, rules, fks)
    return invalid.select("l_orderkey", "l_linenumber", "validation_errors")


@query(
    "validate_lineitem_fk_summary",
    oracle=f"""
{_LINEITEM_CHECK_SQL}
SELECT validation_errors, COUNT(*) AS count
FROM checked WHERE validation_errors IS NOT NULL
GROUP BY validation_errors
ORDER BY count DESC, validation_errors
""",
)
def validate_lineitem_fk_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ref = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    rules = [
        NotNullRule("l_orderkey"),
        PositiveRule("l_quantity"),
        RangeRule("l_discount", hi=0.08),
    ]
    fks = [ForeignKeyRule("l_orderkey", ref, "o_orderkey")]
    _, invalid = validate(li, rules, fks)
    return (
        invalid.groupBy("validation_errors")
        .count()
        .orderBy(F.desc("count"), F.asc("validation_errors"))
    )


@query(
    "ri_dangling_lineitems",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_dangling,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F'
)
GROUP BY l_returnflag
""",
)
def ri_dangling_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure left-anti RI probe (reference J1) aggregated to a violation
    histogram."""
    li = load_table(spark, sf_dir, "lineitem")
    ref = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    return (
        li.join(ref, li.l_orderkey == ref.o_orderkey, "left_anti")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_dangling"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "orders_expectation_report",
    oracle="""
WITH m AS (
  SELECT COUNT(*) AS n,
         COUNT(o_custkey) AS s_notnull,
         COUNT(DISTINCT o_orderkey) AS s_unique,
         CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS s_inset,
         CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                        AND o_totalprice >= 500.0
                        AND o_totalprice <= 600000.0 THEN 1 ELSE 0 END) AS BIGINT) AS s_between
  FROM orders
)
SELECT 'not_null(o_custkey)' AS expectation, n AS n_rows,
       s_notnull AS n_satisfied, CAST(1.0 AS DOUBLE) AS min_ratio,
       s_notnull >= CAST(CEIL(1.0 * n) AS BIGINT) AS passed FROM m
UNION ALL
SELECT 'unique(o_orderkey)', n, s_unique, CAST(1.0 AS DOUBLE),
       s_unique >= CAST(CEIL(1.0 * n) AS BIGINT) FROM m
UNION ALL
SELECT 'in_set(o_orderstatus)', n, s_inset, CAST(1.0 AS DOUBLE),
       s_inset >= CAST(CEIL(1.0 * n) AS BIGINT) FROM m
UNION ALL
SELECT 'between(o_totalprice,500.0,600000.0)', n, s_between, CAST(0.95 AS DOUBLE),
       s_between >= CAST(CEIL(0.95 * n) AS BIGINT) FROM m
""",
)
def orders_expectation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over the orders table
    (operators/expectations.py): non-null custkey, unique orderkey,
    status within its enum, and 95% of totals inside the plausible
    band — the Great-Expectations checkpoint the reference's
    validation pipeline implies, generalized to TABLE-level contracts.
    ALL expectations fold into ONE aggregate (a 100 TB audit is one
    scan regardless of how many contracts are attached); the report is
    exact integers plus an integer-safe pass verdict
    (n_satisfied >= ceil(min_ratio * n)), every row replicated by the
    oracle."""
    from lakehouse_architecture_spark.operators.expectations import (
        ExpectBetween,
        ExpectInSet,
        ExpectNotNull,
        ExpectUnique,
        evaluate_expectations,
    )

    orders = load_table(spark, sf_dir, "orders")
    return evaluate_expectations(
        orders,
        [
            ExpectNotNull("o_custkey"),
            ExpectUnique("o_orderkey"),
            ExpectInSet("o_orderstatus", allowed=("O", "F", "P")),
            ExpectBetween(
                "o_totalprice", min_ratio=0.95, lo=500.0, hi=600000.0
            ),
        ],
    )
