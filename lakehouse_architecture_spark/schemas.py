"""Canonical declared schemas.

ONE definition (the reference declares these twice, identically, at
/root/reference/src/glue_etl.py:33-59 and src/etl_utils.py:33-57 — a
defect SURVEY.md §1.5 flags; here there is a single source of truth).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ORDER_ITEMS_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("order_id", IntegerType(), False),
        StructField("user_id", IntegerType(), False),
        StructField("days_since_prior_order", IntegerType(), True),
        StructField("product_id", IntegerType(), False),
        StructField("add_to_cart_order", IntegerType(), True),
        StructField("reordered", IntegerType(), True),
        StructField("order_timestamp", TimestampType(), False),
        StructField("date", DateType(), False),
    ]
)

ORDERS_SCHEMA = StructType(
    [
        StructField("order_num", IntegerType(), True),
        StructField("order_id", IntegerType(), False),
        StructField("user_id", IntegerType(), False),
        StructField("order_timestamp", TimestampType(), False),
        StructField("total_amount", DoubleType(), True),
        StructField("date", DateType(), False),
    ]
)

PRODUCTS_SCHEMA = StructType(
    [
        StructField("product_id", IntegerType(), False),
        StructField("department_id", IntegerType(), True),
        StructField("department", StringType(), True),
        StructField("product_name", StringType(), False),
    ]
)

# PK / partition-column choices (/root/reference/src/glue_etl.py:302,321-330)
PRIMARY_KEYS = {
    "products": "product_id",
    "orders": "order_id",
    "order_items": "id",
}

PARTITION_COLUMNS = {
    "products": "department",
    "orders": "date",
    "order_items": "date",
}

SCHEMAS = {
    "products": PRODUCTS_SCHEMA,
    "orders": ORDERS_SCHEMA,
    "order_items": ORDER_ITEMS_SCHEMA,
}
