"""End-to-end pipeline tests: CSV -> cast -> validate -> dedup -> curated
parquet, MERGE idempotency (the reference's core contract,
/root/reference/src/glue_etl.py:332-373), and the Parquet MERGE fallback's
update semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakehouse_architecture_spark.plans.pipeline import (
    cast_to_schema,
    run_pipeline,
)
from lakehouse_architecture_spark.schemas import ORDERS_SCHEMA
from lakehouse_architecture_spark.sinks.writers import merge_upsert

PRODUCTS_CSV = "product_id,department_id,department,product_name\n"
ORDERS_CSV = "order_num,order_id,user_id,order_timestamp,total_amount,date\n"
ITEMS_CSV = (
    "id,order_id,user_id,days_since_prior_order,product_id,"
    "add_to_cart_order,reordered,order_timestamp,date\n"
)


def _write(tmp, name, header, rows):
    d = tmp / name
    d.mkdir(exist_ok=True)
    (d / "part.csv").write_text(header + "\n".join(rows) + "\n")
    return str(d / "*.csv")


def _raw_paths(tmp):
    return {
        "products": _write(
            tmp, "products", PRODUCTS_CSV,
            ["1,4,Books,P1", "2,5,Toys,P2", ",6,Home,Broken"],
        ),
        "orders": _write(
            tmp, "orders", ORDERS_CSV,
            [
                "90,501,1990,2025-04-01T11:27:00,229.53,2025-04-01",
                "91,502,1991,2025-04-01T12:00:00,100.00,2025-04-01",
                "92,503,1992,2025-04-02T09:00:00,-5.00,2025-04-02",  # invalid
                "93,502,1991,2025-04-01T12:00:00,100.00,2025-04-01",  # dup PK
            ],
        ),
        "order_items": _write(
            tmp, "order_items", ITEMS_CSV,
            [
                "1,501,1990,10,1,1,0,2025-04-01T11:27:00,2025-04-01",
                "2,501,1990,10,2,2,0,2025-04-01T11:27:00,2025-04-01",
                "3,999,1990,10,1,1,0,2025-04-01T11:27:00,2025-04-01",  # bad FK order
                "4,502,1991,,999,1,0,2025-04-01T12:00:00,2025-04-01",  # bad FK product
            ],
        ),
    }


def test_cast_to_schema_nulls_uncastable(spark):
    raw = spark.createDataFrame(
        [("x", "501", "1990", "not-a-ts", "1.5", "2025-04-01")],
        "order_num string, order_id string, user_id string,"
        " order_timestamp string, total_amount string, date string",
    )
    typed = cast_to_schema(raw, ORDERS_SCHEMA)
    row = typed.collect()[0]
    assert row.order_num is None          # uncastable -> null
    assert row.order_id == 501
    assert row.order_timestamp is None    # unparseable timestamp -> null
    assert str(row.date) == "2025-04-01"
    assert [f.name for f in typed.schema.fields] == [
        f.name for f in ORDERS_SCHEMA.fields
    ]


def test_run_pipeline_end_to_end_and_idempotent(spark, tmp_path):
    raw = _raw_paths(tmp_path)
    curated = str(tmp_path / "curated")
    rejected = str(tmp_path / "rejected")

    results = run_pipeline(spark, raw, curated, rejected)

    assert results["products"].stats["clean_rows"] == 2
    assert results["products"].stats["rejected_rows"] == 1
    # 3 valid orders, 1 dup PK collapsed -> 2 clean; 1 invalid
    assert results["orders"].stats["clean_rows"] == 2
    assert results["orders"].stats["rejected_rows"] == 1
    # items: 2 clean, 2 FK-dangling
    assert results["order_items"].stats["clean_rows"] == 2
    assert results["order_items"].stats["rejected_rows"] == 2

    errs = {
        r.validation_errors
        for r in spark.read.parquet(os.path.join(rejected, "order_items")).collect()
    }
    assert errs == {
        "Invalid order_id reference",
        "Invalid product_id reference",
    }

    # partition layout on disk (date=... directories)
    parts = os.listdir(os.path.join(curated, "orders"))
    assert any(p.startswith("date=") for p in parts)

    # re-run same inputs: MERGE keeps counts stable (idempotency)
    results2 = run_pipeline(spark, raw, curated, rejected)
    assert results2["orders"].stats["clean_rows"] == 2
    assert results2["products"].stats["clean_rows"] == 2
    assert results2["order_items"].stats["clean_rows"] == 2


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")],
        "k int, v string, part string",
    )
    merge_upsert(spark, base, path, ["k"], partition_by="part")

    updates = spark.createDataFrame(
        [(2, "B", "p1"), (4, "d", "p3")], "k int, v string, part string"
    )
    merge_upsert(spark, updates, path, ["k"], partition_by="part")

    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}

    # untouched partition p2 was not rewritten: still present
    assert spark.read.parquet(path).filter(F.col("part") == "p2").count() == 1


def test_merge_upsert_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "t2")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    merge_upsert(spark, base, path, ["k"])
    merge_upsert(
        spark, spark.createDataFrame([(2, "B")], "k int, v string"), path, ["k"]
    )
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "a", 2: "B"}
