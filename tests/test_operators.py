"""Operator unit tests: deterministic dedup, exact content dedup, vector
functions, typed CSV reading with corrupt-record capture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.vectors import cosine, dot, l2_norm
from lakehouse_architecture_spark.operators.dedup import (
    dedupe_by_key,
    exact_dedupe,
    normalize_text,
)
from lakehouse_architecture_spark.schemas import ORDERS_SCHEMA
from lakehouse_architecture_spark.sources.readers import (
    read_csv_typed,
    split_corrupt,
)


def test_dedupe_by_key_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "z"), (1, "a"), (2, "m")], "k int, v string"
    )
    out = dedupe_by_key(df, ["k"], [F.asc("v")]).collect()
    assert {(r.k, r.v) for r in out} == {(1, "a"), (2, "m")}
    # default ordering (non-key columns asc) is also deterministic
    out2 = dedupe_by_key(df, ["k"]).collect()
    assert {(r.k, r.v) for r in out2} == {(1, "a"), (2, "m")}


def test_exact_dedupe_normalized_content(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),   # same after normalization
            (3, "different doc"),
        ],
        "doc_id long, text string",
    )
    out = exact_dedupe(df, "text", "doc_id")
    assert {r.doc_id for r in out.collect()} == {1, 3}  # min id survives


def test_normalize_text(spark):
    df = spark.createDataFrame([("  A-b c!! d  ",)], "t string")
    assert df.select(normalize_text(F.col("t")).alias("n")).collect()[0].n == (
        "a b c d"
    )


def test_vector_functions(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [1.0, 0.0, 0.0])],
        "a array<float>, b array<float>",
    )
    row = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("n"),
        cosine("a", "b").alias("c"),
    ).collect()[0]
    assert row.d == 1.0
    assert row.n == 3.0
    assert row.c == pytest.approx(1.0 / 3.0)


def test_read_csv_typed_corrupt_capture(spark, tmp_path):
    p = tmp_path / "orders.csv"
    p.write_text(
        "order_num,order_id,user_id,order_timestamp,total_amount,date\n"
        "90,501,1990,2025-04-01T11:27:00,229.53,2025-04-01\n"
        "not,an,int,row,xx,yy\n"
    )
    df = read_csv_typed(spark, str(p), ORDERS_SCHEMA)
    parsed, corrupt = split_corrupt(df)
    assert parsed.count() == 1
    assert corrupt.count() == 1
    assert corrupt.collect()[0]._corrupt_record.startswith("not,an,int")
