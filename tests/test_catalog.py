"""Catalog/SQL surface: saveAsTable round-trip, partitioned external
tables, user SQL over registered views."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_spark.catalog import (
    register_source_tables,
    save_as_table,
    sql,
)


def test_save_as_table_roundtrip(spark, sf_dir, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, seg string, amt double",
    )
    save_as_table(df, "t_roundtrip", path=str(tmp_path / "t"))
    back = sql(spark, "SELECT * FROM t_roundtrip ORDER BY id")
    assert [r.id for r in back.collect()] == [1, 2, 3]
    assert "t_roundtrip" in [t.name for t in spark.catalog.listTables()]
    spark.sql("DROP TABLE t_roundtrip")


def test_save_as_table_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "x" if i % 2 else "y", float(i)) for i in range(20)],
        "id long, seg string, amt double",
    )
    save_as_table(
        df, "t_part", path=str(tmp_path / "p"), partition_by=["seg"]
    )
    # partition directories exist -> equality predicates prune at listing
    assert (tmp_path / "p" / "seg=x").exists()
    got = sql(spark, "SELECT count(*) AS n FROM t_part WHERE seg = 'x'")
    assert got.collect()[0].n == 10
    plan = (
        sql(spark, "SELECT * FROM t_part WHERE seg = 'x'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "seg" in plan
    spark.sql("DROP TABLE t_part")


def test_sql_over_registered_views(spark, sf_dir):
    register_source_tables(spark, sf_dir, "region", "nation")
    out = sql(
        spark,
        "SELECT r_name, count(*) AS n FROM nation "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name ORDER BY r_name",
    )
    rows = out.collect()
    assert len(rows) == 5 and sum(r.n for r in rows) == 25


def test_save_as_table_overwrite_idempotent(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    save_as_table(df, "t_idem", path=str(tmp_path / "i"))
    save_as_table(df.withColumn("s", F.lit("b")), "t_idem", path=str(tmp_path / "i"))
    rows = sql(spark, "SELECT * FROM t_idem").collect()
    assert len(rows) == 1 and rows[0].s == "b"
    spark.sql("DROP TABLE t_idem")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with no
    Exchange: the on-disk layout IS the shuffle, paid once at write."""
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(100)], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(100)], "k long, rv string"
    )
    save_as_table(left, "t_bleft", path=str(tmp_path / "bl"), bucket_by=(4, ["k"]))
    save_as_table(right, "t_bright", path=str(tmp_path / "br"), bucket_by=(4, ["k"]))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = sql(
            spark,
            "SELECT l.k, lv, rv FROM t_bleft l JOIN t_bright r ON l.k = r.k",
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE t_bleft")
        spark.sql("DROP TABLE t_bright")


def test_dynamic_partition_pruning_on_catalog_tables(spark, tmp_path):
    """A dim filter must prune the partitioned fact's scan at RUNTIME
    (dynamicpruningexpression in PartitionFilters) — at 100 TB this is
    the difference between scanning 10 partitions and all of them."""
    fact = spark.createDataFrame(
        [(i, i % 10, float(i)) for i in range(1000)],
        "id long, seg int, amt double",
    )
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(10)],
        "seg int, tag string",
    )
    save_as_table(fact, "t_dppf", path=str(tmp_path / "f"), partition_by=["seg"])
    save_as_table(dim, "t_dppd", path=str(tmp_path / "d"))
    try:
        j = sql(
            spark,
            "SELECT f.id FROM t_dppf f JOIN t_dppd d ON f.seg = d.seg "
            "WHERE d.tag = 'keep'",
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()
        assert j.count() == 200
    finally:
        spark.sql("DROP TABLE t_dppf")
        spark.sql("DROP TABLE t_dppd")
