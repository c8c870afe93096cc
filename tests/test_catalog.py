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
    plan = got.queryExecution if False else sql(
        spark, "SELECT * FROM t_part WHERE seg = 'x'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "seg" in plan  # partition filter reached the scan
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
