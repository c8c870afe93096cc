"""Catalog + SQL-string surface.

The reference exposes curated tables through a Glue catalog and lets
users run plain SQL against them from Athena
(/root/reference/stepfunctions/delta-lake.json:147-215 runs
``SELECT * FROM clean_orders LIMIT 5`` probes; README.md:252-374 runs
``INSERT INTO ... SELECT ... WHERE NOT EXISTS`` upserts as SQL). The
Spark-native equivalent is the session catalog: curated outputs are
registered with ``saveAsTable`` (or as views over in-flight DataFrames)
and user SQL goes through ``spark.sql`` so Catalyst plans it like any
DataFrame query — same pushdown, pruning, AQE.

At cluster scale the session catalog is backed by a Hive metastore or
Unity-style external catalog; nothing in this API changes — only
``spark.sql.catalogImplementation`` / warehouse conf does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from lakehouse_architecture_spark.sources.tables import register_views


def save_as_table(
    df: DataFrame,
    name: str,
    path: str | None = None,
    partition_by: Sequence[str] | None = None,
    bucket_by: tuple[int, Sequence[str]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a curated DataFrame as a catalog table.

    With ``path`` the table is external (parquet files at that location,
    metadata in the catalog); without, it lands in the session warehouse.
    Partition columns become directory partitions, so later reads with
    equality/range predicates on them prune at the file-listing level —
    the same layout contract as the reference's curated zone
    (/root/reference/src/glue_etl.py:300-320 partitioned Delta writes).

    ``bucket_by=(n, cols)`` hash-buckets (and sorts) the files on the
    join key: two tables bucketed the same way join WITHOUT a shuffle —
    the pre-shuffled layout that turns a recurring 100 TB fact-fact join
    from an every-query exchange into a local merge per bucket.
    """
    writer = df.write.format("parquet").mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def register_source_tables(
    spark: SparkSession, sf_dir: str, *names: str
) -> None:
    """Register the raw source tables as temp views for SQL access."""
    register_views(spark, sf_dir, *names)


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run a user SQL string against the registered tables.

    The reference's Athena entry point, Spark-native: if ``sf_dir`` is
    given, the source tables are (re)registered first so the statement
    can name them directly. Returns a lazy DataFrame — callers compose
    it like any other relation.
    """
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)
