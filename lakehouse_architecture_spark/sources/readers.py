"""Typed file sources.

The reference reads raw CSV with ``inferSchema`` then casts column-by-column
(/root/reference/src/glue_etl.py:453-454, 233-242). Schema inference means a
full extra pass over the data — at 100 TB that is an unacceptable double
scan — so this engine reads against the declared schema directly in
PERMISSIVE mode and captures unparseable rows in ``_corrupt_record``
instead of silently nulling them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read CSV against a declared schema; malformed rows land in
    ``_corrupt_record`` rather than being dropped or nulled silently.

    ``path`` may be a glob (``dir/*.csv``) — Spark's multi-file scan is the
    UNION ALL of the daily files the reference relies on
    (/root/reference/src/glue_etl.py:474-475).
    """
    read_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    reader = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(read_schema)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.load(path)


def read_csv_inferred(
    spark: SparkSession,
    path: str,
    header: bool = True,
    timestamp_format: str | None = None,
    sampling_ratio: float = 1.0,
) -> DataFrame:
    """Opt-in schema-INFERENCE read — the reference's exploratory ingest
    mode (/root/reference/src/glue_etl.py:453-454) as an explicit escape
    hatch, NOT the default: inference costs a full extra pass over the
    data, so production ingest declares its schema and goes through
    :func:`read_csv_typed` (PERMISSIVE + ``_corrupt_record``).

    Use this only for schema-unknown exploration, then freeze what it
    infers into a declared ``StructType`` (``df.schema``) and switch to
    the typed reader. ``sampling_ratio`` bounds the inference pass on
    big inputs (Spark samples that fraction of rows to type columns);
    the data pass still reads everything.
    """
    reader = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("inferSchema", "true")
        .option("samplingRatio", str(sampling_ratio))
        .option("mode", "PERMISSIVE")
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(parsed, corrupt) split; both sides keep the source columns.

    The frame is cached first: Spark disallows plans that touch only the
    internal corrupt-record column of a raw CSV scan, and the split fans
    out to two consumers anyway.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    # localCheckpoint, not cache/one-slot: (a) it truncates lineage, so
    # the corrupt side no longer references a raw file scan and Spark's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction can never resurface
    # (a one-slot persist here broke exactly that way — an evicted
    # slot's held corrupt frame recomputed from the raw scan and threw
    # at action time); (b) the checkpoint blocks are released when the
    # DataFrame is garbage-collected, so repeated splits self-bound
    # without a slot. lazy=first-action; the pipeline acts per table.
    # At 100 TB the split runs per ingest batch (a day's files), never
    # corpus-wide — the materialization is batch-sized by construction.
    # DURABILITY CAVEAT (cluster deployments): localCheckpoint blocks
    # live UNREPLICATED in executor storage and the truncated lineage
    # cannot recompute them, so losing an executor mid-job fails the
    # job outright — a failure mode plain cache() recovered from.
    # Acceptable here (single-JVM local mode; batch-sized, re-runnable
    # ingest step), but a multi-executor deployment that cannot afford
    # an ingest-batch retry should use a reliable checkpoint
    # (sc.setCheckpointDir + .checkpoint()) or write the split out.
    # Release timing is also GC-driven, not an explicit unpersist.
    df = df.localCheckpoint(eager=False)
    parsed = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull())
    return parsed, corrupt


def read_json_typed(
    spark: SparkSession,
    path: str,
    schema: StructType,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read JSON-lines against a declared schema, PERMISSIVE with
    ``_corrupt_record`` — same contract as :func:`read_csv_typed` (no
    inference double scan; bad lines preserved, not nulled). Globs give
    the same multi-file UNION semantics."""
    read_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    reader = (
        spark.read.format("json")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(read_schema)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.load(path)


def read_xml_typed(
    spark: SparkSession,
    path: str,
    schema: StructType,
    row_tag: str = "row",
) -> DataFrame:
    """Read XML (native Spark 4 source) against a declared schema,
    PERMISSIVE with ``_corrupt_record`` — the same no-inference,
    bad-rows-preserved contract as :func:`read_csv_typed`. ``row_tag``
    names the repeated element that maps to one row. Avro remains
    env-blocked here (spark-avro is an external module and this build
    has no JAR network); on a cluster it is one ``--packages`` flag
    with the identical read pattern."""
    read_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(read_schema)
        .load(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (both are Spark built-ins; predicate pushdown via ORC SearchArgument)."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Raw media ingestion via Spark's built-in ``binaryFile`` source:
    one row per file with (path, modificationTime, length, content) —
    the ingestion front end of the multimodal pipeline
    (operators/multimodal.py), mirroring the reference's raw-zone
    object pickup (/root/reference/stepfunctions/lambda_function.py:37-108)
    as a dataflow source instead of an out-of-engine mover.

    Scale notes: the source parallelizes per FILE (content is not
    splittable), so ingest throughput scales with file count;
    ``spark.sql.files.maxPartitionBytes`` groups small files per task.
    Filter on ``length`` or path glob BEFORE touching ``content`` —
    the reader prunes file contents for metadata-only plans.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def media_table_from_binary_files(
    spark: SparkSession, path: str, kind: str, fmt: str
) -> DataFrame:
    """Lift a binaryFile scan into the MEDIA_SCHEMA contract: stable
    64-bit id from the file path, payload as the opaque binary column,
    typed metadata left null for the decode stage to fill."""
    from pyspark.sql import functions as F

    raw = read_binary_files(spark, path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(fmt).alias("format"),
        F.col("content").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
