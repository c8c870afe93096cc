"""SparkSession factory.

Mirrors the reference's production session configuration (AQE, partition
coalescing, skew-join handling, CBO — /root/reference/src/glue_etl.py:404-408)
and adds settings that matter for determinism and scale:

- ``spark.sql.session.timeZone=UTC`` so timestamp rendering matches the
  DuckDB oracle regardless of host timezone.
- Arrow execution for any pandas-UDF path.
- AQE advisory sizes tuned so local runs coalesce tiny shuffles while the
  same plan scales to a real cluster (AQE re-plans from runtime stats, so
  none of this hardcodes the local data size).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Scale-oriented defaults. On a 1000-executor cluster these are the knobs
# you'd override via spark-submit; the AQE settings are the ones doing the
# real work (runtime partition coalescing + skew splitting).
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.cbo.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    # 64 MB broadcast threshold: every dimension table in the star schema
    # (region/nation/customer/supplier/part at reasonable SF) broadcasts,
    # turning shuffling joins into broadcast-hash joins.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Dynamic partition overwrite is what makes the MERGE fallback touch
    # only the partitions present in the update set.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Local-mode heap sizing: in local[N] the ONE driver JVM hosts all
    # N executor threads, but Spark's default heap is 1 GiB — at
    # local[32] that is ~30 MB per task slot, and a single wide
    # sort-merge task (e.g. the uncapped fuzzy-d2 self-join at sf0.1)
    # dies in Java heap space. 8 GiB is still conservative for the
    # target box and is simply ignored on a real cluster, where
    # spark.executor.memory is set by the deployment (driver.memory
    # only takes effect at JVM launch — a session that getOrCreate()s
    # into an already-running JVM keeps that JVM's heap).
    "spark.driver.memory": "8g",
    # Runtime row-level bloom pruning: a selective filter on one join
    # side builds a bloom filter that prunes the other side's scan —
    # only fires past the creation-side size thresholds, i.e. exactly
    # the big-join case it exists for (no effect at test SF).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def get_spark(
    app_name: str = "lakehouse-architecture-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's configuration.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``);
    on a real cluster pass ``master=None`` after setting it externally.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
