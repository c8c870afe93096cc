"""Scan-parallelism helpers.

A parquet relation with fewer splittable units than the cluster has
cores runs every narrow transformation downstream of the scan on a
handful of tasks — for CPU-heavy expression work (regex normalization,
per-shingle md5 families) that serializes the hot loop on one core. At
production scale a table has many files and this never fires; the
heuristic uses file count as the cheap proxy (``df.inputFiles()`` is a
metadata call, while ``df.rdd.getNumPartitions()`` costs a full plan
translation, measured ~1.5 s per call on Spark 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the default parallelism when it
    is backed by fewer files than the cluster has cores; pass-through
    otherwise (a real multi-file table is already spread).

    Use BEFORE expression-heavy narrow work whose cost dwarfs one extra
    shuffle of the input rows. For aggregations the call is about the
    PARTIAL phase: a cheap agg (count/sum per group) gains nothing —
    the exchange just duplicates the agg's own shuffle — but an
    expression-heavy partial (e.g. TPC-H Q1's ten decimal aggregates
    per row) is the hot loop, and spreading it off a <=3-task scan
    bought ~30% of that query's wall at sf0.1.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        few_files = len(df.inputFiles()) < par
    except Exception:  # non-file-backed relation (e.g. createDataFrame)
        few_files = True
    return df.repartition(par) if few_files else df
