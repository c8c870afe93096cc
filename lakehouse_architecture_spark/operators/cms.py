"""Count-min sketch: a mergeable frequency table in native expressions.

The 100 TB motivation mirrors the HLL rollup (queries/events.py): exact
per-key counts over a high-cardinality key shuffle one record PER
DISTINCT KEY; the count-min sketch shuffles at most ``depth * width``
cells PER MAP TASK regardless of cardinality, because the groupBy below
is keyed on (hash row, bucket) and partial aggregation collapses each
task's contribution to the fixed-size counter grid before it crosses
the wire. Per-day (or per-partition) sketches then merge by plain cell
summation — associative and EXACT, so any date-range frequency estimate
is a sketch merge, never a rescan of raw events.

Estimate semantics (Cormode & Muthukrishnan): ``est(k) = min_d
counter[d][hash_d(k) % width]``. Always ``est >= true`` (every
occurrence of k lands in all d counted cells); ``est <= true + e/width
* N`` with probability ``1 - exp(-depth)`` per key. Both properties are
surfaced as QA booleans by events_cms_topk_accuracy (queries/events.py)
and pinned by tests/test_operators.py on hand-built frames.

Reference anchor: generalizes the reference's exact groupBy counting
analytics (/root/reference/src/glue_etl.py process_dataset metrics) to
the sketch regime its Glue-scale data would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_counters", "cms_estimate"]


def _bucket(width: int):
    return F.pmod(F.xxhash64("__cms_key", "__cms_d"), F.lit(width))


def _exploded(df: DataFrame, key_col: str, depth: int, group_cols):
    """One row per (input row, hash index 0..depth-1); null keys are
    excluded — a null has no frequency and xxhash64(NULL) would
    propagate null buckets."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1: {depth}")
    d = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("__cms_d")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, F.col(key_col).alias("__cms_key"))
        .select(*group_cols, "__cms_key", d)
    )


def cms_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group_cols..., __cms_d, __cms_bucket, cnt): the populated cells
    of one count-min sketch per ``group_cols`` combination (a single
    global sketch when empty). Cells a group never touches are simply
    absent — readers treat missing as 0, which keeps the relation at
    most ``depth * width`` rows per group without densification.

    Merging sketches across groups is ``groupBy(__cms_d, __cms_bucket)
    .sum(cnt)`` — exact, associative, the property the rollup QA pins.
    """
    if width < 1:
        raise ValueError(f"width must be >= 1: {width}")
    rows = _exploded(df, key_col, depth, group_cols)
    return rows.groupBy(
        *group_cols, "__cms_d", _bucket(width).alias("__cms_bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """``keys`` + an ``est_cnt`` column: the count-min estimate of each
    key's frequency under a GLOBAL sketch relation produced by
    ``cms_counters`` (no group_cols). The probe side is expected to be
    small (top-k candidates, an audit list) and is broadcast into the
    counter join; keys absent from the sketch estimate 0."""
    probes = _exploded(keys, key_col, depth, [key_col]).withColumn(
        "__cms_bucket", _bucket(width)
    )
    joined = F.broadcast(probes).join(
        counters, ["__cms_d", "__cms_bucket"], "left"
    )
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt")
    )


def load_cms_counters(spark, path: str) -> DataFrame:
    """Re-aggregate a PERSISTED sketch directory into current counters.

    The streaming ingest (streaming/jobs.stream_cms_ingest) appends each
    micro-batch's cells as PARTIAL counts — correct because sketch merge
    is plain cell summation — so reading the sketch is a groupBy-sum
    over at most (batches x depth x width) tiny rows. Offline
    compaction, when wanted, is just writing this result back out."""
    return (
        spark.read.parquet(path)
        .groupBy("__cms_d", "__cms_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
