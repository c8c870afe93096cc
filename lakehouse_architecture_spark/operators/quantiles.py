"""Exact per-group percentiles that survive low-cardinality group keys.

The naive plan — ``row_number() OVER (PARTITION BY group ORDER BY
value)`` on raw rows — sorts one group's ENTIRE row set in a single
task; with a handful of groups over 100 TB that is 1/|groups| of the
corpus through one sorter (the r5 plan-audit finding on the original
p95 query). This operator is the scale-safe equivalent: collapse to
(group, value) frequency counts first (a partial-aggregated shuffle,
the same cost class as any groupBy), then rank only the DISTINCT-value
relation, whose window partitions are bounded by distinct values per
group, not rows.

The selected member — the first value whose cumulative count reaches
``ceil(p · n)`` — is the discrete percentile (no interpolation, so
engines cannot disagree on convention, and the emitted value is a raw
member, never derived math; the float-parity rule).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[int],
) -> DataFrame:
    """(group_cols..., pct, n_rows, pct_value): the exact discrete
    percentile member of ``value_col`` per group, for each integer
    percent in ``percentiles``. All percentiles share ONE counts
    relation and one window pass — the percentile list broadcasts as a
    tiny crossJoined relation, so asking for p25/p50/p75/p95 costs the
    same shuffles as asking for one."""
    if not percentiles:
        raise ValueError("percentiles must be non-empty")
    if not all(1 <= p <= 100 for p in percentiles):
        raise ValueError(f"percentiles must be in [1, 100]: {percentiles}")
    gcols = list(group_cols)
    counts = df.groupBy(*gcols, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy(*gcols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*gcols)
    ranked = counts.select(
        *gcols,
        value_col,
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    pcts = df.sparkSession.createDataFrame(
        [(int(p),) for p in sorted(set(percentiles))], "pct int"
    )
    target = F.ceil(F.col("pct") * F.col("n") / 100.0).cast("long")
    return (
        ranked.crossJoin(F.broadcast(pcts))
        .filter((F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target))
        .select(
            *gcols,
            "pct",
            F.col("n").alias("n_rows"),
            F.col(value_col).alias("pct_value"),
        )
    )


def global_desc_rank_cumsum(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_buckets: int = 1000,
) -> DataFrame:
    """``(…original columns, cum, rnk)`` exactly as if

        SUM(value) OVER (ORDER BY value DESC, tiebreak ROWS UNBOUNDED
        PRECEDING)  /  ROW_NUMBER() OVER (same order)

    but WITHOUT the global single-task window: the classic two-phase
    prefix sum. Rows bucket into ``n_buckets`` coarse value bands (one
    1-row bounds aggregate, broadcast back), a window over the
    bucket-count relation takes running totals ABOVE each bucket, and
    rank/cumsum windows partition BY bucket — so no window input
    exceeds one bucket's rows, yet floor-bucketing's monotonicity makes
    the result equal the naive global window row for row.

    Works for any numeric sign (buckets come from the (min, max) span);
    a zero span collapses to one bucket, where the per-bucket window IS
    the global one — correct, and only as expensive as the degenerate
    data forces.

    Exactness: for integral/decimal value columns the result is
    bit-identical to the global window (addition is associative). A
    raw-double value column would see the usual order-of-addition
    drift — cast through decimal first, like every compared aggregate
    in this engine."""
    bounds = df.agg(
        F.min(value_col).alias("__mn"), F.max(value_col).alias("__mx")
    )
    span = F.col("__mx") - F.col("__mn")
    bucket = F.when(span > 0,
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(value_col) - F.col("__mn")) * n_buckets / span
            ).cast("long"),
        ),
    ).otherwise(F.lit(0))
    b = df.crossJoin(F.broadcast(bounds)).withColumn("__bucket", bucket)
    bs = b.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__cnt"), F.sum(value_col).alias("__bsum")
    )
    above = Window.orderBy(F.desc("__bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bs2 = bs.select(
        "__bucket",
        F.coalesce(F.sum("__bsum").over(above), F.lit(0)).alias("__cum_above"),
        F.coalesce(F.sum("__cnt").over(above), F.lit(0)).alias("__cnt_above"),
    )
    win = Window.partitionBy("__bucket").orderBy(
        F.desc(value_col), F.asc(tiebreak_col)
    )
    out = b.join(F.broadcast(bs2), "__bucket").select(
        *df.columns,
        (
            F.col("__cum_above")
            + F.sum(value_col).over(
                win.rowsBetween(Window.unboundedPreceding, 0)
            )
        ).alias("cum"),
        (F.col("__cnt_above") + F.row_number().over(win)).alias("rnk"),
    )
    return out
