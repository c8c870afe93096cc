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
