"""Exact per-group percentiles that survive low-cardinality group keys.

The naive plan — ``row_number() OVER (PARTITION BY group ORDER BY
value)`` on raw rows — sorts one group's ENTIRE row set in a single
task; with a handful of groups over 100 TB that is 1/|groups| of the
corpus through one sorter (the r5 plan-audit finding on the original
p95 query). This operator is the scale-safe equivalent: collapse to
(group, value) frequency counts first (a partial-aggregated shuffle,
the same cost class as any groupBy), coarse-bucket values per group,
and run the running-count windows partitioned by (group, bucket) —
bounded by distinct values PER BUCKET, which holds even for
near-unique value columns (prices, durations) where a distinct-value
window alone would re-create the trap one level down.

The selected member — the first value whose cumulative count reaches
``ceil(p · n)`` — is the discrete percentile (no interpolation, so
engines cannot disagree on convention, and the emitted value is a raw
member, never derived math; the float-parity rule).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grouped_value_cum(
    df: DataFrame,
    gcols: list,
    value_col: str,
    n_buckets: int,
    counts: DataFrame | None = None,
) -> DataFrame:
    """(gcols..., value_col, cnt, n, cum): per-group per-distinct-value
    frequency counts with the running cumulative count ``cum`` — each
    value's sorted-rank interval is ``(cum - cnt, cum]`` — built so that
    no window input exceeds one (group, bucket)'s distinct values. The
    shared core of the exact-percentile operators below.

    ``counts`` lets a caller that already built (and persisted) the
    (gcols..., value_col, cnt) frequency relation pass it in — the
    relation is consumed by several branches of this DAG (bounds, the
    bucket join), and a caller aggregating OTHER statistics over the
    same frequencies can share one persisted copy instead of
    re-expanding the groupBy subtree per consumer (r16, guide §2.4).
    Null measurement rows in a provided ``counts`` are filtered here,
    so callers may pass the unfiltered frequency relation."""
    # null measurements have no place in an order statistic (and the
    # engines disagree on where ORDER BY puts them); a null GROUP key
    # is a legitimate group — joins below are null-safe for it
    if counts is None:
        counts = (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(*gcols, value_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    else:
        counts = counts.filter(F.col(value_col).isNotNull())
    bounds = counts.groupBy(*gcols).agg(
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
        F.sum("cnt").alias("n"),
    )
    span = F.col("__mx") - F.col("__mn")
    bucket = F.when(
        span > 0,
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(value_col) - F.col("__mn")) * n_buckets / span
            ).cast("long"),
        ),
    ).otherwise(F.lit(0))
    def nullsafe(left, right, cols):
        cond = None
        for c in cols:
            e = left[c].eqNullSafe(right[c])
            cond = e if cond is None else cond & e
        return cond

    b = (
        counts.alias("c")
        .join(
            F.broadcast(bounds).alias("bd"),
            nullsafe(counts.alias("c"), bounds.alias("bd"), gcols)
            if gcols
            else F.lit(True),
        )
        .select(
            *[F.col(f"c.{c}").alias(c) for c in [*gcols, value_col, "cnt"]],
            "__mn",
            "__mx",
            "n",
        )
        .withColumn("__bucket", bucket)
    )
    bs = b.groupBy(*gcols, "__bucket").agg(F.sum("cnt").alias("__bcnt"))
    above = (
        Window.partitionBy(*gcols)
        .orderBy(F.asc("__bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bs2 = bs.select(
        *gcols,
        "__bucket",
        F.coalesce(F.sum("__bcnt").over(above), F.lit(0)).alias("__cum_above"),
    )
    win = (
        Window.partitionBy(*gcols, "__bucket")
        .orderBy(F.asc(value_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # no broadcast hint: bs2 is |groups| x n_buckets rows — small for
    # typical group counts (AQE will broadcast it), but a high-
    # cardinality group column should shuffle-join it, not OOM the hint
    joined = (
        b.alias("b")
        .join(
            bs2.alias("s"),
            nullsafe(b.alias("b"), bs2.alias("s"), [*gcols, "__bucket"]),
        )
        .select("b.*", "s.__cum_above")
    )
    return joined.select(
        *gcols,
        value_col,
        "cnt",
        "n",
        (F.col("__cum_above") + F.sum("cnt").over(win)).alias("cum"),
    )


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[int],
    n_buckets: int = 1000,
    counts: DataFrame | None = None,
) -> DataFrame:
    """(group_cols..., pct, n_rows, pct_value): the exact discrete
    percentile member of ``value_col`` per group, for each integer
    percent in ``percentiles``. All percentiles share ONE counts
    relation and one window pass — the percentile list broadcasts as a
    tiny crossJoined relation, so asking for p25/p50/p75/p95 costs the
    same shuffles as asking for one.

    Scale shape: values collapse to (group, value) frequencies, then
    coarse-bucket per group (bounds from one small aggregate), so the
    running-count windows partition by (group, bucket) — bounded by
    distinct-values-per-bucket even when the value column is
    NEAR-UNIQUE (prices, durations), where the plain distinct-value
    window would degenerate right back into the low-cardinality trap
    one level down. Cross-bucket running totals ride a window over the
    (group, bucket) aggregate (≤ n_buckets rows per group). Ascending
    floor-bucketing is monotonic, so per-value cum reproduces the
    naive global-per-group window exactly."""
    if not percentiles:
        raise ValueError("percentiles must be non-empty")
    if not all(1 <= p <= 100 for p in percentiles):
        raise ValueError(f"percentiles must be in [1, 100]: {percentiles}")
    gcols = list(group_cols)
    ranked = _grouped_value_cum(df, gcols, value_col, n_buckets, counts=counts)
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


def grouped_interpolated_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float],
    n_buckets: int = 1000,
    counts: DataFrame | None = None,
) -> DataFrame:
    """(group_cols..., q, n_rows, q_value): the linearly INTERPOLATED
    quantile per group — the ``quantile_cont`` / ``F.percentile``
    convention (h = (n-1)·q; v[⌊h⌋] + (h-⌊h⌋)·(v[⌊h⌋+1]-v[⌊h⌋]) over
    the 1-indexed sorted values) — computed through the same bucketed
    running-count machinery as :func:`grouped_exact_percentiles`, so no
    window input exceeds one (group, bucket)'s distinct values and no
    aggregation buffer holds a per-group value→count map (the
    ``F.percentile`` liability: memory bounded by distinct values per
    group, which grows with data and OOMs at 100×; the r7 doctrine).

    Each target rank's bracketing members (ranks ⌊h⌋+1 and ⌊h⌋+2,
    clamped to n) are picked off the cum relation by interval filter —
    one row per (group, q, side) survives — and a |groups|·|qs|-row
    aggregate interpolates. When h is integral the fraction is exactly
    0.0 and the upper member is multiplied away, so the result is the
    raw lower member, bit-identical to the discrete statistic."""
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    if not all(0.0 <= q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be in [0, 1]: {quantiles}")
    gcols = list(group_cols)
    ranked = _grouped_value_cum(df, gcols, value_col, n_buckets, counts=counts)
    qs = df.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(set(quantiles))], "q double"
    )
    h = (F.col("n") - 1) * F.col("q")
    r_lo = (F.floor(h) + 1).cast("long")
    x = (
        ranked.crossJoin(F.broadcast(qs))
        .withColumn("__rlo", r_lo)
        .withColumn("__rhi", F.least(r_lo + 1, F.col("n")))
    )
    lo_hit = (F.col("cum") >= F.col("__rlo")) & (
        F.col("cum") - F.col("cnt") < F.col("__rlo")
    )
    hi_hit = (F.col("cum") >= F.col("__rhi")) & (
        F.col("cum") - F.col("cnt") < F.col("__rhi")
    )
    agg = (
        x.filter(lo_hit | hi_hit)
        .groupBy(*gcols, "q", "n")
        .agg(
            F.max(F.when(lo_hit, F.col(value_col))).alias("__vlo"),
            F.max(F.when(hi_hit, F.col(value_col))).alias("__vhi"),
        )
    )
    frac = (F.col("n") - 1) * F.col("q") - F.floor((F.col("n") - 1) * F.col("q"))
    return agg.select(
        *gcols,
        "q",
        F.col("n").alias("n_rows"),
        (
            F.col("__vlo")
            + frac * (F.col("__vhi").cast("double") - F.col("__vlo"))
        ).alias("q_value"),
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
    # null values cannot participate in a cumulative order statistic
    # (and their bucket would be dropped by the equality join below)
    df = df.filter(F.col(value_col).isNotNull())
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
