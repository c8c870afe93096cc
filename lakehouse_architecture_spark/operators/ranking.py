"""Distributed global row-number — a total-order rank WITHOUT the
single-partition window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY forces every
row through ONE task (Spark plans an Exchange SinglePartition + one
sort) — the classic scale-killer for "assign each row its global rank"
jobs (decile binning, systematic sampling, pagination manifests). This
module computes the identical rank distributively via the
cumulative-histogram decomposition:

1. per-row rank WITHIN its key-value group: ``row_number`` partitioned
   by the ORDER-BY value columns, ordered by the tie-break columns —
   partitions by value, so it parallelizes across distinct values;
2. group OFFSETS: counts per distinct value (one partial-aggregated
   groupBy), then a running sum over the distinct-value relation —
   computed by TWO-PHASE RANGE OFFSETS (below), never by an
   unpartitioned window;
3. global rank = group offset + within-group rank, attached with one
   join on the value columns.

Two-phase range offsets (the r14→r15 scale fix): the r14 version
computed step 2 with ``Window.orderBy(value_cols)`` — an unpartitioned
window. Fine when the value domain is small (decile binning over doc
lengths: tens of distinct values), but for NEAR-UNIQUE ranked keys
(per-customer spend cents in ``orders_customer_spend_gini``) the
distinct-value relation is ~n rows and Spark logged ``WindowExec: No
Partition Defined for Window operation! Moving all data to a single
partition`` — a billion-row single-task sort at 100×, exactly the shape
this operator exists to remove. Now:

2a. ``repartitionByRange(value_cols)`` the counts relation — range
    partitions preserve global value order ACROSS partitions and
    RangePartitioner puts equal keys in one partition;
2b. per-range-partition count totals: ONE tiny aggregate, at most
    ``spark.sql.shuffle.partitions`` rows, collected to the driver and
    turned into cumulative partition-level offsets (a bounded collect
    per SCALING.md's limits table — sized by CONFIG, not data);
2c. within-partition running sum: ``Window.partitionBy(_pid)`` — every
    partition is its own window task, no single-partition stage; the
    group offset is the broadcast partition offset + the
    within-partition running sum.

Both range boundaries and pids come from ONE materialization of the
counts relation, pinned by an eager ``localCheckpoint`` — NOT from
shuffle-output reuse, which is best-effort: RangePartitioner samples
with an RDD-id-derived seed, so two separately-planned jobs over the
same ``repartitionByRange`` could draw different boundaries, and the
collected pid totals would silently disagree with the pids the
running-sum job sees. The checkpoint makes the collect and the window
read the same frozen partitions by construction.

Semantics are EXACTLY ``row_number`` over (value_cols, tie_cols) — a
deterministic total order requires ``tie_cols`` to complete a unique
key within each value group.

Cited reference behavior: none — the reference engine has no window
functions; this is the standard Spark decomposition of a global sort
rank (the same per-partition-offsets trick ``zipWithIndex`` uses,
expressed relationally so Catalyst keeps optimizing the pipeline).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_global_offsets(
    df: DataFrame,
    value_cols: Sequence[str],
) -> tuple[DataFrame, int]:
    """Two-phase range offsets over the distinct-value relation:
    returns ``(offsets, total_rows)`` where ``offsets`` has one row per
    distinct ``value_cols`` combination carrying ``_grp_n`` (the group's
    row count) and ``_grp_off`` (the number of rows ordered strictly
    before the group in the ``value_cols`` ASC NULLS FIRST total
    order), and ``total_rows`` is the driver-side total row count —
    free, because the phase-1 pid collect already sums every group.

    r16: factored out of ``global_row_number`` so aggregate consumers
    whose output depends only on (value, count, offset) — equi-depth
    band profiles, rank-weighted sums like the gini determinants — can
    skip the per-row rank + join-back entirely (guide §2.3 "shuffle
    keys and metadata instead of payloads"): every rank in a group is
    ``_grp_off + 1 .. _grp_off + _grp_n``, so any per-band row count or
    rank sum is closed-form integer arithmetic on the group relation.

    Range-partition by value: partition i holds values strictly below
    partition i+1 (nulls first, matching Spark's asc-nulls-first).
    localCheckpoint(eager) PINS the partitioning: RangePartitioner
    draws its sample with a seed derived from the RDD id, so two
    separate jobs planning the same repartitionByRange could sample
    DIFFERENT boundaries — the collected pid totals would then
    disagree with the pids the running-sum job sees, silently
    corrupting every rank. One materialization, both passes read the
    same frozen partitions (the loop_round doctrine applied to a
    one-shot relation; the checkpointed relation is the distinct-
    value aggregate, never the raw rows)."""
    vcols = list(value_cols)
    spark = df.sparkSession
    counts = df.groupBy(*vcols).agg(F.count(F.lit(1)).alias("_grp_n"))
    n_range = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = (
        counts.repartitionByRange(n_range, *[F.asc(v) for v in vcols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Phase 1: per-partition totals — ≤ n_range rows, bounded by
    # configuration, not data (SCALING.md collect-limits class:
    # partition values). Cumulative-sum them driver-side into the
    # offset BELOW each partition.
    pid_rows = sorted(
        ranged.groupBy("_pid").agg(F.sum("_grp_n").alias("_pn")).collect(),
        key=lambda r: r["_pid"],
    )
    acc = 0
    pid_offsets = []
    for r in pid_rows:
        pid_offsets.append((int(r["_pid"]), acc))
        acc += int(r["_pn"])
    pid_off = F.broadcast(
        spark.createDataFrame(pid_offsets, "_pid int, _pid_off long")
    )
    # Phase 2: within-partition running sum (every partition its own
    # window task; unboundedPreceding..(-1) excludes the own group).
    run_w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.asc(v) for v in vcols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranged.withColumn(
            "_run", F.coalesce(F.sum("_grp_n").over(run_w), F.lit(0))
        )
        .join(pid_off, "_pid")
        .select(
            *vcols,
            "_grp_n",
            (F.col("_pid_off") + F.col("_run")).alias("_grp_off"),
        )
    )
    return offsets, acc


def global_row_number(
    df: DataFrame,
    value_cols: Sequence[str],
    tie_cols: Sequence[str],
    out_col: str = "global_rank",
) -> DataFrame:
    """Attach a 1-based global ``row_number`` over the total order
    (``value_cols`` ASC, then ``tie_cols`` ASC) without ever moving the
    full relation — or the distinct-value relation — into one
    partition. ``value_cols + tie_cols`` must be a unique key
    (otherwise the rank is not a total order and the result is
    nondeterministic by definition)."""
    vcols = list(value_cols)
    tcols = list(tie_cols)
    within = F.row_number().over(
        Window.partitionBy(*vcols).orderBy(*[F.asc(t) for t in tcols])
    )
    grouped, _total = grouped_global_offsets(df, vcols)
    offsets = grouped.select(
        *[F.col(v).alias(f"_off_{v}") for v in vcols],
        "_grp_off",
    )
    # NULL-SAFE equality back to the rows: a plain equi-join would
    # silently DROP every row whose value column is null (null != null)
    # while groupBy/partitionBy had put them in one group. Nulls sort
    # first (Spark's asc default) in the range partitioning, the
    # running-sum ordering, and the within-group partition, so the null
    # group ranks lowest, consistently. (Oracle caveat for callers:
    # DuckDB's ASC default is NULLS LAST — state NULLS FIRST explicitly
    # in a cross-engine twin if the ordering columns are nullable.)
    cond = None
    for v in vcols:
        c = F.col(v).eqNullSafe(F.col(f"_off_{v}"))
        cond = c if cond is None else (cond & c)
    return (
        df.withColumn("_within_rn", within)
        .join(offsets, cond)
        .withColumn(out_col, (F.col("_grp_off") + F.col("_within_rn")))
        .drop(
            "_within_rn", "_grp_off", *[f"_off_{v}" for v in vcols]
        )
    )


def equidepth_band_stats(
    df: DataFrame,
    value_col: str,
    n_bands: int,
) -> DataFrame:
    """Exact equal-count banding WITHOUT per-row ranks: one row per
    band with columns ``(band, n_rows, min_v, max_v, sum_v)``, where a
    row of 1-based global rank ``rk`` over the (``value_col`` ASC,
    any-tie-break) total order belongs to
    ``band = ((rk - 1) * n_bands) DIV n + 1`` — bit-identical to
    ranking every row and grouping by that expression.

    Why no per-row rank is needed (r16, guide §2.3/§2.4): ties on
    ``value_col`` occupy CONTIGUOUS ranks, and every statistic emitted
    here (count / min / max / sum of the value itself) is constant
    within a tie group. A group with offset ``o`` (rows strictly
    before it) and count ``c`` covers 0-based ranks ``[o, o+c-1]``;
    band ``b`` covers 0-based ranks
    ``[ceil((b-1)*n/B), ceil(b*n/B) - 1]``; the group's contribution
    to band ``b`` is the size of the interval intersection. So the
    whole profile is computed on the distinct-value relation: the raw
    rows are partial-aggregated at the scan (groupBy value), and
    nothing is ever joined back — the plan drops the full-row window
    sort AND the rank join-back that the ``global_row_number``
    formulation carries.

    Tie-break columns are deliberately absent: they only decide WHICH
    tied row gets which rank inside the group, which cannot change any
    per-band count/min/max/sum. ``sum_v`` is ``SUM(value * rows_in_
    band)`` in the value column's Spark SUM result type (longs stay
    long), matching ``SUM(value)`` over the per-row form exactly."""
    bands = int(n_bands)
    offsets, total = grouped_global_offsets(df, [value_col])
    nn = int(total)
    # 0-based rank interval of the group: [o, o+c-1] with o=_grp_off,
    # c=_grp_n; first and last (1-based) band it touches. All operands
    # are non-negative longs, so DIV is exact floor division. (With an
    # empty input the offsets relation is empty and none of these
    # expressions — including the DIV by zero — ever evaluates.)
    per_group = offsets.select(
        value_col,
        F.col("_grp_off").cast("long").alias("_o"),
        F.col("_grp_n").cast("long").alias("_c"),
        F.expr(f"(_grp_off * {bands}) DIV {nn} + 1").alias("_band_lo"),
        F.expr(
            f"((_grp_off + _grp_n - 1) * {bands}) DIV {nn} + 1"
        ).alias("_band_hi"),
    )
    # Explode the (short — a group rarely straddles more than one
    # boundary) band range and intersect rank intervals exactly:
    # band b covers 0-based ranks [ceil((b-1)*n/B), ceil(b*n/B) - 1].
    exploded = per_group.select(
        value_col,
        "_o",
        "_c",
        F.explode(F.sequence("_band_lo", "_band_hi")).alias("band"),
    ).select(
        value_col,
        "band",
        (
            F.least(
                F.col("_o") + F.col("_c") - 1,
                F.expr(f"(band * {nn} + {bands - 1}) DIV {bands} - 1"),
            )
            - F.greatest(
                F.col("_o"),
                F.expr(f"((band - 1) * {nn} + {bands - 1}) DIV {bands}"),
            )
            + 1
        ).alias("_in_band"),
    )
    return exploded.groupBy("band").agg(
        F.sum("_in_band").alias("n_rows"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.sum(F.col(value_col) * F.col("_in_band")).alias("sum_v"),
    )
