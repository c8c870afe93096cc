"""Distributed global row-number — a total-order rank WITHOUT the
single-partition window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY forces every
row through ONE task (Spark plans an Exchange SinglePartition + one
sort) — the classic scale-killer for "assign each row its global rank"
jobs (decile binning, systematic sampling, pagination manifests). This
module computes the identical rank distributively, the cumulative-
histogram decomposition:

1. per-row rank WITHIN its key-value group: ``row_number`` partitioned
   by the ORDER-BY value columns, ordered by the tie-break columns —
   partitions by value, so it parallelizes across distinct values;
2. group OFFSETS: counts per distinct value (one partial-aggregated
   groupBy), then a running sum over the DISTINCT-VALUE relation —
   the only single-partition window, sized |distinct values|, which is
   bounded by the value domain, not the row count (and for a genuinely
   high-cardinality domain it is still ~the aggregate's output, far
   smaller than the data);
3. global rank = group offset + within-group rank, attached with one
   join on the value columns.

Semantics are EXACTLY ``row_number`` over (value_cols, tie_cols) — a
deterministic total order requires ``tie_cols`` to complete a unique
key within each value group.

Cited reference behavior: none — the reference engine has no window
functions; this is the standard Spark decomposition of a global sort
rank (the same offsets trick ``zipWithIndex`` uses per partition,
expressed relationally so Catalyst keeps optimizing the pipeline).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    value_cols: Sequence[str],
    tie_cols: Sequence[str],
    out_col: str = "global_rank",
) -> DataFrame:
    """Attach a 1-based global ``row_number`` over the total order
    (``value_cols`` ASC, then ``tie_cols`` ASC) without ever moving the
    full relation into one partition. ``value_cols + tie_cols`` must be
    a unique key (otherwise the rank is not a total order and the
    result is nondeterministic by definition)."""
    vcols = list(value_cols)
    tcols = list(tie_cols)
    within = F.row_number().over(
        Window.partitionBy(*vcols).orderBy(*[F.asc(t) for t in tcols])
    )
    counts = df.groupBy(*vcols).agg(F.count(F.lit(1)).alias("_grp_n"))
    # The running sum ranks over DISTINCT values only — bounded by the
    # value domain. unboundedPreceding..(-1): offset excludes own group.
    off_w = (
        Window.orderBy(*[F.asc(v) for v in vcols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *[F.col(v).alias(f"_off_{v}") for v in vcols],
        F.coalesce(F.sum("_grp_n").over(off_w), F.lit(0)).alias("_grp_off"),
    )
    # NULL-SAFE equality back to the rows: a plain equi-join would
    # silently DROP every row whose value column is null (null != null)
    # while groupBy/partitionBy had put them in one group. Nulls sort
    # first (Spark's asc default) in both the offsets window and the
    # within-group partition, so the null group ranks lowest,
    # consistently. (Oracle caveat for callers: DuckDB's ASC default is
    # NULLS LAST — state NULLS FIRST explicitly in a cross-engine twin
    # if the ordering columns are nullable.)
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
