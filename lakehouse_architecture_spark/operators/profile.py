"""Single-pass table profiling: per-column null counts, distinct counts,
and min/max — the data-quality summary a pipeline runs before and after
every load (generalizing the reference's count-based validation logging,
/root/reference/src/glue_etl.py:200-206, into a reusable operator).

Scale shape: ONE aggregation job produces every statistic (a single
wide agg row — Spark computes all partial aggregates in the same scan),
then a ``stack`` unpivots the row to the long (col_name, stats) form.
Profiling N columns costs one table pass regardless of N; the unpivot
is a projection of a 1-row relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _render(col: Column, dtype: str) -> Column:
    """Engine-portable string rendering for min/max: doubles go through
    a fixed-point decimal so Spark and SQL engines print identically."""
    if dtype == "double":
        return col.cast("decimal(18,2)").cast("string")
    return col.cast("string")


def profile_table(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """Profile ``cols`` (name -> Spark type name) of ``df`` in one pass:
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    # Two aggregates, not one (r16, guide §1.2): mixing the per-column
    # DISTINCT aggregates with the plain ones routes everything through
    # the multi-distinct Expand (rows × (n_cols+1)) and drags the
    # null/min/max terms through it — measured 3.4–4.1 s combined vs
    # ~1 s for each aggregate alone on the 6-column orders profile at
    # sf0.1. The distincts keep their Expand to themselves; the plain
    # aggregate stays single-level; both are 1-row, crossJoined back.
    plain = [F.count(F.lit(1)).alias("_n_rows")]
    distincts = []
    for c, t in cols.items():
        plain += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            _render(F.min(c), t).alias(f"{c}__min"),
            _render(F.max(c), t).alias(f"{c}__max"),
        ]
        distincts.append(F.countDistinct(c).alias(f"{c}__distinct"))
    one = df.agg(*plain).crossJoin(df.agg(*distincts))
    parts = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return (
        one.select(
            F.col("_n_rows").alias("n_rows"),
            F.expr(
                f"stack({len(cols)}, {parts}) AS "
                "(col_name, n_nulls, n_distinct, min_value, max_value)"
            ),
        )
        .select(
            "col_name",
            "n_rows",
            F.col("n_nulls").cast("long").alias("n_nulls"),
            "n_distinct",
            "min_value",
            "max_value",
        )
        .orderBy("col_name")
    )
