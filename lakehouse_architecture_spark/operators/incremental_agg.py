"""Incremental materialized-aggregate maintenance.

The rollup-refresh problem at 100 TB: a per-key (count, sum) summary
over an append-mostly fact table should cost BATCH-sized work per
refresh, not a corpus rescan. Because counts and decimal sums are
exact and associative, the stored state and a batch's partial
aggregate merge with one small outer-join-free union-aggregate — the
same algebra that makes Spark's own partial aggregation correct,
lifted to cross-run persistence (the materialized-view incremental-
maintenance pattern; Delta/DBSQL call it incremental refresh).

The merged state is BIT-IDENTICAL to a full recompute (decimal
addition is exact, so grouping then re-merging cannot drift), which is
what lets the oracle for the registered query simply BE the full
GROUP BY — the strongest possible check for an incremental path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"


def agg_state(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Per-key (n_rows, sum_value) state: the stored rollup. Decimal
    sum so later merges are exact."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value).cast(_DEC)).alias("sum_value"),
    )


def merge_agg_state(state: DataFrame, batch_state: DataFrame) -> DataFrame:
    """Fold a batch's partial state into the stored state: union the
    two small relations and re-aggregate on the key — cost is
    O(|state| + |batch keys|), never the fact table. Exact: counts
    add, decimal sums add associatively."""
    keys = [c for c in state.columns if c not in ("n_rows", "sum_value")]
    return (
        state.unionByName(batch_state)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
