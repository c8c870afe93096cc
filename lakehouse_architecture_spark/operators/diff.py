"""Snapshot diff: classify rows between two versions of a table.

The incremental-ETL primitive behind CDC backfills, MERGE auditing, and
"what did this load change?" debugging — the reference's MERGE
(/root/reference/src/glue_etl.py:336-349) applies changes blindly; this
operator makes the change set itself a relation.

One full-outer join on the key, one classification projection. At scale
the join co-locates if both snapshots are bucketed on the key
(catalog.save_as_table bucket_by) — then the diff is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows of ``keys`` + ``change_type`` in
    ('inserted', 'deleted', 'updated', 'unchanged').

    ``compare_cols`` defaults to every non-key column the two snapshots
    share. NULL-safe comparison (<=>) so NULL -> value and value -> NULL
    both count as updates.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in keys],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(1).alias("in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"k_{k}") for k in keys],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(1).alias("in_new"),
    )
    joined = o.join(n, [f"k_{k}" for k in keys], "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
    change = (
        F.when(F.col("in_old").isNull(), "inserted")
        .when(F.col("in_new").isNull(), "deleted")
        .when(same, "unchanged")
        .otherwise("updated")
    )
    return joined.select(
        *[F.col(f"k_{k}").alias(k) for k in keys],
        change.alias("change_type"),
    )
