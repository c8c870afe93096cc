"""Slowly-changing-dimension type 2 (SCD2) history maintenance.

The reference's MERGE upsert (/root/reference/src/glue_etl.py:339-349)
keeps only the LATEST version of each row; SCD2 is the lakehouse-native
generalization that keeps every version with validity intervals —
(key, attrs, valid_from, valid_to, is_current) — so any past state can
be reconstructed with ``valid_from <= d < valid_to``.

Pure DataFrame transform: given the existing history and a new
snapshot, emit the next history. One equi-join on the business key
decides row fate; everything else is projection + union. At scale this
is a single shuffle of the OPEN slice of history (the closed slice
passes through untouched and under a partition-by-``is_current`` layout
never even rescans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def _differs(tracked: list[str]) -> Column:
    """Null-safe 'any tracked attribute changed' predicate."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    return cond


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: str,
) -> DataFrame:
    """Produce the next SCD2 history from ``history`` (columns: key,
    tracked attrs, valid_from, valid_to, is_current) and ``updates``
    (key + tracked attrs) effective at ``effective_date``.

    Row fate:
    - closed historical rows: pass through unchanged;
    - open rows with no update or an identical update: pass through;
    - open rows whose tracked attrs changed: closed at the effective
      date, and a new open version is inserted;
    - keys never seen before: inserted as open rows.

    Deliberately NOT delete-aware: a key absent from ``updates`` stays
    open (snapshots are deltas, not full states); feed a full snapshot
    through an anti-join close-out step if absence means deletion.
    """
    eff = F.lit(effective_date).cast("date")
    attrs = [key, *tracked]

    closed_hist = history.filter(~F.col("is_current"))
    open_hist = history.filter(F.col("is_current"))

    # One full-outer join on the key decides every row's fate; presence
    # flags must survive null-valued attributes, so the history side is
    # detected via always-non-null valid_from and the update side via a
    # sentinel literal.
    upd_marked = updates.select(*attrs).withColumn("_upd_present", F.lit(True))
    joined = open_hist.alias("cur").join(
        upd_marked.alias("upd"), on=key, how="full_outer"
    )
    cur_present = F.col("cur.valid_from").isNotNull()
    upd_present = F.col("_upd_present").isNotNull()

    # Open rows that survive as-is: no update, or update equal.
    keep_open = joined.filter(
        cur_present & (~upd_present | ~_differs(tracked))
    ).select(
        F.col(key),
        *[F.col(f"cur.{c}").alias(c) for c in tracked],
        F.col("cur.valid_from").alias("valid_from"),
        F.col("cur.valid_to").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # Open rows closed by a differing update.
    now_closed = joined.filter(cur_present & upd_present & _differs(tracked)).select(
        F.col(key),
        *[F.col(f"cur.{c}").alias(c) for c in tracked],
        F.col("cur.valid_from").alias("valid_from"),
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # New versions: differing updates and brand-new keys.
    new_open = joined.filter(
        upd_present & (~cur_present | _differs(tracked))
    ).select(
        F.col(key),
        *[F.col(f"upd.{c}").alias(c) for c in tracked],
        eff.alias("valid_from"),
        F.lit(OPEN_END).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed_hist.select(*new_open.columns).unionByName(
        keep_open
    ).unionByName(now_closed).unionByName(new_open)


def scd2_bootstrap(
    snapshot: DataFrame, key: str, tracked: list[str], effective_date: str
) -> DataFrame:
    """Initial SCD2 history from a first snapshot: every row open."""
    return snapshot.select(key, *tracked).select(
        "*",
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(OPEN_END).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_as_of(history: DataFrame, as_of_date: str) -> DataFrame:
    """Reconstruct the dimension state at ``as_of_date`` from history."""
    d = F.lit(as_of_date).cast("date")
    return history.filter(
        (F.col("valid_from") <= d) & (d < F.col("valid_to"))
    ).drop("is_current")
