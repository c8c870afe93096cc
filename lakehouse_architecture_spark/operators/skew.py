"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. These operators are the
explicit fallback for the cases AQE cannot fix:

- an AGGREGATION on a skewed key (AQE splits join partitions, not
  aggregation groups — one reducer still owns the hot key);
- a shuffle join where one key's rows exceed a single executor's memory
  even after splitting, so the build side for that key must be
  replicated instead.

Both transforms are semantics-preserving; tests assert equality with
the unsalted plans (tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of the whole row.

    Deterministic (unlike ``rand()``) so task retries and AQE re-plans
    reproduce the same partitioning — required for exactly-once sinks.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg_count_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: count + decimal sum per key.

    Phase 1 aggregates (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 combines the per-salt partials on the
    now-tiny (key) relation. Identical result to a direct groupBy(key):
    counts add, and the decimal sums are exact so re-summing partials is
    associative.

    Salt entropy vs scan width: by default the deterministic salt
    hashes the WHOLE row, which is guaranteed entropy but reads every
    table column (defeating scan pruning — measured 11 cols read for a
    2-col aggregate). Pass ``salt_cols`` naming a few high-entropy
    columns (a row id) to keep the scan narrow. Do NOT rely on
    (key, value) alone: a hot key whose measure is constant would hash
    to ONE salt and re-create the very skew this operator removes.
    """
    cols = (
        list(dict.fromkeys([key, value] + salt_cols))
        if salt_cols is not None
        else df.columns
    )
    df = df.select(*cols)
    partial = (
        df.withColumn("_salt", _salt(df, n_salts))
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(value).cast("decimal(18,4)")).alias("_s"),
        )
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_n").alias("n_rows"),
            F.sum("_s").cast("double").alias("sum_value"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join that spreads a hot key across ``n_salts`` tasks.

    The big side gets a deterministic row salt; the small side is
    replicated once per salt value (an explode of a ``sequence`` — cost
    = |small| * n_salts, acceptable precisely because the small side is
    small). The join key becomes (key, salt), so the hot key's rows land
    on ``n_salts`` different reducers instead of one.

    Use when the small side is too big to broadcast AND AQE's split is
    insufficient; otherwise ``F.broadcast`` is the better tool.
    """
    salted_big = big.withColumn("_salt", _salt(big, n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return (
        salted_big.join(replicated, [key, "_salt"])
        .drop("_salt")
    )
