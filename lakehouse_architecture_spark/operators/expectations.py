"""Declarative table-level expectations: the audit-report layer.

Where `operators/validation.py` splits ROWS into valid/rejected (the
reference's validate_data, /root/reference/src/glue_etl.py), an
expectation asserts a TABLE-level quality contract — "o_custkey is
99.9% non-null", "o_orderkey is unique", "status within this set",
"95% of totals in range" — and produces a report row per expectation
(the Great-Expectations checkpoint pattern, re-expressed as one Spark
aggregate).

Scale contract: ALL expectations over a table evaluate in ONE
map-side-combinable aggregate pass — each expectation contributes a
count_if / countDistinct term to the same agg, so auditing a 100 TB
table costs a single scan no matter how many expectations are
attached. The report is |expectations| rows of exact integers and a
boolean verdict; thresholds are checked in-plan (no driver math), so
the report composes with sinks/alerts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """Base: ``name`` labels the report row; ``metric_ratio`` must be
    satisfied (ratio >= min_ratio) for the expectation to pass."""

    column: str
    min_ratio: float = 1.0

    @property
    def name(self) -> str:  # pragma: no cover - overridden
        raise NotImplementedError

    def satisfied(self) -> Column:
        """Row-level boolean counted by the shared aggregate."""
        raise NotImplementedError


@dataclass(frozen=True)
class ExpectNotNull(Expectation):
    @property
    def name(self) -> str:
        return f"not_null({self.column})"

    def satisfied(self) -> Column:
        return F.col(self.column).isNotNull()


@dataclass(frozen=True)
class ExpectBetween(Expectation):
    lo: float = 0.0
    hi: float = 0.0

    @property
    def name(self) -> str:
        return f"between({self.column},{self.lo},{self.hi})"

    def satisfied(self) -> Column:
        c = F.col(self.column)
        return c.isNotNull() & (c >= self.lo) & (c <= self.hi)


@dataclass(frozen=True)
class ExpectInSet(Expectation):
    allowed: tuple = ()

    @property
    def name(self) -> str:
        return f"in_set({self.column})"

    def satisfied(self) -> Column:
        return F.col(self.column).isin(list(self.allowed))


@dataclass(frozen=True)
class ExpectUnique(Expectation):
    """Distinct count == row count. Participates in the same single
    aggregate via countDistinct (exact; use expect-level sampling
    upstream if a 100 TB column can't afford the distinct)."""

    @property
    def name(self) -> str:
        return f"unique({self.column})"

    def satisfied(self) -> Column:  # pragma: no cover - not row-wise
        raise NotImplementedError("unique is table-level, not row-level")


def evaluate_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """One report row per expectation:
    (expectation, n_rows, n_satisfied, min_ratio, passed).

    Every expectation folds into ONE aggregate over ``df`` — row-wise
    ones as count_if terms, uniqueness as countDistinct — then the
    single 1-row result unpivots into the report relation. Exact
    integers; `passed` is computed in-plan as
    n_satisfied >= ceil(min_ratio * n_rows) (integer-safe: no float
    threshold comparison on the compared surface)."""
    if not expectations:
        raise ValueError("no expectations given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(expectations):
        if isinstance(e, ExpectUnique):
            aggs.append(F.countDistinct(F.col(e.column)).alias(f"__s{i}"))
        else:
            aggs.append(F.count_if(e.satisfied()).alias(f"__s{i}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.col("__n").alias("n_rows"),
                F.col(f"__s{i}").alias("n_satisfied"),
                F.lit(float(e.min_ratio)).alias("min_ratio"),
                (
                    F.col(f"__s{i}")
                    >= F.ceil(F.lit(float(e.min_ratio)) * F.col("__n"))
                ).alias("passed"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")
