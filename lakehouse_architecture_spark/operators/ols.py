"""Closed-form simple linear regression as ONE corpus aggregate.

Where `operators/logreg.py` is the iterative (GD) member of the
on-cluster learning family, OLS with one regressor needs no iteration
at all: slope and intercept are rational functions of five moment sums
(n, Σx, Σy, Σx², Σy², Σxy), so the whole fit is a single scan with a
map-side-combinable aggregate — at 100 TB, one pass, no shuffle beyond
the 1-row combine, no driver math that isn't O(1).

Determinism doctrine: each product is rounded once to DECIMAL(30,18)
and summed with exact decimal addition (order-independent), so any SQL
engine computing SUM(CAST(x*y AS DECIMAL(30,18))) gets bit-identical
moments — slope/intercept/R² then agree bit-for-bit cross-engine, and
the oracle can be the EXACT closed form, not an invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,18)"


def _m(e: Column) -> Column:
    return F.sum(e.cast(_DEC)).cast("double")


def simple_ols(df: DataFrame, x: str, y: str) -> DataFrame:
    """One-row DataFrame (n, slope, intercept, r2) of the least-squares
    fit y ~ slope*x + intercept, all moments decimal-exact. Declarative
    (no collect): compose it into larger plans or let the caller
    collect the 4 scalars.

    Operands are cast to double BEFORE multiplying (not after): the
    oracle form SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS
    DECIMAL)) multiplies doubles, and a DecimalType input column
    multiplied natively first would produce a (more exact!) different
    product — bit-parity requires mirroring the arithmetic order."""
    xc, yc = F.col(x).cast("double"), F.col(y).cast("double")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        _m(xc).alias("sx"),
        _m(yc).alias("sy"),
        _m(xc * xc).alias("sxx"),
        _m(yc * yc).alias("syy"),
        _m(xc * yc).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return agg.select(
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
        (cov_n * cov_n / (var_x * var_y)).alias("r2"),
    )


def grouped_ols(
    df: DataFrame, group_cols: list[str], x: str, y: str
) -> DataFrame:
    """Per-group least-squares fits in ONE grouped aggregate:
    (group..., n, slope, intercept, r2). Same decimal-exact moment
    algebra as :func:`simple_ols`, keyed — fitting a trend per segment
    over 100 TB is one shuffle on the group key with map-side partial
    moments, never a per-group scan. Groups with zero x-variance get a
    null slope (guarded division) rather than an ANSI error."""
    xc, yc = F.col(x).cast("double"), F.col(y).cast("double")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        _m(xc).alias("sx"),
        _m(yc).alias("sy"),
        _m(xc * xc).alias("sxx"),
        _m(yc * yc).alias("syy"),
        _m(xc * yc).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    safe_vx = F.when(var_x != 0.0, var_x)
    slope = cov_n / safe_vx
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
        (cov_n * cov_n / (safe_vx * var_y)).alias("r2"),
    )


def ols2(df: DataFrame, x1: str, x2: str, y: str) -> DataFrame:
    """Two-feature least squares y ~ b0 + b1*x1 + b2*x2 by the normal
    equations, solved in-plan with Cramer's rule — still ONE aggregate
    (nine decimal-exact moments), no driver linear algebra, no
    iteration. The determinant expansions are written in a fixed term
    order so an engine mirroring the same expressions reproduces the
    coefficients bit-for-bit (the simple_ols doctrine, one rank up).
    Rank-deficient inputs (collinear or constant features) make the
    Gram determinant zero: coefficients come back null via the guarded
    division rather than an ANSI error."""
    a, b, c = (
        F.col(x1).cast("double"),
        F.col(x2).cast("double"),
        F.col(y).cast("double"),
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        _m(a).alias("s1"),
        _m(b).alias("s2"),
        _m(c).alias("sy"),
        _m(a * a).alias("s11"),
        _m(a * b).alias("s12"),
        _m(b * b).alias("s22"),
        _m(a * c).alias("s1y"),
        _m(b * c).alias("s2y"),
    )
    n = F.col("n").cast("double")
    s1, s2, sy = F.col("s1"), F.col("s2"), F.col("sy")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    s1y, s2y = F.col("s1y"), F.col("s2y")
    # det [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], first-row expansion
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    safe_det = F.when(det != 0.0, det)
    # replace column k with [sy, s1y, s2y], same expansion order
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return agg.select(
        "n",
        (det0 / safe_det).alias("b0"),
        (det1 / safe_det).alias("b1"),
        (det2 / safe_det).alias("b2"),
    )
