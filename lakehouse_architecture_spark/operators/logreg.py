"""Distributed logistic regression by matrix-free gradient descent —
the learned quality/domain filter of a pretraining pipeline (the
fastText-classifier role in CCNet/RefinedWeb-style curation), trained
with Spark doing every corpus-sized step.

Reference parity note: the reference engine has no ML surface; this is
§2.11 LLM-pipeline surface (SURVEY.md), same doctrine as the PCA power
iteration (operators/pca.py): the model state (a handful of weights)
lives on the driver, every data-sized computation is ONE aggregate.

Per iteration over standardized features x and labels y in {0, 1}:

    z_i = b + w · x_i,   p_i = sigmoid(z_i)
    grad_w = (1/n) Σ (p_i − y_i) x_i     (one sum per feature)
    grad_b = (1/n) Σ (p_i − y_i)
    loss   = (1/n) Σ [ max(z_i, 0) − y_i z_i + log1p(exp(−|z_i|)) ]

— gradient AND loss come back in a single aggregate row (2·dim + 2
sums), so each iteration is exactly one corpus scan with map-side
partial aggregation; nothing per-row ever reaches the driver. The
softplus form keeps the loss finite for any |z|.

At 100 TB: iterations cost one scan each and the feature count is the
only width; standardization is one extra aggregate up front. The
returned certificates (loss trajectory, accuracy vs the majority-class
baseline) make a diverged or useless fit loud, not silently wrong.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 30,
) -> dict:
    """Fit p(y=1 | x) = sigmoid(b + w·x) by full-batch gradient descent.

    Features are standardized internally (mean 0, std 1 — constant
    columns get std 1 so they contribute nothing rather than NaN);
    weights are reported in STANDARDIZED space alongside the
    means/stds needed to apply them. Returns ``n``, ``n_pos``,
    ``weights``, ``bias``, ``initial_loss`` (= ln 2 at w = 0),
    ``final_loss``, ``accuracy`` (at threshold 0.5) and
    ``majority_share`` (the baseline accuracy to beat).
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    k = len(feature_cols)
    y = F.col(label_col).cast("double")

    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("n_pos"),
        *[F.avg(c).alias(f"mu{j}") for j, c in enumerate(feature_cols)],
        *[
            F.stddev_pop(c).alias(f"sd{j}")
            for j, c in enumerate(feature_cols)
        ],
    ).collect()[0]
    n = int(stats.n)
    n_pos = int(stats.n_pos)
    if n == 0:
        raise ValueError("empty training relation")
    mus = [float(stats[f"mu{j}"]) for j in range(k)]
    sds = [
        float(stats[f"sd{j}"]) if stats[f"sd{j}"] else 1.0 for j in range(k)
    ]
    xs = [
        ((F.col(c) - F.lit(mus[j])) / F.lit(sds[j])).alias(f"x{j}")
        for j, c in enumerate(feature_cols)
    ]
    base = df.select(*xs, y.alias("y")).localCheckpoint(eager=True)

    w = [0.0] * k
    b = 0.0
    final_loss = math.log(2.0)
    for _ in range(iters):
        z = F.lit(b)
        for j in range(k):
            z = z + F.lit(w[j]) * F.col(f"x{j}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = p - F.col("y")
        softplus = (
            F.greatest(z, F.lit(0.0))
            - F.col("y") * z
            + F.log1p(F.exp(-F.abs(z)))
        )
        row = base.agg(
            *[F.sum(resid * F.col(f"x{j}")).alias(f"g{j}") for j in range(k)],
            F.sum(resid).alias("gb"),
            F.avg(softplus).alias("loss"),
        ).collect()[0]
        final_loss = float(row.loss)
        w = [w[j] - lr * float(row[f"g{j}"]) / n for j in range(k)]
        b = b - lr * float(row.gb) / n

    z = F.lit(b)
    for j in range(k):
        z = z + F.lit(w[j]) * F.col(f"x{j}")
    acc = float(
        base.agg(
            F.avg(((z > 0) == (F.col("y") > 0.5)).cast("double")).alias("a")
        ).collect()[0].a
    )
    base.unpersist()
    return {
        "n": n,
        "n_pos": n_pos,
        "weights": w,
        "bias": b,
        "means": mus,
        "stds": sds,
        "initial_loss": math.log(2.0),
        "final_loss": final_loss,
        "accuracy": acc,
        "majority_share": max(n_pos, n - n_pos) / n,
    }


def score_logistic(
    df: DataFrame, feature_cols: list[str], model: dict
) -> DataFrame:
    """``df`` + a ``p_keep`` probability column from a fitted model —
    the APPLY side of the learned filter: callers threshold it
    (``.filter("p_keep >= 0.8")``) or keep it as a sampling weight for
    the weighted sampler. Pure narrow projection (the standardization
    constants and weights fold into one expression), so scoring 100 TB
    is exactly one scan with no shuffle."""
    if len(feature_cols) != len(model["weights"]):
        raise ValueError(
            f"{len(feature_cols)} features vs "
            f"{len(model['weights'])} model weights"
        )
    z = F.lit(float(model["bias"]))
    for j, c in enumerate(feature_cols):
        standardized = (F.col(c) - F.lit(model["means"][j])) / F.lit(
            model["stds"][j]
        )
        z = z + F.lit(model["weights"][j]) * standardized
    return df.withColumn("p_keep", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
