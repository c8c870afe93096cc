"""Edit-distance record linkage via deletion-neighborhood blocking.

The SymSpell idea (public domain algorithm, Garbe 2012), distributed:
two strings within Levenshtein distance 1 MUST share a member of each
other's deletion neighborhood (delete one char, or the string itself)
— substitution: deleting the differing position from both sides yields
the same string; insertion/deletion: the shorter string IS a deletion
variant of the longer. So exact-matching on the (L+1) variants per
string is a complete blocking scheme for d<=1: candidate generation is
one explode + one equi-join on the variant key, never an all-pairs
scan, and the final ``levenshtein`` verify (JVM-side built-in) touches
only bucket-mates. At 100 TB: |variants| = (L+1)·n rows shuffled once
on the variant key; pathological buckets (e.g. a boilerplate prefix
shared by millions) are droppable with ``max_bucket`` — the stop-
shingle doctrine from the MinHash family, trading bounded recall loss
for a bounded join.

No Python UDFs anywhere: variants are substring concatenation,
verification is ``F.levenshtein`` — both whole-stage-codegen
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, name, var): the deletion-1 neighborhood of every string —
    the string itself (i=0) plus each single-character deletion
    (i=1..L). One narrow projection + explode; no shuffle."""
    i = F.col("i")
    var = F.when(i == 0, F.col("name")).otherwise(
        F.concat(
            F.expr("substring(name, 1, i - 1)"),
            F.expr("substring(name, i + 1)"),
        )
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("name"),
            F.explode(
                F.sequence(F.lit(0), F.length(text_col))
            ).alias("i"),
        )
        .select("id", "name", var.alias("var"))
    )


def fuzzy_candidates_d1(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_bucket: int | None = None,
) -> DataFrame:
    """UNVERIFIED candidate pairs (id_a, id_b, name_a, name_b), id_a <
    id_b: every pair sharing a deletion-1 variant — a superset of the
    true d<=1 pairs (bucket collisions included), which is what the
    blocking-efficiency measurement queries count before the verify.
    ``max_bucket`` drops variant keys shared by more than that many
    rows (documented recall trade for adversarial boilerplate); None
    keeps exactness."""
    v = deletion_variants(df, text_col, id_col)
    if max_bucket is not None:
        keep = (
            v.groupBy("var")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("var")
        )
        v = v.join(keep, "var")
    a = v.select(
        F.col("var"),
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
    )
    b = v.select(
        F.col("var"),
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
    )
    return (
        a.join(b, "var")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )


def fuzzy_pairs_d1(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_bucket: int | None = None,
) -> DataFrame:
    """Verified pairs (id_a, id_b, name_a, name_b, dist) with
    Levenshtein distance <= 1, id_a < id_b. COMPLETE for d=1 by the
    deletion-neighborhood theorem; candidates are bucket-mates on the
    variant key only (see :func:`fuzzy_candidates_d1`)."""
    cand = fuzzy_candidates_d1(df, text_col, id_col, max_bucket)
    return cand.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= 1)
