"""Greedy sequence packing: assign documents to token-budget bins.

LLM training consumes fixed-length sequences; the packing step groups
documents into bins of ~budget tokens (concat-and-chunk pipelines, cf.
the T5/GPT data loaders). The exact bin-packing objective is NP-hard
and inherently sequential — at scale every real pipeline packs PER
SHARD: documents are sharded deterministically, each shard is packed
independently by a running token sum, and bins never cross shards.

That formulation is pure window algebra — one shuffle on the shard key,
a cumulative sum within each shard, integer division by the budget —
no driver loop, no UDF, and identical SQL on any engine:

    pack_id = floor((cumsum(tokens) - tokens) / budget)

A document larger than the budget gets a bin of its own (its bin simply
overflows); downstream chunkers split it. Bins may overfill by at most
one document — the standard greedy trade accepted for a shuffle-free
plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    token_col: str,
    id_col: str,
    shard_col: str,
    budget: int,
) -> DataFrame:
    """Adds ``pack_id`` (bin index within shard) via a running token sum
    ordered by ``id_col`` inside each shard."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(
        "pack_id", F.floor(cum_before / F.lit(budget)).cast("long")
    )


def pack_stats(packed: DataFrame, token_col: str, shard_col: str) -> DataFrame:
    """Bin-level audit: docs per bin and bin fill in tokens."""
    return packed.groupBy(shard_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("bin_tokens"),
    )


def whitespace_tokens(text: Column) -> Column:
    """Token count consistent with queries/text.py: \\S+ runs."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), 0))
