"""Exact k-word span (fingerprint) relations for substring-level
dedup — the ExactSubstr family (Lee et al. 2021, arXiv:2107.06499),
re-expressed as the fingerprint-join variant of their suffix array:
the shape that distributes. Consumed by the batch queries
(queries/dedup_sim.py: shared-span pairs, per-doc copied profile,
batch-vs-corpus admission) and the streaming ingest
(streaming/jobs.py: stream_span_dedup_ingest over a persisted span
index).

Reference anchor: the reference's dedup surface is PK-level
(SURVEY.md §2 A3, src/etl_utils.py:259-266); this family generalizes
it to verbatim partial copying, which document-level hashes and
MinHash bag-of-shingles similarity both miss.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_spans(
    df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (id_col, span) where span is an EXACT k-word window of
    the raw whitespace tokenization. explode_outer + post-explode null
    filter per the InferFiltersFromGenerate lesson
    (operators/minhash.explode_grams): plain explode over the computed
    span array would let Catalyst push an inferred size()>0 filter —
    and with it the whole window expression — below any upstream
    exchange. Docs shorter than k words yield no spans.

    At production scale the span string is replaced by a 64-bit
    rolling hash (join keys shrink; semantics identical modulo
    collisions) — the string form is kept here because it is exactly
    replicable in the SQL oracle."""
    toks = F.split(F.col(text_col), " ")
    n_spans = F.size(toks) - (k - 1)
    spans_arr = F.when(
        n_spans >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_spans),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            )
        ),
    )
    return (
        df.select(F.col(id_col), F.explode_outer(spans_arr).alias("span"))
        .filter(F.col("span").isNotNull())
    )


def copied_ratio_reject(n_in: Column, n_spans: Column) -> Column:
    """The admission decision shared by every member of the family:
    reject when >=20% of a doc's spans are already known. Pure integer
    comparison — exact on any engine."""
    return n_in * 5 >= n_spans
