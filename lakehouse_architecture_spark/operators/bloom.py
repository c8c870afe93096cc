"""Portable Bloom-filter build/probe for semi-join pruning.

The 100 TB join problem this solves: a selective dimension predicate
should prune the fact scan BEFORE the shuffle, but an exact semi-join
still shuffles every fact row once. A Bloom filter of the dimension
keys is a few KB, broadcasts everywhere, and drops almost all
non-matching fact rows at scan time — the same idea behind Spark's
runtime `spark.sql.optimizer.runtime.bloomFilter.enabled` rewrite,
exposed here as an explicit, measurable operator (the reference's
validation-probe style, generalized; cf. /root/reference/src/
glue_etl.py's validate-then-join pipeline shape).

Portability is the design constraint (the md5 doctrine used by the
MinHash/LSH/IVF family): positions come from two md5-derived hashes
via Kirsch-Mitzenmacher double hashing ``(h1 + i*h2) % m``, words are
32-bit so no mask ever touches the sign bit, and every step is plain
integer SQL — DuckDB rebuilds the identical filter, so even the false
positives match cross-engine, making the pruning MEASURABLE, not
asserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def _h(key: Column, salt: str, m_bits: int) -> Column:
    """md5-derived position hash in [0, m_bits): 15 hex chars -> 60-bit
    nonnegative integer, mod m. Same construction as the MinHash/LSH
    hash families, so the oracle reproduces it with string ops."""
    s = F.concat(key.cast("string"), F.lit(salt))
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        F.lit(m_bits),
    )


def _probe_positions(df: DataFrame, key: str, m_bits: int, k: int) -> DataFrame:
    """One row per (input row, probe i) with the bit position to test:
    Kirsch-Mitzenmacher (h1 + i*h2) % m — two md5 evaluations per key
    regardless of k."""
    h1, h2 = _h(F.col(key), "", m_bits), _h(F.col(key), ":b", m_bits)
    return df.select(
        key,
        F.explode(
            F.array(
                *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]
            )
        ).alias("pos"),
    )


def bloom_build(keys: DataFrame, key: str, m_bits: int, k: int) -> DataFrame:
    """(word_idx, word) Bloom filter of ``keys[key]``: m_bits/32 rows,
    built with one shuffle on the word index (partial bit_or map-side).
    Tiny by construction — broadcast it at probe time."""
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    mask = F.expr(f"shiftleft(1L, CAST(pos % {WORD_BITS} AS INT))")
    return (
        _probe_positions(keys, key, m_bits, k)
        .select((F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
                mask.alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_pass_keys(
    keys: DataFrame, key: str, words: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """The distinct ``key`` values whose k probe bits are ALL set.

    Probe cost: k broadcast-join lookups per key against the
    m_bits/32-row filter relation — no shuffle of the probed side
    (the groupBy is on the already-distinct key, map-side combinable).
    No false negatives by construction; false positives are bounded by
    the (1 - e^(-nk/m))^k fill and measured by the QA query."""
    mask = F.expr(f"shiftleft(1L, CAST(pos % {WORD_BITS} AS INT))")
    probes = _probe_positions(keys, key, m_bits, k).select(
        key,
        (F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
        mask.alias("mask"),
    )
    hits = (
        probes.join(F.broadcast(words), "word_idx")
        .filter((F.col("word").bitwiseAND(F.col("mask"))) != 0)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") == k)
        .select(key)
    )
    return hits


def bloom_words_literal(words: DataFrame, m_bits: int) -> list[int]:
    """The filter as a dense word list (m_bits/32 Python ints): a
    BOUNDED driver collect — 2048 longs (16 KB) at the default m, the
    centroid-collect doctrine. This is what makes the probe a pure
    expression instead of a join."""
    dense = [0] * (m_bits // WORD_BITS)
    for r in words.collect():
        dense[int(r["word_idx"])] = int(r["word"])
    return dense


def bloom_member_expr(
    key: Column | str, dense_words: list[int], m_bits: int, k: int
) -> Column:
    """A boolean Column testing ``key`` against a collected filter —
    all k probes are ``element_at`` lookups into a LITERAL array, so
    membership evaluates inside whole-stage codegen at scan time:
    no explode, no join, NO SHUFFLE anywhere."""
    key = F.col(key) if isinstance(key, str) else key
    lit_words = F.array(*[F.lit(w).cast("long") for w in dense_words])
    h1, h2 = _h(key, "", m_bits), _h(key, ":b", m_bits)
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
        word = F.element_at(
            lit_words, (pos / WORD_BITS).cast("int") + F.lit(1)
        )
        # 2^bit is exact in double for bit <= 31 (32-bit words), so the
        # mask needs no shift-by-column support
        mask = F.pow(F.lit(2.0), F.pmod(pos, F.lit(WORD_BITS))).cast("long")
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    m_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """Fact rows whose key passes a Bloom filter of ``dim_keys`` — the
    scan-side prune to run BEFORE an exact join. Superset of the true
    semi-join (never drops a match); follow with the exact join to
    eliminate the false positives.

    At 100 TB: the filter build reads only the (already filtered)
    dimension keys; the filter itself is 16 KB, collected once
    (bounded) and inlined as a literal array, so the probe is a pure
    scan-time filter expression — the fact side is NEVER shuffled,
    exploded, or joined to pass the filter, and downstream joins move
    ~selectivity of the data instead of all of it. (The relation-join
    probe, ``bloom_pass_keys``, remains for filters too large to
    collect.)"""
    words = bloom_build(
        dim_keys.select(F.col(dim_key).alias("__bk")).distinct(),
        "__bk",
        m_bits,
        k,
    )
    dense = bloom_words_literal(words, m_bits)
    return fact.filter(bloom_member_expr(fact_key, dense, m_bits, k))
