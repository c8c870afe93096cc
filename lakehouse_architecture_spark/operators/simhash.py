"""SimHash document fingerprinting (Charikar 2002; Manku et al. WWW'07),
expressed with relational primitives only so Spark and a SQL oracle agree
bit-for-bit.

Per doc: hash every distinct token; for each fingerprint bit position,
sum +1/-1 votes across tokens (+1 if the token's hash has that bit set);
the sign of each sum is the fingerprint bit. Near-dup candidates =
fingerprints within small Hamming distance.

Portability trick: token "hash" bits are drawn from md5 hex digits —
bit j of token t = (hexdigit_{j/4}(md5(t)) >> (3 - j%4)) & 1 — integer
ops every engine has. FINGERPRINT_BITS=16 keeps the per-doc expression
tree compact; production would use 64 bits via xxhash64 (same plan
shape, Spark-only).

Scale shape: the fingerprint is a PURE PROJECTION — per-doc array
aggregates over the token md5 array, no explode and no shuffle (the
SQL oracle keeps the exploded doc × token × bit formulation; both
compute the same votes). The only shuffles in the near-pair pipeline
are the segment-bucket groupBy and the candidate distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.dedup import normalize_text
from lakehouse_architecture_spark.operators.partitioning import spread_scan

FINGERPRINT_BITS = 16


def _token_bit(tok_hash, bit: int):
    """Bit ``bit`` (Python int) of the md5-derived hash: constant
    nibble/shift folded at plan-build time."""
    nibble = bit // 4
    digit = tok_hash.substr(nibble + 1, 1)  # substr is 1-based
    val = F.conv(digit, 16, 10).cast("int")
    return F.shiftright(val, 3 - bit % 4) % 2


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, bits: int = FINGERPRINT_BITS
) -> DataFrame:
    """(doc, simhash) — integer fingerprint per document, map-side.

    The md5 array is materialized in its own projection so each token is
    hashed ONCE; the per-bit vote sums are then ``aggregate`` folds over
    that array — the same (token × bit) work the exploded formulation
    does, minus its two aggregation exchanges.
    """
    toks = spread_scan(df).select(
        F.col(id_col).alias("doc"),
        F.array_distinct(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "toks"
        ),
    )
    hashed = toks.select(
        "doc", F.transform("toks", lambda t: F.md5(t)).alias("hs")
    )

    def bit_term(b: int):
        vote = F.aggregate(
            "hs",
            F.lit(0),
            lambda acc, h: acc + (2 * _token_bit(h, b) - 1),
        )
        return F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))

    simhash = bit_term(0)
    for b in range(1, bits):
        simhash = simhash + bit_term(b)
    return hashed.select("doc", simhash.cast("long").alias("simhash"))


def hamming_distance(a, b):
    """Popcount of XOR via Spark's bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 2,
    bits: int = FINGERPRINT_BITS,
    cache_key: object = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within ``max_hamming``.

    Candidate generation groups on fingerprint halves (pigeonhole: any
    pair within distance d must agree exactly on at least one of d+1
    segments) — here 2 segments for d<=1-per-segment behavior, which at
    16 bits is a fine bucket key; production-64-bit uses 4 segments.
    Bucketing reuses :func:`minhash.candidate_pairs` (collect per
    bucket, pair array-side); the few surviving candidates then re-join
    the fingerprint relation — small side broadcast by AQE — to score
    Hamming distance.
    """
    from lakehouse_architecture_spark.operators.caching import one_slot_persist
    from lakehouse_architecture_spark.operators.minhash import candidate_pairs

    # one-slot persisted (operators/caching): the fingerprint relation
    # feeds the band explode and both score-join sides; bounded across
    # sessions, warm across same-cache_key calls
    fp = one_slot_persist(
        simhash_fingerprints(df, text_col, id_col, bits),
        slot="simhash-fingerprints",
        key=None if cache_key is None else (cache_key, bits),
    )
    half = bits // 2
    seg = fp.select(
        "doc",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    (F.col("simhash") % (1 << half)).cast("string").alias("band_key"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.shiftright(F.col("simhash"), half).cast("string").alias("band_key"),
                ),
            )
        ).alias("s"),
    ).select("doc", "s.band", "s.band_key")
    pairs = candidate_pairs(seg)
    # shuffle-hash hint on the fingerprint side: the candidate relation
    # has no usable static size estimate (generate output) and CAN be
    # quadratic on dup-heavy corpora — without the hint Catalyst chose
    # it as a broadcast build and OOMed at a 100k-doc stress (19M
    # candidates); the fingerprint side is one 16-byte row per doc.
    fa = fp.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a")
    ).hint("shuffle_hash")
    fb = fp.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b")
    ).hint("shuffle_hash")
    return (
        pairs.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            hamming_distance(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
