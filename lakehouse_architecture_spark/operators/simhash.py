"""SimHash document fingerprinting (Charikar 2002; Manku et al. WWW'07),
expressed with relational primitives only so Spark and a SQL oracle agree
bit-for-bit.

Per doc: hash every distinct token; for each fingerprint bit position,
sum +1/-1 votes across tokens (+1 if the token's hash has that bit set);
the sign of each sum is the fingerprint bit. Near-dup candidates =
fingerprints within small Hamming distance.

Portability trick: token "hash" bits are drawn from md5 hex digits —
bit j of token t = (hexdigit_{j/4}(md5(t)) >> (3 - j%4)) & 1 — integer
ops every engine has. FINGERPRINT_BITS=16 keeps the exploded
(doc × token × bit) relation compact; production would use 64 bits via
xxhash64 (same plan shape, Spark-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.dedup import normalize_text

FINGERPRINT_BITS = 16
_HEX = "0123456789abcdef"


def _token_bit(tok_hash, bit):
    """Bit ``bit`` of the md5-derived hash (Column exprs)."""
    nibble = F.floor(bit / 4).cast("int")
    # substr position is 1-based: nibble index + 1
    digit = tok_hash.substr(nibble + F.lit(1), F.lit(1))
    val = F.conv(digit, 16, 10).cast("int")
    # shiftright with a Column shift amount isn't in the API; values are
    # tiny (val < 16, shift <= 3) so exact floor-div arithmetic works
    shift = (F.lit(3) - (bit % 4)).cast("double")
    return F.floor(val / F.pow(F.lit(2.0), shift)).cast("int") % 2


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, bits: int = FINGERPRINT_BITS
) -> DataFrame:
    """(doc, simhash) — integer fingerprint per document."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
        ).alias("tok"),
    )
    hashed = toks.select("doc", F.md5(F.col("tok")).alias("h"))
    with_bits = hashed.select(
        "doc", "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    )
    votes = with_bits.select(
        "doc",
        "bit",
        (2 * _token_bit(F.col("h"), F.col("bit")) - 1).alias("vote"),
    )
    bit_vals = votes.groupBy("doc", "bit").agg(
        F.when(F.sum("vote") > 0, 1).otherwise(0).alias("bit_val")
    )
    return bit_vals.groupBy("doc").agg(
        F.sum(
            F.col("bit_val")
            * F.pow(F.lit(2.0), F.col("bit").cast("double")).cast("long")
        )
        .cast("long")
        .alias("simhash")
    )


def hamming_distance(a, b):
    """Popcount of XOR via Spark's bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 2,
    bits: int = FINGERPRINT_BITS,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within ``max_hamming``.

    Candidate generation groups on fingerprint halves (pigeonhole: any
    pair within distance d must agree exactly on at least one of d+1
    segments) — here 2 segments for d<=1-per-segment behavior, which at
    16 bits is a fine bucket key; production-64-bit uses 4 segments.
    """
    fp = simhash_fingerprints(df, text_col, id_col, bits)
    half = bits // 2
    seg = fp.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("seg"), (F.col("simhash") % (1 << half)).alias("key")),
                F.struct(F.lit(1).alias("seg"), F.shiftright(F.col("simhash"), half).alias("key")),
            )
        ).alias("s"),
    ).select("doc", "simhash", F.col("s.seg").alias("seg"), F.col("s.key").alias("key"))
    a, b = seg.alias("a"), seg.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.select(
            "doc_a",
            "doc_b",
            hamming_distance(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
