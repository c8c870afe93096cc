"""KMV (k-minimum-values) distinct sketches — the set-algebra sketch.

The sketch of a set is the k SMALLEST values of a uniform hash of its
elements. It estimates distinct cardinality like HLL ((k-1)/kth-min),
but unlike HLL it supports DIRECT intersection estimation: the k-min
of A∪B is computable from the two sketches alone (k-min of the merged
arrays — a standard KMV closure property), and the fraction of that
union sketch present in BOTH input sketches is an unbiased Jaccard
estimate, so |A∩B| ≈ jaccard × |A∪B|. This is the theta/KMV-style
estimator the HLL QA query (``events_hll_intersection_qa``) documents
as the fix for small intersections, where HLL inclusion-exclusion's
error — absolute in the INPUT sizes — swamps the answer (measured
negative estimates at sf0.01). Cited reference behavior: the same
k-min closure DataSketches' theta sketches use for set operations
(public algorithm; Beyer et al., SIGMOD'07).

Hashing follows the repo's cross-engine md5 idiom (the minhash /
sign-LSH / ab-test arm family): the first 13 hex chars of md5 as a
52-bit integer — exact in BIGINT and in double on both engines, so a
DuckDB oracle reproduces every sketch bit-for-bit.

Scale shape: sketches build from the DISTINCT (group, hash) grain with
a TWO-STAGE top-k — a per-physical-partition window caps each
partition's contribution at k rows, then the per-group window sorts at
most k·partitions rows. Without the pre-pass, a low-cardinality group
column (the common case: a handful of named audiences) funnels every
distinct hash through one reducer — the last-reducer curse. The
result is deterministic regardless of partitioning: the global k-min
is contained in the union of per-partition k-mins. At 100 TB the
sketch relation (|groups| rows × k longs) is the thing you PERSIST —
daily sketches are unioned/intersected without rescanning raw events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_SPACE = float(1 << 52)  # hash domain size; 255*2^52 is double-exact


def kmv_hash(col: Column) -> Column:
    """52-bit uniform hash: first 13 md5 hex chars as a BIGINT (the
    repo-wide cross-engine idiom — DuckDB twin:
    ``CAST(('0x' || substr(md5(x), 1, 13)) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("long")


def kmv_sketch_by(hs: DataFrame, group_col: str, k: int) -> DataFrame:
    """(group, kmv array, n) from a DISTINCT (group, h) relation.

    ``kmv`` is the sorted array of the k smallest hashes; ``n`` the
    group's exact distinct-hash count (callers compare it against k to
    pick the exact-vs-estimated branch). Two-stage top-k as described
    in the module docstring.
    """
    w1 = Window.partitionBy(group_col, "pid").orderBy("h")
    w2 = Window.partitionBy(group_col).orderBy("h")
    topk = (
        hs.withColumn("pid", F.spark_partition_id())
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .drop("pid", "r1")
        .withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= k)
        .drop("r2")
    )
    counts = hs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    sk = topk.groupBy(group_col).agg(
        F.sort_array(F.collect_list("h")).alias("kmv")
    )
    return sk.join(counts, group_col)


def kmv_estimate(n: Column, kmv: Column, k: int) -> Column:
    """Distinct estimate: exact below k, else (k-1)·SPACE / kth-min.

    Closed-form double math over exact integers — bit-identical
    cross-engine (the chi2/z-test doctrine), compared after round(6).
    """
    kth = F.get(kmv, k - 1)  # NULL-safe (no ANSI out-of-bounds throw)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1) * KMV_SPACE) / kth
    )


def kmv_estimate_from_sketch(kmv: Column, k: int) -> Column:
    """Distinct estimate from the sketch ALONE — the MERGEABLE form
    (streamed/stored states hold only the sketch): an UNSATURATED
    sketch (size < k) contains EVERY distinct hash by construction, so
    its size is the exact count; at size == k the closed form applies.
    Equals :func:`kmv_estimate` whenever that function's ``n`` is the
    true distinct count, without needing ``n`` to be carried — which a
    batch-folded state cannot do exactly once the sketch saturates."""
    sz = F.size(kmv)
    kth = F.get(kmv, k - 1)
    return F.when(sz < k, sz.cast("double")).otherwise(
        F.lit(float(k - 1) * KMV_SPACE) / kth
    )


def kmv_union(kmv_a: Column, kmv_b: Column, k: int) -> Column:
    """Sketch of A∪B from the two sketches: k smallest of the merged
    arrays (valid because every element of the union's true k-min set
    is in one side's k-min set)."""
    return F.slice(F.array_sort(F.array_union(kmv_a, kmv_b)), 1, k)


def kmv_matches(kmv_a: Column, kmv_b: Column, union_kmv: Column) -> Column:
    """Union-sketch elements present in BOTH input sketches — the
    Jaccard-estimator numerator (shared by the estimate and any QA
    column displaying it, so the two can't drift apart)."""
    return F.size(
        F.array_intersect(F.array_intersect(union_kmv, kmv_a), kmv_b)
    )


def kmv_intersect_estimate(
    kmv_a: Column, kmv_b: Column, union_kmv: Column, union_est: Column
) -> Column:
    """|A∩B| estimate: (matches in the union sketch) / |union sketch|
    × est(A∪B). When the union has fewer than k distinct hashes the
    union sketch IS the union and the estimate collapses to the exact
    intersection — the estimator degrades to exactness, never to
    noise. An EMPTY union (both sides empty) estimates 0, not NaN."""
    matches = kmv_matches(kmv_a, kmv_b, union_kmv)
    sz = F.size(union_kmv)
    return F.when(sz == 0, F.lit(0.0)).otherwise(
        matches.cast("double") * union_est / sz
    )
