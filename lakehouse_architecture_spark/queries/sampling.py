"""Deterministic sampling and cohort analytics for training-data curation.

Random sampling (``df.sample``) is not reproducible across engines or
re-runs with different partitioning; a training pipeline needs SPLITS
THAT NEVER MOVE — a document's split must be a pure function of its id.
These queries bucket rows by the first 8 hex digits of ``md5(id)``
(uniform in [0, 2^32)), so Spark, DuckDB, and any future engine agree
row-for-row, and adding data never reassigns existing rows.

At 100 TB this is also the efficient plan: the bucket is computed in the
scan's projection (no shuffle, no sort, no global coordination), and a
split filter prunes before anything downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.dedup import content_hash
from lakehouse_architecture_spark.queries.registry import query
from lakehouse_architecture_spark.sources.tables import load_table


def hash_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, n_buckets): md5-prefix mod n."""
    hex8 = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % n_buckets).alias("bucket")


def _sql_bucket(id_expr: str, n_buckets: int = 100) -> str:
    return (
        f"(CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {n_buckets})"
    )


SPLIT_ORACLE = f"""
SELECT lang, split, COUNT(*) AS n_docs
FROM (
  SELECT lang,
    CASE WHEN {_sql_bucket('doc_id')} < 80 THEN 'train'
         WHEN {_sql_bucket('doc_id')} < 90 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
) t
GROUP BY lang, split
ORDER BY lang, split
"""


@query("docs_hash_split_counts", oracle=SPLIT_ORACLE)
def docs_hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment as a pure function of doc_id,
    audited as counts per (lang, split)."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return (
        docs.select("lang", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


SAMPLE_ORACLE = f"""
SELECT source, doc_id
FROM documents
WHERE {_sql_bucket('doc_id')} < 10
ORDER BY source, doc_id
"""


@query("docs_stratified_sample", oracle=SAMPLE_ORACLE)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample (bucket < 10): stable under re-runs,
    data growth, and engine choice — listed per source for audit."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(hash_bucket(F.col("doc_id")) < 10)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT cohort_date,
  CAST(FLOOR(date_diff('day', cohort_date, d) / 7) AS BIGINT) AS week_offset,
  COUNT(DISTINCT activity.user_id) AS n_users
FROM activity JOIN firsts ON activity.user_id = firsts.user_id
GROUP BY cohort_date, week_offset
ORDER BY cohort_date, week_offset
"""


@query("events_retention_cohorts", oracle=RETENTION_ORACLE)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen date, counted per
    week offset of later activity.

    Two aggregations over events (first-seen, distinct activity) joined
    on user_id — both shuffle on user_id so AQE reuses the exchange; the
    final regroup is on the tiny (cohort, offset) grid.
    """
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_date")
    )
    activity = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_date",
            F.floor(F.datediff("d", "cohort_date") / 7).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_date", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_date", "week_offset")
    )


# Corpus-mixture spec: per-source keep percentage (the "data mix" a
# pre-training run pins down — e.g. curated sources kept whole, bulk web
# downsampled). Expressed as DATA (a tiny dimension relation), not code,
# so the same spec drives Spark, the SQL oracle, and any audit query.
MIXTURE_SPEC = [
    (f"src{i}", 100 if i < 5 else 50 if i < 10 else 20) for i in range(20)
]

_SPEC_VALUES = ", ".join(f"('{s}', {p})" for s, p in MIXTURE_SPEC)

MIXTURE_ORACLE = f"""
WITH spec(source, keep_pct) AS (VALUES {_SPEC_VALUES})
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN {_sql_bucket('doc_id')} < COALESCE(keep_pct, 100)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN spec ON d.source = spec.source
GROUP BY d.source
ORDER BY d.source
"""


@query("docs_mixture_resample", oracle=MIXTURE_ORACLE)
def docs_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus-mixture resampling: each source keeps
    ``keep_pct`` percent of its documents, selected by the same
    never-moves md5 bucket as the train/val/test split (a doc stays
    in or out of the mix forever, across engines and re-runs).

    Scale shape: the spec is a broadcast dimension (tens of rows) joined
    into the scan projection — membership is decided map-side with no
    shuffle; the only exchange is the per-source audit aggregation.
    Unknown sources default to keep (COALESCE 100) so a new crawl
    appearing mid-run is never silently dropped.
    """
    docs = load_table(spark, sf_dir, "documents")
    spec = spark.createDataFrame(MIXTURE_SPEC, "source string, keep_pct int")
    b = hash_bucket(F.col("doc_id"))
    kept = F.when(b < F.coalesce("keep_pct", F.lit(100)), 1).otherwise(0)
    return (
        docs.join(F.broadcast(spec), "source", "left")
        .select("source", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


# Weighted sampling without replacement (Efraimidis-Spirakis): each row
# draws a deterministic uniform u from its md5 id-hash and competes with
# key = -ln(u) / weight; the k smallest keys ARE a weighted sample
# without replacement. Same never-moves property as the hash splits —
# the draw is a pure function of doc_id — and the same scale shape: the
# key is computed in the scan projection and selection is a distributed
# TakeOrdered (orderBy+limit), no shuffle of the corpus, no global sort.
WEIGHTED_SAMPLE_ORACLE = """
WITH s AS (
  SELECT doc_id,
         GREATEST(LENGTH(text), 1) AS weight,
         -LN((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) + 1) / 4294967297.0)
           / GREATEST(LENGTH(text), 1) AS k
  FROM documents
)
SELECT doc_id, weight FROM s ORDER BY k, doc_id LIMIT 25
"""


@query("docs_weighted_sample_topk", oracle=WEIGHTED_SAMPLE_ORACLE)
def docs_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25 documents drawn length-weighted without replacement — the
    deterministic mixture-building primitive (upsample long documents,
    or swap in any quality/domain weight column): selection probability
    is proportional to weight, yet the draw never moves across re-runs
    or engines because u comes from md5(doc_id), not a RNG. The
    compared surface is integer-only (doc_id, weight); the ln/division
    float key only ORDERS rows, and distinct ids give distinct md5
    draws, so the cross-engine boundary is never within float error."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1
    ) / F.lit(4294967297.0)
    weight = F.greatest(F.length("text"), F.lit(1))
    key = -F.ln(u) / weight
    return (
        docs.select("doc_id", weight.alias("weight"), key.alias("k"))
        .orderBy(F.asc("k"), F.asc("doc_id"))
        .limit(25)
        .select("doc_id", "weight")
    )


# DuckDB twin of operators.dedup.normalize_text (shared with text.py's
# exact-dup family — the leakage audit must cluster on the SAME
# canonical form the dedup ladder uses, or the two reports disagree).
_SQL_NORM = (
    "TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)

LEAKAGE_ORACLE = f"""
WITH per AS (
  SELECT md5({_SQL_NORM}) AS h,
         CASE WHEN {_sql_bucket('doc_id')} < 80 THEN 'train'
              WHEN {_sql_bucket('doc_id')} < 90 THEN 'val'
              ELSE 'test' END AS split,
         COUNT(*) AS ns
  FROM documents
  GROUP BY 1, 2
),
g AS (
  SELECT h, SUM(ns) AS n, COUNT(*) AS n_splits,
         SUM(ns * (ns - 1) // 2) AS within
  FROM per GROUP BY h
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_content_groups,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_groups,
       CAST(SUM(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_spanning_groups,
       CAST(SUM(n * (n - 1) // 2 - within) AS BIGINT) AS leaky_pairs,
       CAST(SUM(within) AS BIGINT) AS within_split_pairs
FROM g
"""


@query("docs_split_leakage_audit", oracle=LEAKAGE_ORACLE)
def docs_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test leakage audit over exact-duplicate content: a
    duplicated document whose copies land in DIFFERENT splits leaks
    evaluation data into training — the failure mode dedup-unaware
    hash splits silently create. Clusters come from the same
    normalized content hash the dedup ladder uses
    (``operators.dedup.content_hash``), splits from the same
    never-moves md5 bucket as ``docs_hash_split_counts``, so this
    report composes with both. Emits one summary row: content groups,
    duplicated groups, groups spanning >1 split, and the cross-split
    (leaky) vs within-split duplicate-pair counts — pure integers.

    Scale shape: two hash-partitioned aggregations (group by
    (hash, split), then by hash) and a 1-row combine; pair counts are
    computed arithmetically per group (``C(n,2) - Σ C(n_s,2)``), never
    by materializing pairs — linear at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    per = (
        docs.select(
            content_hash(F.col("text")).alias("h"), split.alias("split")
        )
        .groupBy("h", "split")
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    g = per.groupBy("h").agg(
        F.sum("ns").alias("n"),
        F.count(F.lit(1)).alias("n_splits"),
        F.sum(F.expr("ns * (ns - 1) DIV 2")).alias("within"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_content_groups"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_groups"),
        F.sum(F.when(F.col("n_splits") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_spanning_groups"),
        F.sum(F.expr("n * (n - 1) DIV 2 - within")).alias("leaky_pairs"),
        F.sum("within").alias("within_split_pairs"),
    )


SAMPLE_TOPK_ORACLE = """
SELECT source, rk, doc_id FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
) t
WHERE rk <= 5
"""


@query("docs_sample_topk_per_source", oracle=SAMPLE_TOPK_ORACLE)
def docs_sample_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample (k=5 per source): the rows with
    the k smallest md5(doc_id) draws — a never-moves uniform sample,
    reproducible across engines and re-runs like every split in this
    module.

    Scale shape: the naive plan (one ROW_NUMBER window partitioned by
    source) funnels each source's ENTIRE row set through one sorter —
    the low-cardinality trap, since sources number in the tens. This
    runs the two-phase top-k instead: a first window over
    (source, salt) keeps k rows per salt (64 salts), then the global
    per-source window ranks the ≤ 64·k survivors — correct for any
    salt assignment because the global top-k is contained in the union
    of per-salt top-ks. The ORACLE is the naive single-window form, so
    the gate proves the two-phase plan row-identical to it."""
    k = 5
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    salt = F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(64))
    w1 = Window.partitionBy("source", "salt").orderBy("h", "doc_id")
    w2 = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.select(
            "source", "doc_id", h.alias("h"), salt.alias("salt")
        )
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("source", F.col("rk").cast("long").alias("rk"), "doc_id")
    )
