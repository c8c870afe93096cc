"""Training-data curation queries: dedup groups (connected components),
sequence packing, train/test contamination, repetition filtering.

These compose the pairwise dedup/similarity operators into the
decisions an LLM data pipeline actually ships: which docs to DROP
(components), how to BATCH the survivors (packing), whether eval data
LEAKED into train (contamination), and which docs are degenerate
(repetition). All relational; the one iterative algorithm (components)
is bounded label propagation with a recursive-CTE oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.components import (
    connected_components,
)
from lakehouse_architecture_spark.operators.dedup import normalize_text
from lakehouse_architecture_spark.operators.minhash import (
    ngram_jaccard_pairs,
    shingles,
)
from lakehouse_architecture_spark.operators.packing import (
    pack_greedy,
    whitespace_tokens,
)
from lakehouse_architecture_spark.queries.dedup_sim import (
    _SHC_CTE,
    _SHINGLES_CTE,
    MAX_DOC_FREQ,
)
from lakehouse_architecture_spark.queries.registry import query
from lakehouse_architecture_spark.queries.sampling import (
    _sql_bucket,
    hash_bucket,
)
from lakehouse_architecture_spark.queries.text import SQL_NORM
from lakehouse_architecture_spark.sources.tables import load_table

# --- dedup groups: connected components over near-dup edges ------------

_PAIRS_SQL = f"""
sizes AS (SELECT doc, COUNT(*) AS n FROM shc GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY a.doc, b.doc
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes za ON za.doc = doc_a
  JOIN sizes zb ON zb.doc = doc_b
  WHERE CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) >= 0.3
)
"""

COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
{_SHC_CTE},
{_PAIRS_SQL},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
nodes AS (SELECT DISTINCT s AS doc FROM edges),
reach AS (
  SELECT doc, doc AS r FROM nodes
  UNION
  SELECT e.d AS doc, reach.r FROM reach JOIN edges e ON e.s = reach.doc
)
SELECT doc AS doc_id, MIN(r) AS component
FROM reach GROUP BY doc ORDER BY doc_id
"""


@query("docs_dup_components", oracle=COMPONENTS_ORACLE)
def docs_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS: connected components (min-label propagation,
    operators/components.py) over exact n-gram Jaccard >= 0.3 edges;
    the oracle is the transitive closure as a recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.3, max_doc_freq=MAX_DOC_FREQ
    ).select("doc_a", "doc_b")
    labels = connected_components(edges)
    return labels.select(
        F.col("doc").alias("doc_id"), F.col("comp").alias("component")
    ).orderBy("doc_id")


# --- sequence packing ---------------------------------------------------

PACK_BUDGET = 2048  # power of two: cumsum/budget is exact in double
N_SHARDS = 16

PACKING_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         {_sql_bucket('doc_id', N_SHARDS)} AS shard
  FROM documents
)
SELECT doc_id, shard, n_tokens,
  CAST(FLOOR((SUM(n_tokens) OVER (
        PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
FROM t ORDER BY doc_id
"""


@query("docs_packing_manifest", oracle=PACKING_ORACLE)
def docs_packing_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget bin assignment (greedy per-shard running sum,
    operators/packing.py): one shuffle on the shard key, then pure
    window algebra — bins never cross shards, so packing 100 TB is
    embarrassingly parallel across shards."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        whitespace_tokens(F.col("text")).alias("n_tokens"),
        hash_bucket(F.col("doc_id"), N_SHARDS).alias("shard"),
    )
    packed = pack_greedy(
        t, "n_tokens", "doc_id", "shard", PACK_BUDGET
    )
    return packed.select("doc_id", "shard", "n_tokens", "pack_id").orderBy(
        "doc_id"
    )


# --- train/test contamination ------------------------------------------

CONTAMINATION_ORACLE = f"""
WITH {_SHINGLES_CTE},
tsh AS (SELECT doc, shingle FROM sh WHERE {_sql_bucket('doc')} < 10),
trn AS (SELECT DISTINCT shingle FROM sh WHERE {_sql_bucket('doc')} >= 10)
SELECT tsh.doc AS doc_id,
       COUNT(*) AS n_shingles,
       COUNT(trn.shingle) AS n_contaminated,
       ROUND(CAST(COUNT(trn.shingle) AS DOUBLE) / COUNT(*), 6)
         AS contamination
FROM tsh LEFT JOIN trn ON tsh.shingle = trn.shingle
GROUP BY tsh.doc ORDER BY doc_id
"""


@query("docs_test_contamination", oracle=CONTAMINATION_ORACLE)
def docs_test_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage audit: fraction of each held-out doc's 3-gram
    shingles that appear anywhere in the train split (same md5-bucket
    split as docs_hash_split_counts). The semi-join side carries only
    DISTINCT train shingles; at 100 TB swap in a bloom filter built
    from the same relation for a shuffle-free prefilter."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    test_sh = shingles(docs.filter(b < 10), "text", "doc_id")
    train_sh = (
        shingles(docs.filter(b >= 10), "text", "doc_id")
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    n_cont = F.count("hit")
    return (
        test_sh.join(train_sh, "shingle", "left_outer")
        .groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_cont.alias("n_contaminated"),
            F.round(n_cont.cast("double") / F.count(F.lit(1)), 6).alias(
                "contamination"
            ),
        )
        .orderBy("doc_id")
    )


# --- repetition / degeneracy scoring -----------------------------------

REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, str_split({SQL_NORM}, ' ') AS ts FROM documents
),
tok AS (SELECT doc_id, t AS token FROM toks, UNNEST(ts) AS u(t)),
counts AS (
  SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
)
SELECT doc_id,
  CAST(SUM(c) AS BIGINT) AS n_tokens,
  CAST(MAX(c) AS BIGINT) AS top_token_freq,
  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS repetition_ratio
FROM counts GROUP BY doc_id ORDER BY doc_id
"""


@query("docs_repetition_score", oracle=REPETITION_ORACLE)
def docs_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-text filter signal: most-frequent-token share per doc
    (boilerplate/spam detectors threshold on this). Two partial-agg
    groupBys, no UDF, no window over raw tokens."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("token"),
    )
    counts = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_token_freq"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                "repetition_ratio"
            ),
        )
        .orderBy("doc_id")
    )
