"""lakehouse_architecture_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference lakehouse (Amoako419/Lakehouse_Architecture):
typed ingestion, declarative rule-based validation with valid/rejected
splitting, referential-integrity anti-joins, deterministic PK dedup,
partitioned ACID-style upsert (MERGE with a Parquet fallback), and a SQL
query layer over curated tables — plus the large-scale training-data
operators (dedup families, similarity search, text analysis, multimodal
column plumbing) a 100 TB pipeline needs.

Everything is expressed as lazy DataFrame plans so Catalyst handles
predicate pushdown, column pruning, join strategy and AQE; Python UDFs are
confined to Arrow-batched pandas UDFs where built-ins genuinely cannot
express the semantics.
"""

__version__ = "0.1.0"

from lakehouse_architecture_spark.session import get_spark  # noqa: F401
