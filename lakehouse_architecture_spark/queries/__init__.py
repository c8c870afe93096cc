"""Query surface: every operator from SURVEY.md §2 (plus the §2.11
generalizations and the LLM-data-pipeline operators) as a named query with
a DuckDB oracle twin.

Importing this package populates the registry.
"""

from lakehouse_architecture_spark.queries.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# Registration side effects:
from lakehouse_architecture_spark.queries import tpch  # noqa: F401,E402
from lakehouse_architecture_spark.queries import tpch_extra  # noqa: F401,E402
from lakehouse_architecture_spark.queries import relational  # noqa: F401,E402
from lakehouse_architecture_spark.queries import validation_queries  # noqa: F401,E402
from lakehouse_architecture_spark.queries import events  # noqa: F401,E402
from lakehouse_architecture_spark.queries import text  # noqa: F401,E402
from lakehouse_architecture_spark.queries import embeddings  # noqa: F401,E402
from lakehouse_architecture_spark.queries import dedup_sim  # noqa: F401,E402
from lakehouse_architecture_spark.queries import advanced  # noqa: F401,E402
from lakehouse_architecture_spark.queries import sampling  # noqa: F401,E402
from lakehouse_architecture_spark.queries import catalog_sql  # noqa: F401,E402
from lakehouse_architecture_spark.queries import curation  # noqa: F401,E402
from lakehouse_architecture_spark.queries import profiling  # noqa: F401,E402
