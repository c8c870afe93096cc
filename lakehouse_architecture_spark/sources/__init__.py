from lakehouse_architecture_spark.sources.tables import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_tables,
    register_views,
)
from lakehouse_architecture_spark.sources.readers import (  # noqa: F401
    read_csv_typed,
    read_parquet,
)
