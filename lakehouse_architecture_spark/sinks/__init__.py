from lakehouse_architecture_spark.sinks.writers import (  # noqa: F401
    merge_upsert,
    write_partitioned,
    append_rejected,
)
