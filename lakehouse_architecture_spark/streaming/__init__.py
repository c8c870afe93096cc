from lakehouse_architecture_spark.streaming.jobs import (  # noqa: F401
    stream_csv_ingest_merge,
    stream_hourly_counts,
    stream_sessionize,
)
