from lakehouse_architecture_spark.plans.pipeline import (  # noqa: F401
    cast_to_schema,
    process_dataset,
    run_pipeline,
)
