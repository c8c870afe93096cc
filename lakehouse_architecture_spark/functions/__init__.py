from lakehouse_architecture_spark.functions.numeric import (  # noqa: F401
    dsum,
    dsum_expr,
    davg,
    round6,
)
