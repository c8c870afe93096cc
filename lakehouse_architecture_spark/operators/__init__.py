from lakehouse_architecture_spark.operators.validation import (  # noqa: F401
    ForeignKeyRule,
    NotNullRule,
    PositiveRule,
    RangeRule,
    Rule,
    rules_from_schema,
    validate,
)
from lakehouse_architecture_spark.operators.dedup import (  # noqa: F401
    dedupe_by_key,
    exact_dedupe,
)
