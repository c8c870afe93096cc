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
from lakehouse_architecture_spark.operators.minhash import (  # noqa: F401
    MinHashCorpusIndex,
    build_minhash_corpus_index,
    minhash_lsh_dedupe,
    minhash_lsh_incremental,
    minhash_lsh_incremental_indexed,
)
from lakehouse_architecture_spark.operators.components import (  # noqa: F401
    connected_components,
    dedup_keep_best_per_component,
    dedup_keep_one_per_component,
)
