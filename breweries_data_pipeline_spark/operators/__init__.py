from breweries_data_pipeline_spark.operators.clean import (  # noqa: F401
    add_literal,
    cast_columns,
    deduplicate,
    deduplicate_salted,
    drop_null_required,
    normalize_strings,
)
from breweries_data_pipeline_spark.operators.aggregate import (  # noqa: F401
    declarative_aggregate,
    grouped_count,
    union_views,
)
from breweries_data_pipeline_spark.operators.quality import (  # noqa: F401
    evaluate_rules,
    rules_dataframe,
)
