"""Layout + encode operators (the engine's Spark-facing surface)."""

from parquet_toolkit_spark.operators.binary_append import (  # noqa: F401
    append_by_schema,
    append_compact,
    append_files,
    split_row_groups,
    tree_merge,
)
from parquet_toolkit_spark.operators.layout import (  # noqa: F401
    compact,
    compact_in_place,
    estimate_bytes_per_row,
    rewrite,
    sort_by_key,
    split_by_size,
)
