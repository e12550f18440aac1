"""Layout + encode operators (the engine's Spark-facing surface)."""

from parquet_toolkit_spark.operators.layout import (  # noqa: F401
    compact,
    estimate_bytes_per_row,
    sort_by_key,
    split_by_size,
)
