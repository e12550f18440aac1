"""Layout + encode operators (the engine's Spark-facing surface)."""

from parquet_toolkit_spark.operators.layout import (  # noqa: F401
    compact,
    compact_in_place,
    estimate_bytes_per_row,
    rewrite,
    sort_by_key,
    split_by_size,
)
