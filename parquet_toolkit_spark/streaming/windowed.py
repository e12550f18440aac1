"""Watermarked windowed aggregation over a streaming events source.

The reference is batch-only (SURVEY.md §2.8); this supplies the
Structured Streaming surface a training-data pipeline needs for late-data
correct rollups: event-time tumbling windows + watermark, drained
synchronously for tests via availableNow + memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(spark: SparkSession, landing_dir: str,
                          schema_ddl: str,
                          window_len: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts",
                          query_name: str = "windowed_events") -> DataFrame:
    """Run a watermarked tumbling-window count over parquet files in
    `landing_dir`; drains available data synchronously and returns the
    result as a DataFrame (from the memory sink).

    Late rows older than the watermark are dropped by the engine — the
    streaming-correctness contract a 100TB ingest pipeline relies on.
    """
    stream = spark.readStream.schema(schema_ddl).parquet(landing_dir)
    agg = (
        stream.withColumn("_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # exact decimal accumulation -> deterministic, oracle-comparable
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
