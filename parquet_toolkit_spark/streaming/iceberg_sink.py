"""Structured Streaming sink committing micro-batches to an Iceberg table.

The Spark-native landing path the north star's 10^12-file corpus needs:
a stream of new source-code rows appends to a filesystem Iceberg table
(pure-python commit layer, iceberg_compat.write_table) one snapshot per
micro-batch — which encode_iceberg_increment then drains into the blob
store at its own pace. Together they form the streaming ingestion chain:

    landing files -> [iceberg_stream_sink] -> Iceberg table
                  -> [encode_iceberg_increment] -> encoded blob store

Exactly-once without a side state file: every commit stamps the
snapshot summary with (sink id, epoch id). foreachBatch re-delivers an
epoch only after a failure BEFORE the streaming checkpoint advanced; on
redelivery the stamped snapshot already exists, the batch is skipped,
and no row lands twice. The sink id is derived from the checkpoint
location, so two independent streams into one table never collide.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame


def _sink_id(checkpoint_dir: str) -> str:
    return hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]


def committed_epochs(spark, table_dir: str, checkpoint_dir: str) -> set[int]:
    """Epoch ids this sink already committed to `table_dir` (from the
    snapshot summaries) — the idempotency watermark, readable for tests
    and ops."""
    from parquet_toolkit_spark.sources.iceberg_compat import (
        read_table_metadata,
    )

    sid = _sink_id(checkpoint_dir)
    try:
        md = read_table_metadata(table_dir, spark)
    except FileNotFoundError:
        return set()
    out = set()
    for s in md["snapshots"]:
        su = s.get("summary") or {}
        if su.get("streaming-sink-id") == sid:
            out.add(int(su["streaming-epoch-id"]))
    return out


def iceberg_stream_sink(stream_df: DataFrame, table_dir: str,
                        checkpoint_dir: str,
                        partition_by: list[str] | None = None,
                        available_now: bool = True):
    """Attach a streaming DataFrame to an Iceberg table as an append
    sink: one v2 append snapshot per non-empty micro-batch, idempotent
    across foreachBatch retries (see module docstring). partition_by
    declares the spec on the FIRST commit (identity or transforms,
    e.g. ["lang", "day(ts)"]); later batches inherit the table's spec.

    Returns the StreamingQuery (already drained if available_now)."""
    from parquet_toolkit_spark.sources.iceberg_compat import write_table

    spark = stream_df.sparkSession
    sid = _sink_id(checkpoint_dir)

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if int(epoch_id) in committed_epochs(spark, table_dir,
                                             checkpoint_dir):
            return  # redelivered epoch: snapshot already committed
        write_table(spark, batch_df, table_dir, partition_by=partition_by,
                    snapshot_props={"streaming-sink-id": sid,
                                    "streaming-epoch-id": int(epoch_id)})

    writer = (
        stream_df.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
