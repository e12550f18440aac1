"""Incremental encode: new parquet files appearing in a landing directory
are encoded into the blob store as they arrive.

The reference is batch-only (SURVEY.md §2.8); this is the Spark-native
extension the north star anticipates ("incremental encode of new
partitions maps to readStream + foreachBatch"). Each micro-batch becomes
one or more encoded pids appended to the store; the manifest commit reads
only the batch's new pid dirs and unions them with the committed manifest
(O(batch) per batch — a stream's cost must not grow with store history).

Pid allocation: micro-batch pids continue after the current manifest max
(batch 0 starts at 0), so streamed partitions never collide with batch
ones.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_toolkit_spark.operators.encode import (
    ENCODED_SCHEMA,
    _encode_pdf,
    _schema_map,
    _write_encoded,
)


def incremental_encode(spark: SparkSession, landing_dir: str, enc_dir: str,
                       schema_ddl: str, checkpoint_dir: str,
                       run_id: str = "stream",
                       rows_per_pid: int = 250_000,
                       available_now: bool = True,
                       codec_profile: str = "fast"):
    """Start (and with available_now=True, drain) an incremental encode.

    codec_profile: "fast" (default) excludes bin_fsst — a stream's
    encode latency bounds its ingest rate, and FSST buys its 30%+ size
    wins with 10-25x the floor's encode CPU; batch re-encode (compaction
    through encode_pipeline) can upgrade the stored codec later.
    "small" competes every codec like the batch path.

    Returns the StreamingQuery (already stopped if available_now)."""
    if codec_profile not in ("fast", "small"):
        raise ValueError(f"unknown codec_profile {codec_profile!r}")
    exclude = frozenset({"bin_fsst"}) if codec_profile == "fast" \
        else frozenset()
    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from parquet_toolkit_spark.operators.encode import _manifest_arrow
        from parquet_toolkit_spark.sources.fs import DriverFS

        # one count job doubles as the emptiness check (isEmpty was a
        # second job per batch); base_pid comes from a driver-side arrow
        # manifest read instead of a Spark agg job
        n = batch_df.count()
        if n == 0:
            return
        mt = _manifest_arrow(DriverFS(spark), enc_dir, ["pid"])
        base_pid = 0
        if mt is not None and mt.num_rows:
            base_pid = max(mt.column("pid").to_pylist()) + 1
        schema_map = _schema_map(batch_df)
        n_parts = max(1, (n + rows_per_pid - 1) // rows_per_pid)
        laid = batch_df.repartition(n_parts)

        def encode_iter(batches):
            from pyspark import TaskContext

            parts = list(batches)
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            pid = base_pid + TaskContext.get().partitionId()
            yield _encode_pdf(pdf, pid, schema_map, f"{run_id}-e{epoch_id}",
                              exclude_codecs=exclude)

        encoded = laid.mapInPandas(encode_iter, ENCODED_SCHEMA)
        # pass the batch's pid range so the manifest commit reads ONLY the
        # just-written pid dirs and unions with the committed manifest —
        # O(batch) per micro-batch, not an O(store) rebuild (VERDICT r3 #3)
        _write_encoded(spark, encoded, enc_dir, schema_map, append_pids=True,
                       pids=list(range(base_pid, base_pid + n_parts)))

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def encode_iceberg_increment(spark: SparkSession, table_dir: str,
                             enc_dir: str,
                             rows_per_pid: int = 250_000,
                             codec_profile: str = "fast") -> dict:
    """One incremental run: encode into the blob store exactly the rows
    APPENDED to an Iceberg table since the last processed snapshot.

    The watermark is the store manifest itself — each run commits its
    pids with run_id "iceinc-<snapshot_id>", and the next run resumes
    after the highest such id. Because pids + manifest rows land in one
    atomic manifest swap, a crash either leaves the store at the old
    watermark (rerun re-encodes the same increment into fresh pids that
    REPLACE nothing — the old manifest still lacks the run, so no rows
    were committed twice) or at the new one: exactly-once without a side
    state file. Cost per run is O(new files) metadata + O(new rows)
    encode; non-append snapshots in range raise (incremental_scan).

    Returns {"rows", "snapshot_id", "pids"}."""
    from pyspark import TaskContext

    from parquet_toolkit_spark.sources.iceberg_compat import (
        incremental_scan,
        read_table_metadata,
    )

    if codec_profile not in ("fast", "small"):
        raise ValueError(f"unknown codec_profile {codec_profile!r}")
    exclude = frozenset({"bin_fsst"}) if codec_profile == "fast" \
        else frozenset()

    from parquet_toolkit_spark.operators.encode import _manifest_arrow
    from parquet_toolkit_spark.sources.fs import DriverFS

    mt = _manifest_arrow(DriverFS(spark), enc_dir, ["run_id", "pid"])
    last = None
    base_pid = 0
    if mt is not None and mt.num_rows:
        run_ids = mt.column("run_id").to_pylist()
        pid_vals = mt.column("pid").to_pylist()
        done = [int(r.split("-", 1)[1]) for r in run_ids
                if r is not None and r.startswith("iceinc-")]
        last = max(done) if done else None
        base_pid = max(pid_vals) + 1

    md = read_table_metadata(table_dir, spark)
    to_id = md["current_snapshot_id"]
    if to_id is None or to_id == last:
        return {"rows": 0, "snapshot_id": to_id, "pids": []}

    # allow_expired_from: expire_snapshots may have dropped the watermark
    # snapshot; recovery reads live entries committed after it instead of
    # wedging the pipeline forever (code-review r4)
    df = incremental_scan(spark, table_dir, last, to_id,
                          allow_expired_from=True)
    n = df.count()
    if n == 0:
        return {"rows": 0, "snapshot_id": to_id, "pids": []}
    schema_map = _schema_map(df)
    n_parts = max(1, (n + rows_per_pid - 1) // rows_per_pid)
    laid = df.repartition(n_parts)
    run_id = f"iceinc-{to_id}"

    def encode_iter(batches):
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 \
            else parts[0]
        pid = base_pid + TaskContext.get().partitionId()
        yield _encode_pdf(pdf, pid, schema_map, run_id,
                          exclude_codecs=exclude)

    encoded = laid.mapInPandas(encode_iter, ENCODED_SCHEMA)
    pids = list(range(base_pid, base_pid + n_parts))
    _write_encoded(spark, encoded, enc_dir, schema_map, append_pids=True,
                   pids=pids)
    return {"rows": n, "snapshot_id": to_id, "pids": pids}
