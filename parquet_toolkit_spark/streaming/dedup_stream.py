"""Stateful streaming exact-dedup: emit each document's FIRST occurrence
across micro-batches, dropping later duplicates.

The reference is batch-only (SURVEY.md §2.8); this is the custom stateful
streaming operator a training-data ingest pipeline needs (dedup against
everything already ingested, not just within a batch). Implemented with
applyInPandasWithState: one state cell per content hash, so state size is
O(distinct docs) spread across the shuffle partitions of the hash key —
the standard scalable shape (state is partitioned, never driver-held).

Semantics: grouping key = sha256(text). Within a batch, the smallest
id wins (deterministic); across batches, only a never-seen hash emits.
State survives restarts via the checkpoint dir.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _emit_first(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        return  # hash already ingested in an earlier batch: drop all
    best = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        cand = pdf.loc[pdf["doc_id"].idxmin()]
        if best is None or cand["doc_id"] < best["doc_id"]:
            best = cand
    if best is None:
        return
    state.update((1,))
    yield pd.DataFrame({
        "content_sha": [key[0]],
        "doc_id": [int(best["doc_id"])],
        "text": [best["text"]],
    })


_SESS_MEMO: dict[tuple, tuple] = {}


def _child_session(spark: SparkSession, shuffle_partitions: int):
    """Child session (shared SparkContext, private SQLConf) pinned to a
    shuffle-partition override, memoized per (parent, count): session
    state (streaming query manager, listener bus) is built once, not per
    streaming call. The parent is pinned in the memo so id() can't be
    reused by a collected session."""
    key = (id(spark), shuffle_partitions)
    hit = _SESS_MEMO.get(key)
    if hit is not None:
        return hit[1]
    sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    _SESS_MEMO[key] = (spark, sess)
    return sess


def _stateful_partitions(spark: SparkSession, requested: int | None) -> int:
    """Partition count for python-stateful streaming operators.

    Two opposing costs: every partition pays per-micro-batch state-store
    machinery (open, delta write, commit — ~10-20 ms each), while the
    per-GROUP python handler roundtrips want parallelism. Full session
    width maximizes the former without helping the latter once
    partitions exceed the active python workers; measured on both
    stateful operators at two data shapes, half the default parallelism
    (bounded by the session setting) beat full width by ~20-30 % and
    tiny counts by ~40 %. Deployments with huge group cardinality per
    batch should pass `state_partitions` explicitly — it is fixed into
    the checkpoint at the query's first run."""
    if requested is not None:
        return max(1, requested)
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cores = spark.sparkContext.defaultParallelism
    return max(1, min(cur, max(4, cores // 2)))


def dedup_stream(spark: SparkSession, landing_dir: str, out_dir: str,
                 checkpoint_dir: str, schema_ddl: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 available_now: bool = True,
                 state_partitions: int | None = None):
    """Drain parquet files from landing_dir, appending only first-seen
    documents to out_dir. Returns the StreamingQuery (stopped when
    available_now). state_partitions: see _stateful_partitions; runs on
    a child session so the override never leaks to the caller."""
    sess = _child_session(spark, _stateful_partitions(spark, state_partitions))
    stream = sess.readStream.schema(schema_ddl).parquet(landing_dir)
    hashed = stream.select(
        F.sha2(F.col(text_col).cast("binary"), 256).alias("content_sha"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    deduped = hashed.groupBy("content_sha").applyInPandasWithState(
        _emit_first,
        outputStructType="content_sha STRING, doc_id LONG, text STRING",
        stateStructType="seen INT",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet").option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
