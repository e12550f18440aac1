"""Stateful streaming sessionization: per-user session counts that stitch
correctly ACROSS micro-batches.

The batch sessionizer (a LAG window) needs all events at once; the
streaming one carries per-user state in applyInPandasWithState, so a
session spanning two micro-batches is counted once — the canonical
custom-stateful-streaming operator. State is partitioned by user across
the shuffle (O(users), never driver-held).

Bounded disorder (VERDICT r3 #6): real landing feeds interleave files, so
events may arrive out of event-time order. Each user's state buffers the
TAIL of recent events — those within `lateness_s` of the user's max seen
timestamp — and only freezes (commits) session counts for events older
than that watermark. A late event landing inside the window merges into
the tail and session boundaries recompute exactly; an event older than
the frozen watermark fails loudly (it could silently split or merge an
already-committed session). lateness_s=0 restores strict-order behavior.

Each batch emits the user's running totals over ALL events seen (frozen +
tail); the latest emission per user (max batch_seq) is the final answer
and equals the batch sessionizer exactly whenever no event violated the
lateness bound (oracled in __spark_entry__.q_sessionize_stream).
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_NEG_INF = -(2 ** 62)


def _count_sessions(ts: list[int], prev: int | None, gap_s: int) -> int:
    """# of sessions STARTED by `ts` (sorted), given the previous event."""
    if not ts:
        return 0
    arr = np.asarray(ts, dtype=np.int64)
    n = int((np.diff(arr) > gap_s).sum())
    if prev is None or ts[0] - prev > gap_s:
        n += 1
    return n


def _make_handler(gap_s: int, lateness_s: int):
    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        ev = pd.concat(parts) if len(parts) > 1 else parts[0]
        new_ts = sorted(ev["ts_epoch"].astype("int64").tolist())

        if state.exists:
            frozen_wm, last_ev, n_sessions, n_events, batch_seq, tail = \
                state.get
            tail = list(tail or [])
        else:
            frozen_wm, last_ev = _NEG_INF, None
            n_sessions = n_events = batch_seq = 0
            tail = []

        # disorder beyond the lateness window: the event belongs to a
        # FROZEN region whose session boundaries are already committed —
        # recomputing would require unbounded state, so fail loudly. The
        # fix upstream is a larger lateness_s or ordering the feed.
        if new_ts[0] < frozen_wm:
            raise ValueError(
                f"sessionize_stream: user {key[0]!r} got out-of-order "
                f"event at t={new_ts[0]} BEFORE committed watermark "
                f"{frozen_wm} (lateness_s={lateness_s}); counts would "
                "corrupt — widen the window or order the landing feed"
            )

        merged = sorted(tail + new_ts)
        wm = merged[-1] - lateness_s
        k = bisect_right(merged, wm)
        frozen, tail = merged[:k], merged[k:]
        if frozen:
            n_sessions += _count_sessions(frozen, last_ev, gap_s)
            n_events += len(frozen)
            last_ev = frozen[-1]
            frozen_wm = max(frozen_wm, wm)
        batch_seq += 1
        state.update((int(frozen_wm),
                      None if last_ev is None else int(last_ev),
                      int(n_sessions), int(n_events), int(batch_seq),
                      [int(t) for t in tail]))
        # running totals INCLUDING the still-buffered tail
        disp_sessions = n_sessions + _count_sessions(tail, last_ev, gap_s)
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_sessions": [disp_sessions],
            "n_events": [n_events + len(tail)],
            "batch_seq": [batch_seq],
        })

    return update


def sessionize_stream(spark: SparkSession, landing_dir: str, out_dir: str,
                      checkpoint_dir: str, schema_ddl: str,
                      gap_s: int = 1800, lateness_s: int = 1800,
                      ts_col: str = "ts", user_col: str = "user_id",
                      id_col: str = "event_id",
                      available_now: bool = True,
                      state_partitions: int | None = None):
    """Drain event files from landing_dir, appending per-user running
    session totals to out_dir (latest batch_seq per user = final).
    Disorder within `lateness_s` of each user's max timestamp is
    buffered and resolved exactly; beyond it the stream fails loudly.
    state_partitions: see dedup_stream._stateful_partitions; runs on a
    child session so the override never leaks to the caller."""
    from parquet_toolkit_spark.streaming.dedup_stream import (
        _child_session,
        _stateful_partitions,
    )

    sess = _child_session(spark, _stateful_partitions(spark, state_partitions))
    stream = sess.readStream.schema(schema_ddl) \
        .option("maxFilesPerTrigger", 1).parquet(landing_dir)
    ev = stream.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").cast("long").alias("ts_epoch"),
        F.col(id_col).alias("event_id"),
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _make_handler(gap_s, lateness_s),
        outputStructType=(
            "user_id LONG, n_sessions LONG, n_events LONG, batch_seq LONG"
        ),
        stateStructType=(
            "frozen_wm LONG, last_ev LONG, n_sessions LONG, n_events LONG, "
            "batch_seq LONG, tail ARRAY<LONG>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet").option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def final_totals(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest running totals per user (max batch_seq row)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("batch_seq").desc())
    return (
        spark.read.parquet(out_dir)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "n_events")
    )
