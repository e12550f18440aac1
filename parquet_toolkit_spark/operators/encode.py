"""Columnar encode/decode pipeline with manifest + checkpoint-resume.

The north-rule core: layout (repartitionByRange + sortWithinPartitions,
reproducing the toolkit's merge/sort/split) → per-partition, per-column
codec-encoded blobs via Arrow-vectorized applyInPandas (never per-row
Python) → per-partition lineage/metrics manifest → resumable re-runs that
skip committed partitions (Spark-native analogue of the reference's
`alreadyMerged`/`brokenFiles` bookkeeping, merge/ParquetMergerImpl.java:
28-30, and its temp-suffix atomic commit, SimpleMergeThread.java:118-122 —
here atomicity comes from the parquet committer + dynamic partition
overwrite, so a re-encoded pid replaces its directory idempotently).

Two modes:
  encode_pipeline()     one job, layout+encode fused (fastest; bench path)
  layout_stage() + encode_partitions()   two phases through a staging dir
                        (checkpoint-resume path; staging doubles as the
                        toolkit-parity compacted+sorted table)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_toolkit_spark.operators.layout import estimate_bytes_per_row

ENCODED_SCHEMA = (
    "pid INT, column STRING, codec STRING, nrows BIGINT, bytes_in BIGINT, "
    "bytes_out BIGINT, checksum STRING, stats_json STRING, run_id STRING, "
    "blob BINARY"
)
MANIFEST_COLS = [
    "pid", "column", "codec", "nrows", "bytes_in", "bytes_out",
    "checksum", "stats_json", "run_id", "status",
]

DEFAULT_SORT_KEYS = ("repo", "path", "commit")
DEFAULT_RANGE_KEYS = ("repo", "path")


def _arrow_type_for(spark_type_json: str) -> pa.DataType | None:
    m = {
        "string": pa.large_string(), "binary": pa.large_binary(),
        "long": pa.int64(), "integer": pa.int32(), "short": pa.int16(),
        "byte": pa.int8(), "double": pa.float64(), "float": pa.float32(),
        "boolean": pa.bool_(), "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    return m.get(spark_type_json)


def _encode_pdf(pdf: pd.DataFrame, pid: int, schema_map: dict[str, str],
                run_id: str) -> pd.DataFrame:
    """One partition's rows -> one encoded row per column."""
    from parquet_toolkit_spark.codecs.chunk import from_arrow
    from parquet_toolkit_spark.codecs.selector import select_codec
    from parquet_toolkit_spark.runtime import tune_malloc

    tune_malloc()
    rows = []
    for col, stype in schema_map.items():
        at = _arrow_type_for(stype)
        arr = pa.Array.from_pandas(pdf[col], type=at)
        chunk = from_arrow(arr)
        codec, blob, stats = select_codec(chunk)
        rows.append({
            "pid": pid,
            "column": col,
            "codec": codec,
            "nrows": len(arr),
            "bytes_in": chunk.total_bytes(),
            "bytes_out": len(blob),
            "checksum": hashlib.sha256(blob).hexdigest(),
            "stats_json": json.dumps(stats),
            "run_id": run_id,
            "blob": blob,
        })
    return pd.DataFrame(rows)


def _schema_map(df: DataFrame, exclude: tuple[str, ...] = ("pid",)) -> dict[str, str]:
    return {
        f.name: f.dataType.typeName()
        for f in df.schema.fields
        if f.name not in exclude
    }


def plan_layout(df: DataFrame, target_bytes: int,
                range_keys: tuple[str, ...] = DEFAULT_RANGE_KEYS,
                sort_keys: tuple[str, ...] = DEFAULT_SORT_KEYS,
                n_partitions: int | None = None) -> tuple[DataFrame, int]:
    """Range-partition + sort the table into ~target_bytes partitions.

    Range partitioning on (repo, path) splits a skewed mega-repo across
    partitions by path ranges (Catalyst samples the key distribution), so
    layout skew is handled without salting; salting is for hash-based
    groupBy aggregations (see operators/skew.py).
    """
    if n_partitions is None:
        bpr = estimate_bytes_per_row(df)
        n_rows = df.count()
        n_partitions = max(1, math.ceil(bpr * n_rows / target_bytes))
    out = (
        df.repartitionByRange(n_partitions, *[F.col(k) for k in range_keys])
        .sortWithinPartitions(*[F.col(k) for k in sort_keys])
    )
    return out, n_partitions


def encode_pipeline(spark: SparkSession, df: DataFrame, out_dir: str,
                    target_bytes: int = 64 << 20,
                    range_keys: tuple[str, ...] = DEFAULT_RANGE_KEYS,
                    sort_keys: tuple[str, ...] = DEFAULT_SORT_KEYS,
                    run_id: str = "r0",
                    n_partitions: int | None = None) -> DataFrame:
    """Fused layout+encode in one Spark job. Returns the manifest DataFrame.

    mapInPandas accumulates the partition's Arrow batches (one partition ==
    one codec scope, per the north rule's per-partition symbol tables).
    """
    laid, _ = plan_layout(df, target_bytes, range_keys, sort_keys, n_partitions)
    schema_map = _schema_map(laid)

    def encode_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        pid = TaskContext.get().partitionId()
        yield _encode_pdf(pdf, pid, schema_map, run_id)

    encoded = laid.mapInPandas(encode_iter, ENCODED_SCHEMA)
    _write_encoded(spark, encoded, out_dir, schema_map)
    return read_manifest(spark, out_dir)


def layout_stage(spark: SparkSession, df: DataFrame, staging_dir: str,
                 target_bytes: int = 64 << 20,
                 range_keys: tuple[str, ...] = DEFAULT_RANGE_KEYS,
                 sort_keys: tuple[str, ...] = DEFAULT_SORT_KEYS,
                 n_partitions: int | None = None) -> int:
    """Phase A: write the laid-out table partitioned by deterministic pid.

    The staged table IS the toolkit-parity output (merged + sorted +
    size-targeted); pid directories give the resume unit."""
    laid, n_parts = plan_layout(df, target_bytes, range_keys, sort_keys, n_partitions)
    (
        laid.withColumn("pid", F.spark_partition_id())
        .write.mode("overwrite")
        .partitionBy("pid")
        .parquet(staging_dir)
    )
    return n_parts


def encode_partitions(spark: SparkSession, staging_dir: str, out_dir: str,
                      run_id: str = "r0", resume: bool = True,
                      fail_after: int | None = None) -> DataFrame:
    """Phase B: encode staged partitions, skipping committed ones (resume).

    fail_after=k encodes only k pending partitions then returns — the
    kill-after-k test hook (SURVEY.md §5.2 item 5).
    """
    staged = spark.read.parquet(staging_dir)
    schema_map = _schema_map(staged)
    all_pids = [r.pid for r in staged.select("pid").distinct().collect()]

    committed: set[int] = set()
    if resume:
        man = read_manifest(spark, out_dir)
        if man is not None:
            committed = {
                r.pid for r in man.where(F.col("status") == "committed")
                .select("pid").distinct().collect()
            }
    pending = sorted(set(all_pids) - committed)
    if fail_after is not None:
        pending = pending[:fail_after]
    if not pending:
        return read_manifest(spark, out_dir)

    sub = staged.where(F.col("pid").isin([int(p) for p in pending]))

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["pid"].iloc[0])
        return _encode_pdf(pdf.drop(columns=["pid"]), pid, schema_map, run_id)

    encoded = sub.groupBy("pid").applyInPandas(encode_group, ENCODED_SCHEMA)
    _write_encoded(spark, encoded, out_dir, schema_map, append_pids=True)
    return read_manifest(spark, out_dir)


def _write_encoded(spark: SparkSession, encoded: DataFrame, out_dir: str,
                   schema_map: dict[str, str], append_pids: bool = False) -> None:
    blobs_dir = os.path.join(out_dir, "blobs")
    # dynamic overwrite: only re-encoded pid directories are replaced
    # (idempotent resume); static mode wipes the whole store first
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode",
        "dynamic" if append_pids else "static",
    )
    encoded.write.mode("overwrite").partitionBy("pid").parquet(blobs_dir)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_schema.json"), "w") as fh:
        json.dump(schema_map, fh)

    # manifest derives from the blob store (column-pruned scan: the binary
    # blob column is never read), so it is always consistent with it
    man = (
        spark.read.parquet(blobs_dir)
        .select("pid", "column", "codec", "nrows", "bytes_in", "bytes_out",
                "checksum", "stats_json", "run_id")
        .withColumn("status", F.lit("committed"))
    )
    man.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "manifest"))


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, "manifest")
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def decode_pipeline(spark: SparkSession, enc_dir: str,
                    keep_pid: bool = False) -> DataFrame:
    """Blob store -> original table (bit-identical columns)."""
    with open(os.path.join(enc_dir, "_schema.json")) as fh:
        schema_map: dict[str, str] = json.load(fh)
    blobs = spark.read.parquet(os.path.join(enc_dir, "blobs"))

    out_fields = ", ".join(f"`{c}` {t}" for c, t in schema_map.items())
    out_schema = (f"pid INT, {out_fields}") if keep_pid else out_fields

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from parquet_toolkit_spark.codecs.chunk import to_arrow
        from parquet_toolkit_spark.codecs.container import decode_blob
        from parquet_toolkit_spark.runtime import tune_malloc

        tune_malloc()
        cols = {}
        nrows = 0
        for _, row in pdf.iterrows():
            chunk = decode_blob(bytes(row["blob"]))
            arr = to_arrow(chunk)
            cols[row["column"]] = arr
            nrows = len(arr)
        data = {}
        if keep_pid:
            data["pid"] = pd.Series([int(pdf["pid"].iloc[0])] * nrows)
        for c in schema_map:
            data[c] = cols[c].to_pandas()
        return pd.DataFrame(data)

    return blobs.groupBy("pid").applyInPandas(decode_group, out_schema)


def verify_roundtrip(original: DataFrame, decoded: DataFrame,
                     key_cols: tuple[str, ...] = ("repo", "path", "commit"),
                     content_col: str = "content") -> dict:
    """Per-row sha256(content) equality keyed by (repo, path, commit).

    The north-rule invariant (BASELINE.json input_hint). Runs as one
    distributed join — no driver materialization."""
    o = original.select(
        *key_cols, F.sha2(F.col(content_col).cast("binary"), 256).alias("sha_o")
    )
    d = decoded.select(
        *key_cols, F.sha2(F.col(content_col).cast("binary"), 256).alias("sha_d")
    )
    joined = o.join(d, on=list(key_cols), how="full_outer")
    agg = joined.agg(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("sha_o").isNull() | F.col("sha_d").isNull(), 1)
              .otherwise(0)).alias("missing"),
        F.sum(F.when(F.col("sha_o") != F.col("sha_d"), 1).otherwise(0)).alias("mismatch"),
    ).first()
    return {"rows": agg.rows, "missing": agg.missing or 0,
            "mismatch": agg.mismatch or 0,
            "ok": (agg.missing or 0) == 0 and (agg.mismatch or 0) == 0}


def encoded_size_report(spark: SparkSession, enc_dir: str) -> dict:
    """Total encoded bytes vs raw bytes from the manifest."""
    man = read_manifest(spark, enc_dir)
    row = man.agg(
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
        F.countDistinct("pid").alias("n_partitions"),
    ).first()
    return {
        "bytes_in": row.bytes_in, "bytes_out": row.bytes_out,
        "ratio": (row.bytes_out or 0) / max(1, row.bytes_in or 1),
        "n_partitions": row.n_partitions,
    }
