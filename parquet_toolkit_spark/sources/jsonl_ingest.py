"""JSONL (newline-delimited JSON) ingest — the dominant interchange
format for LLM training corpora (one document object per line, usually
gzipped shards).

Spark-first design notes (100 TB posture):

- **Schema is explicit by default.** `spark.read.json` without a schema
  runs a FULL inference pass over the input before the real read — at
  100 TB that is a second complete scan. Callers pass a DDL schema; when
  they genuinely can't, `infer=True` samples `sampling_ratio` of the
  input (one bounded pass) instead of scanning everything.
- **Corrupt lines quarantine, never poison.** PERMISSIVE mode captures
  unparseable lines in a corrupt-record column; `convert_jsonl` lands
  them in a `_quarantine/` sibling as raw text for offline triage and
  keeps the clean rows flowing — the reference's broken-file quarantine
  (F6, BrokenParquetFileHandler.java) applied at record granularity.
- **gz shards stream through Spark's codec layer** (extension-based), so
  `.jsonl.gz` paths need no special-casing. gzip is not splittable: one
  shard = one task, which is why training dumps ship as many shards —
  parallelism comes from the file count, matching that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def jsonl_to_df(spark: SparkSession, path: str,
                schema: str | None = None,
                infer: bool = False,
                sampling_ratio: float = 0.01,
                line_sep: str | None = None,
                keep_corrupt: bool = False) -> DataFrame:
    """Read JSONL (or .jsonl.gz) into a typed DataFrame.

    schema: DDL string ("doc_id long, text string, meta map<string,string>").
      Required unless infer=True — full-input schema inference is a
      hidden second scan at scale.
    infer: sample-based inference (`samplingRatio`) instead of a full
      pass; the INFERRED schema is still one bounded job.
    keep_corrupt: keep the corrupt-record column (raw line text for rows
      that failed to parse; null for clean rows) in the result instead
      of dropping it.
    """
    if schema is None and not infer:
        raise ValueError(
            "jsonl_to_df needs an explicit DDL schema (full-input "
            "inference is a second complete scan at scale); pass "
            "schema=... or opt into sampled inference with infer=True"
        )
    reader = (
        spark.read
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if line_sep:
        reader = reader.option("lineSep", line_sep)
    if schema is not None:
        # the corrupt column must be DECLARED in the schema for
        # PERMISSIVE capture to surface it
        reader = reader.schema(f"{schema}, {CORRUPT_COL} string")
    else:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    df = reader.json(path)
    if CORRUPT_COL not in df.columns:
        df = df.withColumn(CORRUPT_COL, F.lit(None).cast("string"))
    if not keep_corrupt:
        df = df.drop(CORRUPT_COL)
    return df


def convert_jsonl(spark: SparkSession, in_path: str, out_path: str,
                  schema: str,
                  compression: str = "zstd",
                  quarantine: str | None = None,
                  line_sep: str | None = None) -> dict:
    """JSONL -> Parquet with record-level quarantine.

    Clean rows land at `out_path` (columnar, typed); unparseable lines
    land VERBATIM as text at `quarantine` (default `<out_path>_quarantine`)
    so nothing is silently dropped. Returns {"rows": n, "bad": m}.

    Two scans, no caching: the clean pass is the PERMISSIVE typed read;
    the quarantine pass re-reads the source as TEXT and keeps lines
    `from_json` can't parse (Spark refuses to query only the
    corrupt-record column of a raw JSON read, and caching the parse is
    exactly what a 100 TB input can't afford — two streaming scans of
    the same shards beat one materialization).
    """
    df = jsonl_to_df(spark, in_path, schema=schema, line_sep=line_sep,
                     keep_corrupt=True)
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    (clean.write.mode("overwrite")
     .option("compression", compression).parquet(out_path))

    raw = spark.read
    if line_sep:
        raw = raw.option("lineSep", line_sep)
    # from_json in PERMISSIVE mode yields a row of nulls (not a null
    # struct) for corrupt input — declare the corrupt column inside the
    # parse schema and test that field instead
    parsed = F.from_json(
        F.col("value"), f"{schema}, {CORRUPT_COL} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    bad = (
        raw.text(in_path)
        .where(parsed.getField(CORRUPT_COL).isNotNull()
               & (F.length(F.trim(F.col("value"))) > 0))
        .select("value")
    )
    qdir = quarantine or (out_path.rstrip("/") + "_quarantine")
    n_bad = bad.count()
    if n_bad:
        bad.write.mode("overwrite").text(qdir)

    n_rows = spark.read.parquet(out_path).count()
    return {"rows": n_rows, "bad": n_bad,
            "quarantine": qdir if n_bad else None}
