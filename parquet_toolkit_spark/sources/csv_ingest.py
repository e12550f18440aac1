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
              skip_lines: int = 0) -> DataFrame:
    """Read CSV (or .gz) with reference-parity options into a typed DF."""
    reader = (
        spark.read.option("sep", delimiter)
        .option("quote", quote)
        .option("header", header)
        .option("nullValue", "")  # ""->null parity, ConvertThread.java:70-71
        .option("mode", "PERMISSIVE")
    )
    if field_types:
        schema = T.StructType([
            T.StructField(name, _TYPE_MAP[t.lower()], True)
            for name, t in field_types.items()
        ])
        df = reader.schema(schema).csv(path)
    else:
        df = reader.csv(path)  # all-string, C2 parity
        if column_names and not header:
            df = df.toDF(*column_names)
    if skip_lines > 0 and not header:
        # reference withSkipFirstLines: drop N leading physical lines
        from pyspark.sql.window import Window

        idx = F.monotonically_increasing_id()
        df = (
            df.withColumn("_idx", idx)
            .withColumn("_rn", F.row_number().over(Window.orderBy("_idx")))
            .where(F.col("_rn") > skip_lines)
            .drop("_idx", "_rn")
        )
    return df


def convert_csv(spark: SparkSession, in_path: str, out_path: str,
                compression: str = "gzip", **kwargs) -> int:
    """CSV -> Parquet (reference default codec GZIP,
    CsvToParquetConverter.java:271-273). Returns row count."""
    df = csv_to_df(spark, in_path, **kwargs)
    df.write.mode("overwrite").option("compression", compression).parquet(out_path)
    return spark.read.parquet(out_path).count()
