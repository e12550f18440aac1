"""parquet_toolkit_spark — a PySpark-native columnar maintenance + encode engine.

A from-scratch re-expression of the capabilities of the reference toolkit
(`slangman/parquet-toolkit`, a single-JVM Java/HDFS Parquet file-maintenance
tool: merge/compact, sort-by-column, split-by-size, CSV->Parquet) as an
idiomatic Spark DataFrame engine, extended with a per-column
lightweight-compression engine (dictionary, RLE, FSST-style symbol table,
bit-packing, frame-of-reference, delta) with codec auto-selection from
profiled column statistics, a per-partition lineage/metrics manifest, and
checkpoint-resume.

Layering:
  codecs/     pure numpy/Arrow codecs (no Spark dependency)
  operators/  layout engine: compact / sort / split / encode / decode
  sources/    ingestion: CSV->table, parquet folder tools, schema grouping
  functions/  text analysis, dedup, similarity search, multimodal plumbing
  streaming/  incremental encode via Structured Streaming foreachBatch
"""

__version__ = "0.1.0"
