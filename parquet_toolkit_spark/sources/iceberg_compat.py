"""Iceberg table access (gated: no Iceberg runtime in this image).

The north rule targets "Iceberg tables of source-code repositories". This
container ships neither the iceberg-spark runtime jar nor pyiceberg, so
catalog access is stubbed behind an import/config probe — but the engine's
own store already mirrors the Iceberg constructs it needs:

  Iceberg construct          engine equivalent
  ------------------------   ------------------------------------------
  data files per partition   staged pid=N/*.parquet (layout_stage)
  manifest / manifest list   the per-(pid, column) manifest parquet
                             (codec, bytes, checksum, status, run_id)
  snapshot commit            write-temp-then-rename blob commit + full
                             manifest rewrite (atomic swap)
  rewrite_data_files         operators/layout.compact / compact_in_place
  expire_snapshots           superseded pid dirs replaced in place

On a cluster with the iceberg-spark runtime on the classpath,
`read_table` resolves through the catalog; here it raises with the exact
spark-submit flags needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PACKAGES = "org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:1.5.0"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Read an Iceberg table (catalog.db.table) when the runtime is
    present; informative failure otherwise."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath in this environment. "
            "On a cluster run: spark-submit --packages "
            f"{ICEBERG_PACKAGES} --conf spark.sql.catalog.ptsk="
            "org.apache.iceberg.spark.SparkCatalog ... ; the engine's "
            "parquet-dir staging + manifest store is the drop-in local "
            "equivalent (see module docstring)."
        )
    return spark.read.format("iceberg").load(identifier)
