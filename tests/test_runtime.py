"""Session-default guards for runtime.spark_builder_defaults.

The off-heap execution pool is what keeps string-heavy shuffle map
stages from pinning the old generation (GC-overhead JVM death at
~heap-sized inputs, measured on the 6M-row corpus layout with a 10 GB
ParallelGC heap) — these tests pin that it is on by default, sized by
core count, and cleanly disableable for deployments that budget memory
differently.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_toolkit_spark.runtime import spark_builder_defaults


def _opts(builder):
    return dict(builder._options)


def test_offheap_on_by_default(monkeypatch):
    from pyspark.sql import SparkSession

    monkeypatch.delenv("SPARK_GRAFT_OFFHEAP_MB", raising=False)
    opts = _opts(spark_builder_defaults(SparkSession.builder))
    assert opts["spark.memory.offHeap.enabled"] == "true"
    size = opts["spark.memory.offHeap.size"]
    assert size.endswith("m") and int(size[:-1]) >= 192
    # sized by core count: one ~192MB page-holding task per core
    assert int(size[:-1]) == 192 * (os.cpu_count() or 8)


def test_offheap_env_override_and_disable(monkeypatch):
    from pyspark.sql import SparkSession

    monkeypatch.setenv("SPARK_GRAFT_OFFHEAP_MB", "1024")
    opts = _opts(spark_builder_defaults(SparkSession.builder))
    assert opts["spark.memory.offHeap.size"] == "1024m"

    monkeypatch.setenv("SPARK_GRAFT_OFFHEAP_MB", "0")
    opts = _opts(spark_builder_defaults(SparkSession.builder))
    assert "spark.memory.offHeap.enabled" not in opts
    assert "spark.memory.offHeap.size" not in opts
