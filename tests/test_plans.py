"""Physical-plan regression guards: the properties that make these plans
scale (filter pushdown to the scan, column pruning, broadcast of small
dims, map-side partial aggregation) must survive refactors."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    from parquet_toolkit_spark.runtime import spark_builder_defaults

    s = (
        spark_builder_defaults(
            SparkSession.builder.master("local[4]").appName("plans"),
            shuffle_partitions=4,
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    df = entrymod.queries()["q1_pricing_summary"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 6 used columns only, not props/comment-ish extras
    assert "l_partkey" not in plan.split("ReadSchema")[-1]


def test_join_agg_broadcasts_small_side(spark):
    df = entrymod.queries()["join_agg"](spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_exact_dedup_partial_aggregation(spark):
    df = entrymod.queries()["exact_dedup"](spark, SF)
    plan = _plan(df)
    assert "partial_min" in plan or "partial_count" in plan


def test_text_stats_prunes_to_used_columns(spark):
    # text_stats moved to extra_queries() in the r6 registry rotation —
    # the pruning guard still applies
    df = entrymod.extra_queries()["text_stats"](spark, SF)
    tail = _plan(df).split("ReadSchema")[-1]
    assert "doc_id" in tail and "text" in tail and "source" not in tail


def test_decontaminate_no_forced_broadcast_on_hits(spark):
    """VERDICT r5 #2: the contaminated-id anti-join must NOT force a
    broadcast — hit-set cardinality scales with corpus contamination
    (unbounded), so the strategy belongs to AQE. The one intended
    broadcast hint in the plan is the SMALL benchmark gram set inside
    contamination_report. Verified on a majority-contaminated corpus
    (worst case for a forced broadcast)."""
    from parquet_toolkit_spark.functions.decontaminate import decontaminate

    base = ("the quick brown fox jumps over the lazy dog "
            "while winter winds howl across the frozen plain")
    docs = spark.createDataFrame(
        [(i, base + f" tail {i}") for i in range(40)]
        + [(100 + i, f"unique clean document number {i} "
            "with nothing shared at all here") for i in range(10)],
        "doc_id long, text string")
    bench = spark.createDataFrame([(base,)], "text string")
    kept = decontaminate(docs, bench, n=8)

    # majority contaminated: the 40 overlapping docs drop, 10 survive
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {100 + i for i in range(10)}

    # logical plan carries exactly ONE broadcast hint (the bench grams);
    # the left_anti on hits has none
    logical = kept._jdf.queryExecution().optimizedPlan().toString()
    assert logical.lower().count("strategy=broadcast") == 1, logical
