"""Z-order clustering: multi-column zone-map pruning stays exact.

The claim under test is the 100 TB one: after cluster_keys=("a","b"),
a range predicate on EITHER column alone prunes pids (a single-key sort
prunes only on its leading key), and every pruned read equals the plain
filter — pruning is a sound superset, the residual keeps it exact."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from parquet_toolkit_spark.operators.encode import (
    decode_where,
    encode_pipeline,
    pids_matching_range,
    read_manifest,
)
from parquet_toolkit_spark.operators.zorder import zorder_key


def _events(spark, n=60_000):
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i % 5000),
             (i * 7919) % 3000) for i in range(n)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long")


def test_zorder_prunes_both_dimensions_exactly(spark, tmp_path):
    df = _events(spark)
    enc = str(tmp_path / "zo")
    man = encode_pipeline(spark, df, enc, target_bytes=64 << 10,
                          run_id="zo", cluster_keys=("ts", "user_id"),
                          n_partitions=32)
    n_pids = man.select("pid").distinct().count()

    keep_u = pids_matching_range(spark, enc, "user_id", lo=100, hi=400)
    lo, hi = dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2, 12)
    keep_t = pids_matching_range(spark, enc, "ts", lo=lo, hi=hi)
    # both NON-leading-key dimensions prune: the whole point of z-order
    assert 0 < len(keep_u) < n_pids
    assert 0 < len(keep_t) < n_pids

    got = {r.event_id for r in
           decode_where(spark, enc, {"user_id": (100, 400)},
                        columns=["event_id", "user_id"]).collect()}
    want = {r.event_id for r in
            df.where((F.col("user_id") >= 100)
                     & (F.col("user_id") <= 400)).collect()}
    assert got == want and got

    got2 = {r.event_id for r in
            decode_where(spark, enc,
                         {"ts": (lo, hi), "user_id": (100, 1500)},
                         columns=["event_id", "ts", "user_id"]).collect()}
    want2 = {r.event_id for r in
             df.where((F.col("ts") >= lo) & (F.col("ts") <= hi)
                      & (F.col("user_id") >= 100)
                      & (F.col("user_id") <= 1500)).collect()}
    assert got2 == want2 and got2


def test_zorder_beats_single_key_layout_on_second_dim(spark, tmp_path):
    df = _events(spark)
    zo, sk = str(tmp_path / "zo"), str(tmp_path / "sk")
    encode_pipeline(spark, df, zo, target_bytes=64 << 10, run_id="zo",
                    cluster_keys=("ts", "user_id"), n_partitions=32)
    encode_pipeline(spark, df, sk, target_bytes=64 << 10, run_id="sk",
                    range_keys=("ts",), sort_keys=("ts",), n_partitions=32)
    keep_zo = pids_matching_range(spark, zo, "user_id", lo=100, hi=400)
    keep_sk = pids_matching_range(spark, sk, "user_id", lo=100, hi=400)
    # ts-sorted layout can't prune on user_id; z-order must do strictly
    # better (on this interleaved-uniform fixture, dramatically so)
    assert len(keep_zo) < len(keep_sk)
    assert len(keep_sk) == read_manifest(spark, sk) \
        .select("pid").distinct().count()


def test_zorder_null_and_skew_stay_exact(spark, tmp_path):
    # one mega-user owns half the rows (skew), 5% null user_ids
    rows = []
    for i in range(20_000):
        uid = 42 if i % 2 == 0 else (None if i % 20 == 1 else i % 500)
        rows.append((i, dt.datetime(2024, 1, 1)
                     + dt.timedelta(seconds=i * 13), uid))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long")
    enc = str(tmp_path / "zo")
    encode_pipeline(spark, df, enc, target_bytes=32 << 10, run_id="zs",
                    cluster_keys=("ts", "user_id"), n_partitions=16)
    got = {r.event_id for r in
           decode_where(spark, enc, {"user_id": (100, 300)},
                        columns=["event_id", "user_id"]).collect()}
    want = {r.event_id for r in
            df.where((F.col("user_id") >= 100)
                     & (F.col("user_id") <= 300)).collect()}
    assert got == want and got
    # NULL user_ids survive a full decode (bucket 0 placement, not loss)
    full = decode_where(spark, enc, {"event_id": (0, 10**9)},
                        columns=["event_id", "user_id"])
    assert full.where(F.col("user_id").isNull()).count() == 1000


def test_zorder_key_guards(spark):
    df = _events(spark, n=100)
    with pytest.raises(ValueError, match="62-bit"):
        zorder_key(df, ("ts", "user_id"), bits=32)
    with pytest.raises(ValueError, match="not in dataframe"):
        zorder_key(df, ("nope",))
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(df, ())


def test_zorder_key_is_jvm_side(spark):
    """The Morton key must be a pure Catalyst expression — no python
    UDF in the plan (BatchEvalPython/ArrowEvalPython nodes)."""
    df = _events(spark, n=2_000)
    zk = zorder_key(df, ("ts", "user_id"), bits=6, total_rows=2_000)
    plan = df.withColumn("z", zk)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
