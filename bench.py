#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "e2e_wall_seconds", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "encode": {gb_in, wall_s, gbps, ratio_vs_raw, ratio_vs_snappy},
   "cores": N}

Inputs: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) for the oracle
tables; the encode bench runs on the deterministic F0 source-code corpus
(generated once, cached). $SPARK_GRAFT_CPUS sets local[N] (default 32).

Scaling protocol (BASELINE.md): run this with SPARK_GRAFT_CPUS=8 and =32 on
the same inputs; efficiency = gbps(32) / (4 * gbps(8)).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_toolkit_spark.runtime import spark_builder_defaults, tune_malloc

tune_malloc()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS_ROOT = os.environ.get("SPARK_GRAFT_CORPUS_DIR", "/tmp/ptsk_bench")

BENCH_QUERIES = [
    "merge_compact", "sort_by_key", "split_by_size",
    "encode_roundtrip_sha", "q1_pricing_summary", "topk_per_group",
    "join_agg", "events_hourly", "text_stats", "lang_id",
    "exact_dedup", "normalized_dedup", "minhash_lsh", "simhash_pairs",
    "ann_topk", "embedding_near_pairs_lsh", "sessionize",
    "source_stats_salted", "events_windowed_stream",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    from pyspark.sql import SparkSession

    spark = (
        spark_builder_defaults(
            SparkSession.builder.master(f"local[{CPUS}]").appName("ptsk_bench"),
            shuffle_partitions=CPUS,
        )
        .config("spark.driver.memory", "10g")
        .config("spark.driver.extraJavaOptions", "-Xms10g -XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import shutil

    import __spark_entry__ as entrymod
    from parquet_toolkit_spark.datagen import write_corpus
    from parquet_toolkit_spark.operators.encode import (
        encode_partitions,
        encoded_size_report,
        layout_stage,
    )

    # ---- encode bench on the F0 corpus (the headline north-rule metric)
    # phase A: layout (merge+sort+split parity, one shuffle); phase B: the
    # columnar encode kernel (task-local pyarrow IO, no JVM row transfer)
    n_rows = max(2000, int(6_000_000 * sf))
    corpus_dir = os.path.join(CORPUS_ROOT, f"corpus_{n_rows}")
    write_corpus(corpus_dir, n_rows, n_files=max(16, CPUS * 2))
    corpus = spark.read.parquet(corpus_dir)

    from pyspark.sql import functions as F

    raw_bytes = corpus.agg(F.sum(F.octet_length("content"))).first()[0] or 0
    n_parts = max(2 * CPUS, int(raw_bytes // (16 << 20)) + 1)

    # stale output dirs from previous rounds degrade this sandbox's page
    # cache / tmpfs badly — measurements need a clean slate
    for stale in glob.glob(os.path.join(CORPUS_ROOT, "enc_*")) + glob.glob(
        os.path.join(CORPUS_ROOT, "*_warm")
    ):
        shutil.rmtree(stale, ignore_errors=True)

    # spin up the python worker pool before timing (imports + first-touch
    # heap faults are one-time per executor; a long-lived cluster is warm)
    def _noop(it):
        import pandas as pd
        for _ in it:
            pass
        yield pd.DataFrame({"x": [1]})

    spark.range(CPUS * 4).repartition(CPUS * 2).mapInPandas(_noop, "x long").count()

    staging = os.path.join(CORPUS_ROOT, f"staged_{n_rows}")
    t0 = time.time()
    layout_stage(spark, corpus, staging, n_partitions=n_parts)
    layout_wall = time.time() - t0

    # warm the encode kernel once (fail_after caps it at CPUS partitions):
    # worker heap growth + numpy/pyarrow code paths are one-time per
    # executor process; a long-lived cluster runs warm, so the steady
    # state is the honest per-job number
    warm_dir = os.path.join(CORPUS_ROOT, "enc_warm")
    encode_partitions(spark, staging, warm_dir, run_id="warm", resume=False,
                      fail_after=CPUS)
    shutil.rmtree(warm_dir, ignore_errors=True)

    enc_dir = os.path.join(CORPUS_ROOT, f"enc_{n_rows}_{CPUS}")
    shutil.rmtree(enc_dir, ignore_errors=True)
    t0 = time.time()
    encode_partitions(spark, staging, enc_dir, run_id=f"bench{CPUS}",
                      resume=False)
    encode_wall = time.time() - t0
    rep = encoded_size_report(spark, enc_dir)
    gb_in = (rep["bytes_in"] or 0) / 1e9
    snappy_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(corpus_dir, "*.parquet"))
    )
    from parquet_toolkit_spark.operators.encode import decode_pipeline

    t0 = time.time()
    n_dec = decode_pipeline(spark, enc_dir).count()
    decode_wall = time.time() - t0
    assert n_dec == n_rows, (n_dec, n_rows)

    encode = {
        "gb_in": round(gb_in, 3),
        "layout_wall_s": round(layout_wall, 2),
        "wall_s": round(encode_wall, 2),
        "gbps": round(gb_in / encode_wall, 4),
        "e2e_gbps": round(gb_in / (encode_wall + layout_wall), 4),
        "decode_wall_s": round(decode_wall, 2),
        "decode_gbps": round(gb_in / decode_wall, 4),
        "ratio_vs_raw": round(rep["ratio"], 4),
        "ratio_vs_snappy": round((rep["bytes_out"] or 0) / max(1, snappy_bytes), 4),
        "n_partitions": rep["n_partitions"],
    }

    # ---- query bench on the driver tables
    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        # noop sink evaluates EVERY output column (count() would let
        # Catalyst prune projection-only expressions, ADVICE r1)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    times["layout_corpus"] = round(layout_wall, 3)
    times["encode_corpus"] = round(encode_wall, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "e2e_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cores": CPUS,
        "encode": encode,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
