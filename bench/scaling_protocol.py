#!/usr/bin/env python
"""Orchestrate the two-parallelism scaling evidence (north rule: throughput
at 4N cores >= 0.8 x 4 x throughput at N cores, sandbox substitute for two
cluster sizes).

Steps:
  1. build dist zip, generate + stage the corpus (once)
  2. spark-submit bench/encode_bench.py at local[N] and local[4N], R runs
  3. a pure-CPU host control (sha256 over multiprocessing at N and 4N) to
     separate engine scaling from host-contention ceiling
  4. write BENCH_SCALING.json and print the table

Usage: python bench/scaling_protocol.py [--n 4] [--rows 2400000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def cpu_control(nproc: int, tasks: int = 128) -> float:
    import multiprocessing as mp

    with mp.Pool(nproc) as pool:
        t0 = time.time()
        pool.map(_CPU_WORK, range(tasks))
        return time.time() - t0


def _CPU_WORK(_i):
    import hashlib

    buf = b"x" * (1 << 20)
    h = hashlib.sha256()
    for _ in range(200):
        h.update(buf)
    return 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--rows", type=int, default=2_400_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/ptsk_scaling")
    args = ap.parse_args()
    n, n4 = args.n, args.n * 4

    from parquet_toolkit_spark.runtime import spark_builder_defaults, tune_malloc

    tune_malloc()

    # 1. dist zip + corpus + staging
    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench", "make_dist.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    from parquet_toolkit_spark.datagen import write_corpus

    corpus_dir = os.path.join(args.workdir, f"corpus_{args.rows}")
    write_corpus(corpus_dir, args.rows, n_files=96)

    staging = os.path.join(args.workdir, f"staged_{args.rows}")
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        from pyspark.sql import SparkSession

        spark = (
            spark_builder_defaults(SparkSession.builder.master("local[32]"))
            .config("spark.driver.memory", "10g")
            .config("spark.driver.extraJavaOptions", "-Xms10g -XX:+UseParallelGC")
            .config("spark.ui.enabled", "false").getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from parquet_toolkit_spark.operators.encode import layout_stage

        layout_stage(spark, spark.read.parquet(corpus_dir), staging,
                     target_bytes=16 << 20)
        spark.stop()

    # 2. spark-submit at both parallelism levels
    results = {}
    for cores in (n, n4):
        out = os.path.join(args.workdir, f"enc_{cores}")
        cmd = [
            "spark-submit", "--master", f"local[{cores}]",
            "--py-files", zip_path,
            os.path.join(ROOT, "bench", "encode_bench.py"),
            "--staging", staging, "--out", out,
            "--runs", str(args.runs), "--cores", str(cores),
        ]
        env = dict(os.environ)
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit(f"encode_bench at local[{cores}] failed")
        results[cores] = json.loads(line[-1])
        shutil.rmtree(out, ignore_errors=True)

    # 3. host control
    ctrl = {c: round(cpu_control(c), 2) for c in (n, n4)}

    eff = results[n]["gbps_median"] and round(
        results[n4]["gbps_median"] / (4 * results[n]["gbps_median"]), 3
    )
    ctrl_eff = round(ctrl[n] / ctrl[n4] / 4, 3)
    report = {
        "protocol": f"local[{n}] vs local[{n4}], {args.runs} runs, median",
        "rows": args.rows,
        "n": results[n],
        "n4": results[n4],
        "efficiency": eff,
        "host_control_sha256_walls": ctrl,
        "host_control_efficiency": ctrl_eff,
        "efficiency_vs_host_ceiling": round(eff / ctrl_eff, 3) if ctrl_eff else None,
    }
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
