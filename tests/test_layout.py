"""Layout operator semantics: multiset preservation, global sortedness,
split size bounds, probe accuracy (reference parity per SURVEY.md §2)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from parquet_toolkit_spark.operators.layout import (
    compact,
    estimate_bytes_per_row,
    sort_by_key,
    split_by_size,
)

SF = "/root/testdata/sf0.01"


def _multiset_hash(df, cols):
    return (
        df.select(F.sha2(F.concat_ws("\x00", *[F.col(c).cast("string") for c in cols]), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")))
        .first()[0]
    )


def test_compact_preserves_multiset_and_reduces_files(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    small = str(tmp_path / "small")
    li.repartition(50).write.parquet(small)
    assert len(glob.glob(os.path.join(small, "*.parquet"))) == 50

    out = str(tmp_path / "compacted")
    compact(spark, small, out, target_bytes=8 << 20)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) < 10
    back = spark.read.parquet(out)
    cols = ["l_orderkey", "l_linenumber", "l_quantity"]
    assert back.count() == li.count()
    assert _multiset_hash(back, cols) == _multiset_hash(li, cols)


def test_sort_by_key_is_globally_sorted(spark, tmp_path):
    out = str(tmp_path / "sorted")
    sort_by_key(spark, f"{SF}/lineitem.parquet", out,
                keys=["l_orderkey", "l_linenumber"], target_bytes=1 << 20)
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) >= 2, "want multiple output files for a real check"
    # file-level ranges must be disjoint and ordered by filename,
    # and each file internally sorted
    prev_max = None
    for f in files:
        pdf = spark.read.parquet(f).select("l_orderkey").toPandas()
        vals = pdf["l_orderkey"].tolist()
        assert vals == sorted(vals), f
        if vals:
            if prev_max is not None:
                assert vals[0] >= prev_max, "file ranges overlap"
            prev_max = vals[-1]


def test_split_by_size_bounds(spark, tmp_path):
    # target is ON-DISK bytes (the reference probes by writing a temp
    # parquet file and measuring it, MultithreadedParquetSplitter.java:
    # 152-170); the sf0.001 lineitem file is ~115KB, so a 32KB target
    # must split it into >=2 files of bounded size
    out = str(tmp_path / "split")
    target = 32 << 10
    split_by_size(spark, f"{SF}/lineitem.parquet", out, target_bytes=target)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) >= 2
    for f in files:
        # rolled by maxRecordsPerFile from sampled disk bytes/row; allow
        # per-file encoding variance but nothing wildly over target
        assert os.path.getsize(f) <= target * 2, f
    back = spark.read.parquet(out)
    orig = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert back.count() == orig.count()


def test_bytes_per_row_probe_sane(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    bpr = estimate_bytes_per_row(li)
    # 10 numeric/short-string cols + timestamp: tens of bytes, not KB
    assert 40 <= bpr <= 400, bpr


def test_rewrite_recompress(spark, tmp_path):
    from parquet_toolkit_spark.operators.layout import rewrite

    out = str(tmp_path / "rewritten")
    info = rewrite(spark, f"{SF}/orders.parquet", out, compression="gzip")
    assert info["rows"] == spark.read.parquet(f"{SF}/orders.parquet").count()
    import pyarrow.parquet as pq

    f = glob.glob(os.path.join(out, "*.parquet"))[0]
    assert pq.ParquetFile(f).metadata.row_group(0).column(0).compression == "GZIP"


def test_compact_in_place_swap(spark, tmp_path):
    from parquet_toolkit_spark.operators.layout import compact_in_place

    d = str(tmp_path / "folder")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li.repartition(30).write.parquet(d)
    n_before = len(glob.glob(os.path.join(d, "*.parquet")))
    info = compact_in_place(spark, d, target_bytes=8 << 20)
    n_after = len(glob.glob(os.path.join(d, "*.parquet")))
    assert n_after < n_before
    assert spark.read.parquet(d).count() == li.count()
    assert not os.path.exists(d + "_old") and not os.path.exists(d + "_compacting")


def test_sort_null_keys_divergence_documented(spark, tmp_path):
    """FIXTURES.md F2 negative fixture: the reference hard-errors on null
    sort keys (DMCMemoryData.java:68-70); our typed sort places them
    NULLS FIRST — the documented divergence."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "withnull")
    os.makedirs(src)
    t = pa.table({"k": pa.array(["b", None, "a"], pa.string()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    pq.write_table(t, os.path.join(src, "f.parquet"))
    out = str(tmp_path / "sorted")
    sort_by_key(spark, src, out, keys=["k"], target_bytes=1 << 20)
    got = [r.k for r in spark.read.parquet(out).orderBy("k").collect()]
    assert got == [None, "a", "b"]  # NULLS FIRST, no error


def test_compact_nested_partitioned_input_sizes_bins(spark, tmp_path):
    # ADVICE r2: a partitioned (nested-dir) input read 0 bytes from the flat
    # listing -> n_bins=1 + unbounded maxRecordsPerFile. Recursive sizing
    # must see the real bytes and keep multiple bins.
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    nested = str(tmp_path / "nested")
    (li.withColumn("part", (F.col("l_orderkey") % 4).cast("int"))
       .repartition(40).write.partitionBy("part").parquet(nested))

    out = str(tmp_path / "compacted")
    info = compact(spark, nested, out, target_bytes=2 << 20)
    assert info["disk_bytes_in"] > 0
    assert info["n_bins"] > 1
    # maxRecordsPerFile bounded: far below "everything in one file"
    assert info["max_records_per_file"] < li.count()
    back = spark.read.parquet(out)
    assert back.count() == li.count()


def test_compact_does_not_leak_scan_confs(spark, tmp_path):
    # VERDICT r2 anti-pattern #2: compact() used to mutate the session's
    # maxPartitionBytes/openCostInBytes for its duration; it now plans in a
    # child session, so the caller's conf is untouched even DURING the run.
    before_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    before_open = spark.conf.get("spark.sql.files.openCostInBytes")

    li = spark.read.parquet(f"{SF}/lineitem.parquet").limit(1000)
    src = str(tmp_path / "src")
    li.repartition(5).write.parquet(src)

    seen = {}
    import parquet_toolkit_spark.operators.layout as layout_mod

    orig_newsession = type(spark).newSession

    def spying_newsession(self):
        sess = orig_newsession(self)
        seen["sess"] = sess
        return sess

    type(spark).newSession = spying_newsession
    try:
        compact(spark, src, str(tmp_path / "out"), target_bytes=1 << 20)
    finally:
        type(spark).newSession = orig_newsession

    # child session got the scan confs; parent session never changed
    assert seen["sess"].conf.get("spark.sql.files.maxPartitionBytes") == str(1 << 20)
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == before_mpb
    assert spark.conf.get("spark.sql.files.openCostInBytes") == before_open


def test_split_strict_refuses_small_input(spark, tmp_path):
    # reference parity: SimpleParquetSplitter.java:89-91 errors when the
    # input is not larger than the chunk size; strict=True restores it
    src = str(tmp_path / "small")
    spark.range(100).write.parquet(src)
    out = str(tmp_path / "out")
    with pytest.raises(ValueError, match="not\\s+larger than"):
        split_by_size(spark, src, out, target_bytes=1 << 30, strict=True)
    # default stays no-op-safe
    info = split_by_size(spark, src, out, target_bytes=1 << 30)
    assert info["n_bins"] == 1
