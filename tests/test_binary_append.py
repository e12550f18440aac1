"""Zero-decode row-group append (M3 parity: TreeMergeThread.java:116).

Covers: pyarrow+Spark read-back equality, verbatim row-group byte copy
(the zero-decode claim), mixed per-file codecs, refusals (schema drift,
external chunks), empty-file skip (M6), distributed bin-packed compact,
and faithful fan-in tree reduction. thrift_lite itself is pinned by a
round-trip over real footers plus a hypothesis structural fuzz."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_toolkit_spark.operators import binary_append as ba
from parquet_toolkit_spark.sources import thrift_lite as tl


def _table(seed: int, n: int = 500) -> pa.Table:
    return pa.table({
        "id": pa.array(range(seed * 10_000, seed * 10_000 + n), pa.int64()),
        "name": pa.array(
            [f"user-{seed}-{j}" if j % 7 else None for j in range(n)]),
        "score": pa.array(
            [j * 0.5 if j % 3 else None for j in range(n)], pa.float64()),
        "ts": pa.array(
            [1_700_000_000_000 + seed * 1000 + j for j in range(n)],
            pa.timestamp("ms")),
    })


@pytest.fixture()
def inputs(tmp_path):
    codecs = ["snappy", "zstd", "gzip", "none"]
    paths, tables = [], []
    for i, codec in enumerate(codecs):
        t = _table(i)
        p = str(tmp_path / f"in{i}.parquet")
        pq.write_table(t, p, row_group_size=180, compression=codec)
        paths.append(p)
        tables.append(t)
    return paths, tables


def test_append_pyarrow_equality_mixed_codecs(tmp_path, inputs):
    paths, tables = inputs
    out = str(tmp_path / "merged.parquet")
    info = ba.append_files(paths, out)
    got = pq.read_table(out)
    want = pa.concat_tables(tables)
    assert got.equals(want)
    # 500 rows / 180 per group = 3 groups per input
    assert info["row_groups"] == 12 and info["rows"] == 2000
    assert pq.ParquetFile(out).metadata.num_row_groups == 12


def test_append_is_zero_decode_byte_copy(tmp_path, inputs):
    """Every input row-group byte span must appear verbatim in the output
    — the pages were copied, not decoded/re-encoded."""
    paths, _ = inputs
    out = str(tmp_path / "merged.parquet")
    ba.append_files(paths, out)
    raw_out = open(out, "rb").read()
    for p in paths:
        fields, _, _ = ba.read_footer(p)
        raw_in = open(p, "rb").read()
        for rg in tl.get(fields, 4)[2]:
            s, e = ba._rg_span(rg)
            assert raw_in[s:e] in raw_out


def test_append_spark_readback(spark, tmp_path, inputs):
    paths, tables = inputs
    out = str(tmp_path / "merged.parquet")
    ba.append_files(paths, out)
    got = spark.read.parquet(out)
    assert got.count() == 2000
    assert got.groupBy().sum("id").first()[0] == \
        sum(int(x) for t in tables for x in t["id"].to_pylist() if x is not None)


def test_append_skips_empty_files(tmp_path):
    t = _table(0)
    p0 = str(tmp_path / "a.parquet")
    p1 = str(tmp_path / "empty.parquet")
    pq.write_table(t, p0, compression="snappy")
    pq.write_table(t.slice(0, 0), p1, compression="snappy")
    out = str(tmp_path / "m.parquet")
    info = ba.append_files([p1, p0, p1], out)
    assert info["rows"] == 500
    assert pq.read_table(out).equals(t)


def test_append_refuses_schema_drift(tmp_path):
    p0 = str(tmp_path / "a.parquet")
    p1 = str(tmp_path / "b.parquet")
    pq.write_table(_table(0), p0)
    pq.write_table(pa.table({"other": [1, 2, 3]}), p1)
    with pytest.raises(ba.AppendError, match="schema differs"):
        ba.append_files([p0, p1], str(tmp_path / "m.parquet"))


def test_append_refuses_external_column_chunk(tmp_path):
    """A footer whose ColumnChunk carries file_path points at data in
    ANOTHER file — appending its bytes from this one would be garbage."""
    p0 = str(tmp_path / "a.parquet")
    pq.write_table(_table(0), p0)
    fields, fstart, size = ba.read_footer(p0)
    rgs = tl.get(fields, 4)
    rg0 = rgs[2][0]
    cols = tl.get(rg0, 1)
    cc0 = tl.set_field(cols[2][0], 1, ("binary", b"elsewhere.parquet"))
    new_cols = (cols[0], cols[1], [cc0] + cols[2][1:])
    new_rg0 = tl.set_field(rg0, 1, new_cols)
    new_rgs = (rgs[0], rgs[1], [new_rg0] + rgs[2][1:])
    patched = tl.dumps(("struct", tl.set_field(fields, 4, new_rgs)))
    raw = open(p0, "rb").read()
    import struct as st
    evil = raw[:fstart] + patched + st.pack("<I", len(patched)) + b"PAR1"
    p1 = str(tmp_path / "evil.parquet")
    open(p1, "wb").write(evil)
    with pytest.raises(ba.AppendError, match="external file"):
        ba.append_files([p1], str(tmp_path / "m.parquet"))


def test_append_compact_binpacks_and_preserves_rows(spark, tmp_path):
    src = tmp_path / "many"
    src.mkdir()
    tables = []
    for i in range(9):
        t = _table(i, n=300)
        pq.write_table(t, str(src / f"f{i}.parquet"), row_group_size=150)
        tables.append(t)
    out = str(tmp_path / "compacted")
    one_size = os.path.getsize(str(src / "f0.parquet"))
    info = ba.append_compact(spark, str(src), out,
                             target_bytes=one_size * 3)
    assert info["files_in"] == 9 and info["rows"] == 2700
    assert 3 <= info["n_bins"] <= 5  # ~3 files per bin
    parts = sorted(p for p in os.listdir(out) if p.endswith(".parquet"))
    assert len(parts) == info["n_bins"]
    got = spark.read.parquet(out)
    assert got.count() == 2700
    want = sum(int(x) for t in tables
               for x in t["id"].to_pylist() if x is not None)
    assert got.groupBy().sum("id").first()[0] == want


def test_tree_merge_refuses_degenerate_fan_in(spark, tmp_path):
    """fan_in=1 reduces nothing — it must refuse, not spin forever."""
    src = tmp_path / "many"
    src.mkdir()
    for i in range(3):
        pq.write_table(_table(i, n=50), str(src / f"f{i}.parquet"))
    with pytest.raises(ba.AppendError, match="fan_in"):
        ba.tree_merge(spark, str(src), str(tmp_path / "o.parquet"), fan_in=1)


def test_split_strict_refuses_small_input(spark, tmp_path):
    p = str(tmp_path / "small.parquet")
    pq.write_table(_table(0, n=50), p)
    with pytest.raises(ba.AppendError, match="strict"):
        ba.split_row_groups(spark, p, str(tmp_path / "o"),
                            target_bytes=1 << 30, strict=True)


def test_split_no_work_preserves_previous_output(spark, tmp_path):
    """A refusal (all inputs empty) must not have wiped the output dir
    from an earlier good run first."""
    good_src = str(tmp_path / "good.parquet")
    pq.write_table(_table(0, n=100), good_src, row_group_size=50)
    out = str(tmp_path / "o")
    ba.split_row_groups(spark, good_src, out, target_bytes=1)
    before = sorted(os.listdir(out))
    # a writer closed without writes: a footer with ZERO row groups
    empty_src = str(tmp_path / "empty.parquet")
    pq.ParquetWriter(empty_src, _table(0, n=1).schema).close()
    with pytest.raises(ba.AppendError, match="no row groups"):
        ba.split_row_groups(spark, empty_src, out, target_bytes=1)
    assert sorted(os.listdir(out)) == before


def test_missing_input_is_a_clean_error(spark, tmp_path):
    with pytest.raises(ba.AppendError, match="cannot list|missing"):
        ba.append_compact(spark, str(tmp_path / "nope.parquet"),
                          str(tmp_path / "o"))


def test_failed_append_leaves_no_inprogress(tmp_path):
    """Schema drift mid-merge must clean up the partial temp file."""
    p0 = str(tmp_path / "a.parquet")
    p1 = str(tmp_path / "b.parquet")
    pq.write_table(_table(0), p0)
    pq.write_table(pa.table({"other": [1]}), p1)
    out = str(tmp_path / "m.parquet")
    with pytest.raises(ba.AppendError):
        ba.append_files([p0, p1], out)
    assert not os.path.exists(out + ".inprogress")
    assert not os.path.exists(out)


def test_tree_merge_single_output(spark, tmp_path):
    src = tmp_path / "many"
    src.mkdir()
    tables = [_table(i, n=100) for i in range(7)]
    for i, t in enumerate(tables):
        pq.write_table(t, str(src / f"f{i}.parquet"))
    out = str(tmp_path / "one.parquet")
    info = ba.tree_merge(spark, str(src), out, fan_in=2)
    assert info["rows"] == 700 and info["rounds"] >= 2
    assert pq.read_table(out).equals(pa.concat_tables(tables))


def test_split_row_groups_zero_decode(spark, tmp_path):
    """Split at row-group granularity: outputs concat back to the
    original table, every output row-group byte span is verbatim from
    the input, and files stay near target size."""
    t = _table(0, n=2000)
    src = str(tmp_path / "big.parquet")
    pq.write_table(t, src, row_group_size=200, compression="zstd")
    out = str(tmp_path / "splits")
    rg_bytes = ba._rg_span(tl.get(ba.read_footer(src)[0], 4)[2][0])
    target = (rg_bytes[1] - rg_bytes[0]) * 3 + 100  # ~3 groups per file
    info = ba.split_row_groups(spark, src, out, target_bytes=target)
    assert info["rows"] == 2000 and info["row_groups"] == 10
    parts = sorted(os.listdir(out))
    assert len(parts) == info["files_out"] >= 3
    got = pa.concat_tables(
        [pq.read_table(os.path.join(out, p)) for p in parts])
    assert got.equals(t)
    raw_in = open(src, "rb").read()
    for p in parts:
        fields, _, _ = ba.read_footer(os.path.join(out, p))
        raw_out = open(os.path.join(out, p), "rb").read()
        for rg in tl.get(fields, 4)[2]:
            s, e = ba._rg_span(rg)
            assert raw_out[s:e] in raw_in


def test_split_oversize_row_group_gets_own_file(spark, tmp_path):
    t = _table(1, n=600)
    src = str(tmp_path / "big.parquet")
    pq.write_table(t, src, row_group_size=300)
    out = str(tmp_path / "splits")
    info = ba.split_row_groups(spark, src, out, target_bytes=1)
    assert info["files_out"] == 2  # one unsplittable group per file
    got = pa.concat_tables(
        [pq.read_table(os.path.join(out, p))
         for p in sorted(os.listdir(out))])
    assert got.equals(t)


def test_split_then_append_roundtrip(spark, tmp_path):
    """The two zero-decode ops are inverses at the byte level of the
    row groups: split then tree-merge reproduces the exact table."""
    t = _table(2, n=1000)
    src = str(tmp_path / "big.parquet")
    pq.write_table(t, src, row_group_size=100, compression="snappy")
    splits = str(tmp_path / "splits")
    ba.split_row_groups(spark, src, splits, target_bytes=1)
    merged = str(tmp_path / "merged.parquet")
    ba.tree_merge(spark, splits, merged, fan_in=4)
    assert pq.read_table(merged).equals(t)


# ------------------------------------------------------ thrift_lite pins


def test_thrift_roundtrip_real_footers(tmp_path):
    """dumps(loads(footer)) must be byte-identical for pyarrow footers
    across schema shapes (nested, decimal, dictionary, stats on/off)."""
    t = pa.table({
        "i32": pa.array([1, None, 3], pa.int32()),
        "dec": pa.array([None, 2, 3], pa.decimal128(9, 2)),
        "nest": pa.array([{"a": 1, "b": ["x"]}, None, {"a": 2, "b": []}],
                         pa.struct([("a", pa.int64()),
                                    ("b", pa.list_(pa.string()))])),
        "d": pa.array(["a", "b", "a"]).dictionary_encode(),
    })
    for opts in [{}, {"write_statistics": False}, {"use_dictionary": False},
                 {"compression": "zstd"}]:
        p = str(tmp_path / "t.parquet")
        pq.write_table(t, p, **opts)
        import struct as st
        raw = open(p, "rb").read()
        flen = st.unpack("<I", raw[-8:-4])[0]
        footer = raw[len(raw) - 8 - flen:-8]
        assert tl.dumps(tl.loads(footer)) == footer


def test_thrift_roundtrip_property():
    """Structural fuzz: arbitrary value trees survive dumps->loads."""
    from hypothesis import given, settings
    from hypothesis import strategies as stt

    prims = stt.one_of(
        stt.booleans().map(lambda b: ("bool", b)),
        stt.integers(-128, 127).map(lambda n: ("i8", n)),
        stt.integers(-2**15, 2**15 - 1).map(lambda n: ("i16", n)),
        stt.integers(-2**31, 2**31 - 1).map(lambda n: ("i32", n)),
        stt.integers(-2**63, 2**63 - 1).map(lambda n: ("i64", n)),
        stt.floats(allow_nan=False).map(lambda f: ("double", f)),
        stt.binary(max_size=40).map(lambda b: ("binary", b)),
    )

    def containers(children):
        def mk_list(vals):
            # a homogeneous list: reuse the first child's wire type
            tag = vals[0][0] if vals else "i32"
            wire = tl._WIRE[tag] or tl.T_BOOL_TRUE
            return ("list", wire, [tl._payload(v) for v in vals
                                   if v[0] == (vals[0][0] if vals else "")])
        struct_s = stt.lists(
            stt.tuples(stt.integers(1, 300), children),
            max_size=5,
            unique_by=lambda t: t[0],
        ).map(lambda fs: ("struct", sorted(fs, key=lambda x: x[0])))
        list_s = stt.lists(children, min_size=0, max_size=5).map(mk_list)
        return stt.one_of(struct_s, list_s)

    trees = stt.recursive(prims, containers, max_leaves=25)
    fields_s = stt.lists(
        stt.tuples(stt.integers(1, 4000), trees), max_size=8,
        unique_by=lambda t: t[0],
    ).map(lambda fs: ("struct", sorted(fs, key=lambda x: x[0])))

    @given(fields_s)
    @settings(max_examples=150, deadline=None)
    def check(tree):
        buf = tl.dumps(tree)
        assert tl.dumps(tl.loads(buf)) == buf

    check()


def test_append_by_schema_groups(spark, tmp_path):
    """Mixed-schema inputs merge into one output set PER schema with the
    reference's -schema-N suffix naming (M5 on the zero-decode path)."""
    src = tmp_path / "mixed"
    src.mkdir()
    for i in range(3):
        pq.write_table(_table(i, n=200), str(src / f"a{i}.parquet"))
    other = pa.table({"x": pa.array(range(50), pa.int32())})
    for i in range(2):
        pq.write_table(other, str(src / f"b{i}.parquet"))
    out = str(tmp_path / "bysch")
    info = ba.append_by_schema(spark, str(src), out, target_bytes=1 << 30)
    assert info["schema_groups"] == 2 and info["rows"] == 700
    outs = sorted(r["out"] for r in info["groups"])
    assert outs == [out, out + "-schema-1"]
    counts = sorted(
        pq.read_table(os.path.join(d, f)).num_rows
        for d in outs for f in os.listdir(d) if f.endswith(".parquet"))
    assert sum(counts) == 700


def test_append_compact_overwrites_stale_parts(spark, tmp_path):
    """Re-running into the same output dir with a different bin count
    must not leave stale part files (Spark overwrite semantics)."""
    src = tmp_path / "many"
    src.mkdir()
    for i in range(4):
        pq.write_table(_table(i, n=100), str(src / f"f{i}.parquet"))
    out = str(tmp_path / "o")
    ba.append_compact(spark, str(src), out, target_bytes=1)   # 4 parts
    ba.append_compact(spark, str(src), out, target_bytes=1 << 30)  # 1 part
    got = spark.read.parquet(out)
    assert got.count() == 400
    assert len([f for f in os.listdir(out) if f.endswith(".parquet")]) == 1


def _cc0(fields):
    return tl.get(tl.get(fields, 4)[2][0], 1)[2][0]


def test_append_preserves_page_index(tmp_path):
    """ColumnIndex/OffsetIndex survive the merge with offsets rewritten:
    each chunk's first data-page location must equal its (shifted)
    data_page_offset, and the index bytes must parse."""
    paths = []
    for i in range(2):
        t = _table(i, n=1000)
        p = str(tmp_path / f"pi{i}.parquet")
        pq.write_table(t, p, row_group_size=250, write_page_index=True)
        paths.append(p)
    out = str(tmp_path / "m.parquet")
    ba.append_files(paths, out)
    fields, _, _ = ba.read_footer(out)
    raw = open(out, "rb").read()
    n_checked = 0
    for rg in tl.get(fields, 4)[2]:
        for cc in tl.get(rg, 1)[2]:
            oi_off, oi_len = ba._i64(cc, 4), ba._i64(cc, 5)
            ci_off, ci_len = ba._i64(cc, 6), ba._i64(cc, 7)
            assert None not in (oi_off, oi_len, ci_off, ci_len)
            meta = tl.get(cc, 3)[1]
            oi = tl.loads(raw[oi_off:oi_off + oi_len])
            first_page = tl.get(tl.get(oi[1], 1)[2][0], 1)[1]
            assert first_page == ba._i64(meta, 9)  # data_page_offset
            tl.loads(raw[ci_off:ci_off + ci_len])  # must parse
            n_checked += 1
    assert n_checked == 8 * 4  # 2 files x 4 groups x 4 columns
    # and the data still reads exactly
    got = pq.read_table(out)
    assert got.equals(pa.concat_tables([_table(0, 1000), _table(1, 1000)]))


def test_append_preserves_bloom_filters(spark, tmp_path):
    """parquet-mr-written bloom filters are carried byte-identically to
    their new position, and Spark still reads the merged file exactly."""
    from pyspark.sql import functions as F

    srcs = []
    for i in range(2):
        d = str(tmp_path / f"b{i}")
        (spark.range(i * 1000, i * 1000 + 1000)
         .select(F.col("id"), F.sha1(F.col("id").cast("string")).alias("v"))
         .coalesce(1).write
         .option("parquet.bloom.filter.enabled#v", "true")
         .parquet(d))
        srcs.append([os.path.join(d, f) for f in os.listdir(d)
                     if f.endswith(".parquet")][0])
    out = str(tmp_path / "m.parquet")
    ba.append_files(srcs, out)
    fields, _, _ = ba.read_footer(out)
    raw_out = open(out, "rb").read()
    found = 0
    for i, rg in enumerate(tl.get(fields, 4)[2]):
        for cc in tl.get(rg, 1)[2]:
            meta = tl.get(cc, 3)[1]
            bf_off, bf_len = ba._i64(meta, 14), ba._i64(meta, 15)
            if bf_off is None:
                continue
            assert bf_len is not None and bf_len > 0
            # byte-identical to the source bloom region
            sfields, _, sfsize = ba.read_footer(srcs[i])
            scc = [c for c in tl.get(tl.get(sfields, 4)[2][0], 1)[2]
                   if tl.get(tl.get(c, 3)[1], 14) is not None][0]
            smeta = tl.get(scc, 3)[1]
            s_off = ba._i64(smeta, 14)
            s_len = ba._i64(smeta, 15) or bf_len
            raw_in = open(srcs[i], "rb").read()
            assert raw_out[bf_off:bf_off + bf_len] == \
                raw_in[s_off:s_off + s_len]
            found += 1
    assert found == 2  # one bloom-filtered column per source file
    got = spark.read.parquet(out)
    assert got.count() == 2000
    probe = got.filter(F.col("v") == F.sha1(F.lit("1500"))).collect()
    assert len(probe) == 1 and probe[0]["id"] == 1500
