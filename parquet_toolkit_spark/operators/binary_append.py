"""Zero-decode parquet merge: row-group binary append (M3 parity).

The reference's tree merger concatenates whole files WITHOUT decoding any
page: `TreeMergeThread.java:110-131` calls parquet-mr's
`ParquetFileWriter.appendFile` (`writer.appendFile(...)` at `:116`), which
copies raw row-group bytes and rewrites the footer with shifted offsets.
Neither Spark's writer nor pyarrow exposes that surgery, so this module
does it directly on the public parquet-format layout
(https://github.com/apache/parquet-format: PAR1 magic, row-group data,
thrift-compact FileMetaData footer, 4-byte LE footer length, PAR1):

  * copy each input row group's byte span verbatim (dictionary pages,
    data pages, statistics-bearing headers — everything) into the output;
  * parse each input footer with `sources/thrift_lite` (schema-free, so
    unknown future fields survive untouched), shift every offset field by
    the placement delta, and emit one merged footer.

No value is ever decompressed or decoded — merge cost is IO, not CPU.
Compare `operators/layout.compact`, the decode+re-encode path that allows
codec/row-group re-tuning; this one is the no-retuning fast path, exactly
the reference's M3/M1 split.

Offset fields patched (ids from apache/parquet-format parquet.thrift):
  RowGroup.file_offset(5); ColumnChunk.file_offset(2);
  ColumnMetaData.data_page_offset(9), .index_page_offset(10),
  .dictionary_page_offset(11).
Page indexes and bloom filters (ColumnChunk 4-7, ColumnMetaData 14/15)
live OUTSIDE the row-group span, but they are CARRIED, not dropped:
ColumnIndex and bloom bytes copy raw (they hold values, not offsets)
and OffsetIndex — which contains absolute page offsets — is parsed,
shifted, and re-serialized through the same thrift codec. parquet-mr's
appendFile drops all three; keeping them preserves page skipping and
bloom point lookups on the merged file.
"""

from __future__ import annotations

import struct

from parquet_toolkit_spark.sources import thrift_lite as tl
from parquet_toolkit_spark.sources.fs import task_fs

_MAGIC = b"PAR1"
_COPY_BUF = 8 << 20

# FileMetaData field ids
_FMD_VERSION = 1
_FMD_SCHEMA = 2
_FMD_NUM_ROWS = 3
_FMD_ROW_GROUPS = 4
_FMD_KV_META = 5
_FMD_CREATED_BY = 6
_FMD_COLUMN_ORDERS = 7
_FMD_ENCRYPTION = 8
_FMD_SIGNING_KEY = 9

# RowGroup field ids
_RG_COLUMNS = 1
_RG_NUM_ROWS = 3
_RG_FILE_OFFSET = 5
_RG_ORDINAL = 7

# ColumnChunk field ids
_CC_FILE_PATH = 1
_CC_FILE_OFFSET = 2
_CC_META = 3
_CC_OFFIDX_OFF = 4
_CC_OFFIDX_LEN = 5
_CC_COLIDX_OFF = 6
_CC_COLIDX_LEN = 7
_CC_CRYPTO = 8
_CC_ENC_META = 9

# ColumnMetaData field ids
_CM_TOTAL_COMPRESSED = 7
_CM_DATA_PAGE_OFF = 9
_CM_INDEX_PAGE_OFF = 10
_CM_DICT_PAGE_OFF = 11
_CM_BLOOM_OFF = 14
_CM_BLOOM_LEN = 15
_CM_BLOOM_FIELDS = (14, 15)

# OffsetIndex / PageLocation / BloomFilterHeader field ids
_OI_PAGE_LOCATIONS = 1
_PL_OFFSET = 1
_BFH_NUM_BYTES = 1


class AppendError(ValueError):
    pass


def read_footer(path: str) -> tuple[list, int, int]:
    """Parse a parquet file's FileMetaData.

    Returns (fields, footer_start, file_size); `fields` is the
    thrift_lite struct field list. IO goes through the pyarrow fs shim
    (sources/fs.task_fs), so hdfs:// and s3 paths work wherever the
    corresponding pyarrow filesystem is available."""
    fs, p = task_fs(path)
    size = fs.get_file_info(p).size
    if size is None or size < 12:
        raise AppendError(f"{path}: not a parquet file (too small)")
    with fs.open_input_file(p) as f:
        head = bytes(f.read(4))
        f.seek(size - 8)
        tail = bytes(f.read(8))
        if head != _MAGIC or tail[4:] != _MAGIC:
            raise AppendError(f"{path}: missing PAR1 magic")
        flen = struct.unpack("<I", tail[:4])[0]
        footer_start = size - 8 - flen
        if footer_start < 4:
            raise AppendError(f"{path}: corrupt footer length {flen}")
        f.seek(footer_start)
        tree = tl.loads(bytes(f.read(flen)))
    return tree[1], footer_start, size


def _i64(fields: list, fid: int) -> int | None:
    v = tl.get(fields, fid)
    return None if v is None else int(v[1])


def _chunk_span(cc_fields: list) -> tuple[int, int]:
    """[start, end) byte span of one column chunk's pages."""
    meta = tl.get(cc_fields, _CC_META)
    if meta is None:
        raise AppendError("column chunk without inline ColumnMetaData "
                          "(external metadata is not supported)")
    m = meta[1]
    data_off = _i64(m, _CM_DATA_PAGE_OFF)
    dict_off = _i64(m, _CM_DICT_PAGE_OFF)
    comp = _i64(m, _CM_TOTAL_COMPRESSED)
    if data_off is None or comp is None:
        raise AppendError("column chunk missing data_page_offset/"
                          "total_compressed_size")
    start = data_off if dict_off is None else min(dict_off, data_off)
    return start, start + comp


def _rg_span(rg_fields: list) -> tuple[int, int]:
    cols = tl.get(rg_fields, _RG_COLUMNS)
    if cols is None or not cols[2]:
        raise AppendError("row group without column chunks")
    spans = [_chunk_span(cc) for cc in cols[2]]
    return min(s for s, _ in spans), max(e for _, e in spans)


def _shift(fields: list, fid: int, delta: int) -> list:
    v = tl.get(fields, fid)
    if v is None:
        return fields
    return tl.set_field(fields, fid, (v[0], int(v[1]) + delta))


def _read_at(src, off: int, ln: int) -> bytes:
    src.seek(off)
    b = bytes(src.read(ln))
    if len(b) != ln:
        raise AppendError("truncated index/bloom region")
    return b


def _shift_offset_index(raw: bytes, delta: int) -> bytes:
    """Shift every PageLocation.offset inside a serialized OffsetIndex.

    Unlike ColumnIndex (pure min/max values) the OffsetIndex CONTAINS
    absolute page offsets, so a raw copy would point at the old file's
    positions — it must be parsed, shifted, and re-serialized."""
    fields = tl.loads(raw)[1]
    pls = tl.get(fields, _OI_PAGE_LOCATIONS)
    if pls is None:
        return raw
    shifted = [_shift(pl, _PL_OFFSET, delta) for pl in pls[2]]
    fields = tl.set_field(fields, _OI_PAGE_LOCATIONS,
                          (pls[0], pls[1], shifted))
    return tl.dumps(("struct", fields))


def _bloom_total_len(src, off: int, declared: int | None,
                     file_size: int) -> int | None:
    """Byte length of a serialized bloom filter (header + bitset).

    Newer writers record bloom_filter_length; older ones only the
    offset, so the BloomFilterHeader (a thrift compact struct holding
    numBytes) is parsed from the front to size the copy."""
    if declared is not None:
        return declared
    probe = _read_at(src, off, min(256, file_size - off))
    try:
        header, consumed = tl.loads_prefix(probe)
    except tl.ThriftError:
        return None
    nb = tl.get(header[1], _BFH_NUM_BYTES)
    if nb is None:
        return None
    return consumed + int(nb[1])


def _patch_row_group(rg_fields: list, delta: int, ordinal: int,
                     src=None, out=None, file_size: int = 0) -> list:
    """Shift a RowGroup's offsets by `delta`; when `src`/`out` are given
    also CARRY the chunk's page index and bloom filter: ColumnIndex and
    bloom bytes copy raw (no internal offsets), OffsetIndex is rewritten
    with shifted page offsets. parquet-mr's appendFile drops all three;
    preserving them keeps page skipping and point lookups working on the
    merged file. Structures that cannot be sized are dropped, never
    mis-copied."""
    outf = _shift(rg_fields, _RG_FILE_OFFSET, delta)
    if tl.get(outf, _RG_ORDINAL) is not None:
        # ordinal is i16; a >32k-group merge drops the optional field
        # rather than emit values a strict reader wraps negative
        outf = (tl.set_field(outf, _RG_ORDINAL, ("i16", ordinal))
                if ordinal <= 32767 else
                tl.drop_fields(outf, (_RG_ORDINAL,)))
    cols = tl.get(outf, _RG_COLUMNS)
    new_cols = []
    for cc in cols[2]:
        if tl.get(cc, _CC_FILE_PATH) is not None:
            raise AppendError("column chunk stored in an external file "
                              "(ColumnChunk.file_path) — cannot append")
        if tl.get(cc, _CC_CRYPTO) is not None or \
                tl.get(cc, _CC_ENC_META) is not None:
            raise AppendError("encrypted column chunk — cannot append")
        cc = _shift(cc, _CC_FILE_OFFSET, delta)
        meta = tl.get(cc, _CC_META)
        m = meta[1]
        for f in (_CM_DATA_PAGE_OFF, _CM_INDEX_PAGE_OFF, _CM_DICT_PAGE_OFF):
            m = _shift(m, f, delta)
        carry = src is not None and out is not None
        # ColumnIndex: value stats only — raw copy to the new position
        ci_off, ci_len = _i64(cc, _CC_COLIDX_OFF), _i64(cc, _CC_COLIDX_LEN)
        if carry and ci_off is not None and ci_len is not None:
            pos = out.tell()
            out.write(_read_at(src, ci_off, ci_len))
            cc = tl.set_field(cc, _CC_COLIDX_OFF, ("i64", pos))
        else:
            cc = tl.drop_fields(cc, (_CC_COLIDX_OFF, _CC_COLIDX_LEN))
        # OffsetIndex: parse + shift page offsets + re-serialize
        oi_off, oi_len = _i64(cc, _CC_OFFIDX_OFF), _i64(cc, _CC_OFFIDX_LEN)
        if carry and oi_off is not None and oi_len is not None:
            blob = _shift_offset_index(_read_at(src, oi_off, oi_len), delta)
            pos = out.tell()
            out.write(blob)
            cc = tl.set_field(cc, _CC_OFFIDX_OFF, ("i64", pos))
            cc = tl.set_field(cc, _CC_OFFIDX_LEN, ("i32", len(blob)))
        else:
            cc = tl.drop_fields(cc, (_CC_OFFIDX_OFF, _CC_OFFIDX_LEN))
        # Bloom filter: header+bitset raw copy (no internal offsets)
        bf_off = _i64(m, _CM_BLOOM_OFF)
        total = (_bloom_total_len(src, bf_off, _i64(m, _CM_BLOOM_LEN),
                                  file_size)
                 if carry and bf_off is not None else None)
        if total is not None:
            pos = out.tell()
            out.write(_read_at(src, bf_off, total))
            m = tl.set_field(m, _CM_BLOOM_OFF, ("i64", pos))
            m = tl.set_field(m, _CM_BLOOM_LEN, ("i32", total))
        else:
            m = tl.drop_fields(m, _CM_BLOOM_FIELDS)
        cc = tl.set_field(cc, _CC_META, ("struct", m))
        new_cols.append(cc)
    return tl.set_field(outf, _RG_COLUMNS, (cols[0], cols[1], new_cols))


def _copy_span(src, dst, start: int, end: int) -> None:
    src.seek(start)
    left = end - start
    while left > 0:
        chunk = bytes(src.read(min(_COPY_BUF, left)))
        if not chunk:
            raise AppendError("input truncated mid row group")
        dst.write(chunk)
        left -= len(chunk)


def _parent_dir(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[0] if "/" in path.rstrip("/") \
        else "."


def _write_footer(out, schema, row_groups: list, num_rows: int,
                  version: int, kv_meta, created_by, orders) -> None:
    fmd = [(_FMD_VERSION, ("i32", version)),
           (_FMD_SCHEMA, schema),
           (_FMD_NUM_ROWS, ("i64", num_rows)),
           (_FMD_ROW_GROUPS, ("list", tl.T_STRUCT, row_groups))]
    if kv_meta is not None:
        fmd.append((_FMD_KV_META, kv_meta))
    if created_by is not None:
        fmd.append((_FMD_CREATED_BY, created_by))
    if orders is not None:
        fmd.append((_FMD_COLUMN_ORDERS, orders))
    footer = tl.dumps(("struct", fmd))
    out.write(footer)
    out.write(struct.pack("<I", len(footer)))
    out.write(_MAGIC)


def append_files(in_paths: list[str], out_path: str) -> dict:
    """Merge parquet files into one by raw row-group copy (zero decode).

    All inputs must share one schema (byte-compared on the parsed footer
    schema tree) and column orders; encrypted files and external column
    chunks are refused. Inputs with zero row groups are skipped (M6
    parity). Writes to `out_path + '.inprogress'` then renames — the same
    temp-suffix commit as the reference (MergeThread temp naming)."""
    if not in_paths:
        raise AppendError("no input files")
    tmp = out_path + ".inprogress"
    ofs, otmp = task_fs(tmp)
    ofs.create_dir(_parent_dir(otmp), recursive=True)
    try:
        return _append_into(ofs, otmp, out_path, in_paths)
    except BaseException:
        # never leave a partial .inprogress behind: task retries of the
        # same bin would otherwise stack orphans on the target fs
        try:
            ofs.delete_file(otmp)
        except OSError:
            pass
        raise


def _append_into(ofs, otmp: str, out_path: str,
                 in_paths: list[str]) -> dict:
    base_schema = None
    base_orders = None
    merged_rgs = []
    total_rows = 0
    version = 1
    kv_meta = None
    created_by = None
    bytes_copied = 0
    with ofs.open_output_stream(otmp, compression=None) as out:
        out.write(_MAGIC)
        for path in in_paths:
            fields, _, fsize = read_footer(path)
            if tl.get(fields, _FMD_ENCRYPTION) is not None or \
                    tl.get(fields, _FMD_SIGNING_KEY) is not None:
                raise AppendError(f"{path}: encrypted footer — cannot append")
            schema = tl.get(fields, _FMD_SCHEMA)
            orders = tl.get(fields, _FMD_COLUMN_ORDERS)
            if base_schema is None:
                base_schema = schema
                base_orders = orders
                kv_meta = tl.get(fields, _FMD_KV_META)
                created_by = tl.get(fields, _FMD_CREATED_BY)
            elif schema != base_schema:
                raise AppendError(
                    f"{path}: schema differs from {in_paths[0]} — binary "
                    "append requires identical schemas (use layout.compact "
                    "for schema evolution)")
            elif orders != base_orders:
                raise AppendError(f"{path}: column_orders differ — refuse")
            v = tl.get(fields, _FMD_VERSION)
            if v is not None:
                version = max(version, int(v[1]))
            rgs = tl.get(fields, _FMD_ROW_GROUPS)
            if rgs is None or not rgs[2]:
                continue  # empty file: skip, like the reference's M6
            sfs, sp = task_fs(path)
            with sfs.open_input_file(sp) as src:
                for rg in rgs[2]:
                    start, end = _rg_span(rg)
                    delta = out.tell() - start
                    _copy_span(src, out, start, end)
                    bytes_copied += end - start
                    merged_rgs.append(_patch_row_group(
                        rg, delta, len(merged_rgs), src=src, out=out,
                        file_size=fsize))
                    total_rows += _i64(rg, _RG_NUM_ROWS) or 0
        if base_schema is None:
            raise AppendError("no readable input footers")
        _write_footer(out, base_schema, merged_rgs, total_rows, version,
                      kv_meta, created_by, base_orders)
    ofs.move(otmp, task_fs(out_path)[1])
    return {"files_in": len(in_paths), "row_groups": len(merged_rgs),
            "rows": total_rows, "bytes_copied": bytes_copied}


def _list_parquet(in_path: str | list[str],
                  spark=None) -> list[tuple[str, int]]:
    """Driver-side listing through DriverFS — the same control plane the
    layout operators use (layout.compact), so hdfs://, s3a:// and other
    Hadoop-resolvable schemes list correctly and remote paths come back
    with their full URI intact (code review r4: a pyarrow from_uri
    round-trip dropped the hdfs authority and rejected s3a outright)."""
    from parquet_toolkit_spark.sources.fs import DriverFS

    paths = [in_path] if isinstance(in_path, str) else list(in_path)
    dfs = DriverFS(spark)
    out = []
    for p in paths:
        try:
            if p.lower().endswith((".parquet", ".parq")):
                out.append((p, dfs.file_size(p)))
            else:
                for fp, sz in dfs.list_files(p):
                    base = fp.rstrip("/").rsplit("/", 1)[-1]
                    if base.startswith(("_", ".")):
                        continue
                    if base.lower().endswith((".parquet", ".parq")):
                        out.append((fp, sz))
        except OSError as e:
            raise AppendError(f"{p}: cannot list input ({e})") from e
    for fp, sz in out:
        if sz is None:
            raise AppendError(f"{fp}: missing or unreadable input file")
    if not out:
        raise AppendError(f"no parquet files under {in_path}")
    return out


def _fresh_dir(path: str, spark=None) -> None:
    """Overwrite semantics for directory outputs (matching Spark's
    write.mode('overwrite')): stale part files from a previous run with
    a different bin count must not survive into the new result."""
    from parquet_toolkit_spark.sources.fs import DriverFS

    dfs = DriverFS(spark)
    if dfs.exists(path):
        dfs.delete(path, recursive=True)
    dfs.mkdirs(path)


def _bin_pack(files: list[tuple[str, int]],
              target_bytes: int) -> list[list[str]]:
    """First-fit in listing order: adjacent files share a bin until the
    bin crosses target — the reference's chunk builder
    (SimpleMultithreadedParquetMerger.java:291-321)."""
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for path, size in files:
        if cur and cur_bytes + size > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(path)
        cur_bytes += size
    if cur:
        bins.append(cur)
    return bins


def append_compact(spark, in_path: str | list[str], out_path: str,
                   target_bytes: int = 128 << 20) -> dict:
    """Distributed zero-decode compaction: bin-pack input files to
    ~target_bytes groups, one Spark task per group, each task streaming a
    raw row-group append into one output file.

    This is the M1/M3 fusion at scale: no shuffle, no decode, no
    re-encode — each task's cost is sequential IO over its own bin. The
    per-task work is pure python file IO (no SparkSession captured), so
    it distributes over executors exactly like the encode kernel's
    per-pid tasks. Arbitrarily wide bins are fine: append_files streams
    inputs one at a time (one input + one output handle open at any
    moment), so a 10^5-file bin needs no fan-in staging — the
    reference's tree recursion existed for Java THREAD parallelism
    (TreeMultithreadedParquetMerger.java:255-278), which Spark's task
    scheduling replaces.
    """
    files = _list_parquet(in_path, spark)
    bins = _bin_pack(files, target_bytes)
    out_dir = out_path.rstrip("/")
    _fresh_dir(out_dir, spark)
    tasks = [(i, b) for i, b in enumerate(bins)]

    def _merge_one(task):
        idx, paths = task
        dest = f"{out_dir}/part-{idx:05d}.parquet"
        return {"part": idx, **append_files(paths, dest)}

    sc = spark.sparkContext
    results = sc.parallelize(tasks, len(tasks)).map(_merge_one).collect()
    return {"n_bins": len(bins), "files_in": len(files),
            "rows": sum(r["rows"] for r in results),
            "row_groups": sum(r["row_groups"] for r in results),
            "bytes_copied": sum(r["bytes_copied"] for r in results)}


def _split_one(task) -> dict:
    """Write one output file holding a contiguous row-group range of one
    source file (pure python; runs inside a Spark task)."""
    src, rg_lo, rg_hi, dest = task
    fields, _, fsize = read_footer(src)
    rgs = tl.get(fields, _FMD_ROW_GROUPS)[2][rg_lo:rg_hi]
    tmp = dest + ".inprogress"
    rows = 0
    out_rgs = []
    ofs, otmp = task_fs(tmp)
    sfs, sp = task_fs(src)
    try:
        with ofs.open_output_stream(otmp, compression=None) as out, \
                sfs.open_input_file(sp) as fh:
            out.write(_MAGIC)
            for rg in rgs:
                start, end = _rg_span(rg)
                delta = out.tell() - start
                _copy_span(fh, out, start, end)
                out_rgs.append(_patch_row_group(rg, delta, len(out_rgs),
                                                src=fh, out=out,
                                                file_size=fsize))
                rows += _i64(rg, _RG_NUM_ROWS) or 0
            v = tl.get(fields, _FMD_VERSION)
            _write_footer(out, tl.get(fields, _FMD_SCHEMA), out_rgs, rows,
                          int(v[1]) if v is not None else 1,
                          tl.get(fields, _FMD_KV_META),
                          tl.get(fields, _FMD_CREATED_BY),
                          tl.get(fields, _FMD_COLUMN_ORDERS))
        ofs.move(otmp, task_fs(dest)[1])
    except BaseException:
        try:
            ofs.delete_file(otmp)
        except OSError:
            pass
        raise
    return {"rows": rows, "row_groups": len(out_rgs)}


def split_row_groups(spark, in_path: str | list[str], out_path: str,
                     target_bytes: int = 128 << 20,
                     strict: bool = False) -> dict:
    """Zero-decode split: chop files into ~target_bytes outputs at ROW
    GROUP granularity (the dual of append_compact; P1/P2 fast path).

    Contiguous row groups bin first-fit by their on-disk span until the
    bin crosses target; each bin becomes one output file via raw byte
    copy + a rewritten footer — no page is decoded. Granularity bound,
    stated plainly: a single row group larger than target_bytes cannot
    be split without decoding (the reference splitter rolls at ROW
    granularity because it decodes every record,
    SimpleParquetSplitter.java:118-130) — such a group gets its own
    output file. Use layout.split_by_size for row-exact splitting with
    re-encode. One Spark task per output file; refusal rules match
    append_files (encryption, external chunks). strict=True refuses
    when the input is not larger than target (the reference guard,
    SimpleParquetSplitter.java:89-91 — same contract as
    layout.split_by_size(strict=True))."""
    files = _list_parquet(in_path, spark)
    if strict:
        total = sum(sz for _, sz in files)
        if total <= target_bytes:
            raise AppendError(
                f"split_row_groups(strict=True): input is {total} bytes, "
                f"not larger than target_bytes={target_bytes} — nothing "
                "to split")
    tasks = []
    for src, _ in files:
        fields, _, _ = read_footer(src)
        if tl.get(fields, _FMD_ENCRYPTION) is not None or \
                tl.get(fields, _FMD_SIGNING_KEY) is not None:
            raise AppendError(f"{src}: encrypted footer — cannot split")
        rgs = tl.get(fields, _FMD_ROW_GROUPS)
        if rgs is None or not rgs[2]:
            continue
        spans = [_rg_span(rg) for rg in rgs[2]]
        lo = 0
        cur = 0
        for i, (s, e) in enumerate(spans):
            size = e - s
            # a bin takes at least one row group (i > lo): an oversize
            # group becomes its own file rather than an infinite loop
            if i > lo and cur + size > target_bytes:
                tasks.append((src, lo, i))
                lo, cur = i, 0
            cur += size
        tasks.append((src, lo, len(spans)))
    if not tasks:
        # refuse BEFORE touching the output dir: wiping a previous good
        # result and then erroring would leave the caller with nothing
        raise AppendError(f"no row groups under {in_path}")
    out_dir = out_path.rstrip("/")
    _fresh_dir(out_dir, spark)
    jobs = [(src, a, b, f"{out_dir}/part-{i:05d}.parquet")
            for i, (src, a, b) in enumerate(tasks)]
    results = spark.sparkContext.parallelize(jobs, len(jobs)) \
        .map(_split_one).collect()
    return {"files_in": len(files), "files_out": len(jobs),
            "rows": sum(r["rows"] for r in results),
            "row_groups": sum(r["row_groups"] for r in results)}


def append_by_schema(spark, in_path: str | list[str], out_path: str,
                     target_bytes: int = 128 << 20) -> dict:
    """M5 semantics on the zero-decode path: group input files by their
    exact footer schema (byte-compared parsed schema tree + column
    orders) and run one bin-packed append per group, outputs suffixed
    `-schema-N` for groups beyond the first — the reference's deferred
    schema-group merge (SimpleMergeThread.java:167-176, suffix naming
    SimpleMultithreadedParquetMerger.java:341-348; the tree merger
    likewise reduces to one file PER schema)."""
    files = _list_parquet(in_path, spark)
    groups: dict[bytes, list[tuple[str, int]]] = {}
    order: list[bytes] = []
    for path, size in files:
        fields, _, _ = read_footer(path)
        key = tl.dumps(("struct", [
            (1, tl.get(fields, _FMD_SCHEMA)),
            (2, tl.get(fields, _FMD_COLUMN_ORDERS) or ("list", 0, [])),
        ]))
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append((path, size))
    results = []
    for i, key in enumerate(order):
        dest = out_path.rstrip("/") if i == 0 else \
            out_path.rstrip("/") + f"-schema-{i}"
        info = append_compact(spark, [p for p, _ in groups[key]], dest,
                              target_bytes=target_bytes)
        results.append({"out": dest, **info})
    return {"schema_groups": len(order), "groups": results,
            "rows": sum(r["rows"] for r in results)}


def tree_merge(spark, in_path: str | list[str], out_file: str,
               fan_in: int = 5) -> dict:
    """Faithful M3 shape: tree-reduce ALL inputs to ONE file, chunks of
    `fan_in` per round, each round's merges running as parallel Spark
    tasks (TreeMultithreadedParquetMerger.java:255-278, default
    threadChunkSize=5 at :40-41). For size-targeted output use
    append_compact — one file is the reference's semantic, not a 100 TB
    layout."""
    if fan_in < 2:
        raise AppendError(
            f"tree_merge: fan_in must be >= 2, got {fan_in} (a fan-in of "
            "1 reduces nothing and would loop forever)")
    files = [p for p, _ in _list_parquet(in_path, spark)]
    sc = spark.sparkContext
    # intermediates go on the DESTINATION filesystem: on a real cluster
    # round N+1's tasks must read round N's outputs, so a driver-local
    # tempdir would only work in local mode
    scratch = out_file + ".tmp-rounds"
    sfs, scratch_p = task_fs(scratch)
    sfs.create_dir(scratch_p, recursive=True)
    rounds = 0
    try:
        while len(files) > 1:
            chunks = [files[i:i + fan_in]
                      for i in range(0, len(files), fan_in)]
            final = len(chunks) == 1
            outs = [out_file if final else
                    f"{scratch}/r{rounds}-{i}.parquet"
                    for i in range(len(chunks))]
            work = [(c, o) for c, o in zip(chunks, outs) if len(c) > 1]
            passthrough = {i: c[0] for i, c in enumerate(chunks)
                           if len(c) == 1}
            if work:
                sc.parallelize(work, len(work)).map(
                    lambda t: append_files(t[0], t[1])).collect()
            files = [passthrough.get(i, outs[i])
                     for i in range(len(chunks))]
            rounds += 1
        if files[0] != out_file:
            # single-input edge: one append pass rewrites the footer
            append_files(files, out_file)
        fields, _, size = read_footer(out_file)
        rgs = tl.get(fields, _FMD_ROW_GROUPS)
        info = {"rows": _i64(fields, _FMD_NUM_ROWS),
                "row_groups": len(rgs[2]) if rgs else 0,
                "bytes_copied": size}
    finally:
        sfs.delete_dir(scratch_p)
    return {"rounds": max(rounds, 1), **info}
