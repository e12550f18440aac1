"""ColumnChunk — the unit every codec encodes/decodes.

One column of one partition, held as numpy buffers:

  kind 'int'    values: np.int64       (ints of any width, timestamps as us)
  kind 'float'  values: np.float64/32  (stored bit-exact, never re-rounded)
  kind 'bool'   values: np.bool_
  kind 'bin'    data: bytes + offsets: np.int64 (n+1)  (strings kept as UTF-8
                bytes end-to-end: bit-identical round-trip per the north rule,
                including "" which is distinct from null — the reference
                coerces ""->null for CSV only, ConvertThread.java:70-71; we
                never do for data columns)

`mask` is a validity bitmap (True == valid) or None when no nulls. `values`
/`data` hold only the VALID slots; decode re-expands to logical positions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

KINDS = ("int", "float", "bool", "bin", "flist", "nested")
# flist: list<numeric>; nested: struct/map/list<non-numeric> carried as
# one Arrow IPC stream section (bit-exact, zstd floor) — typed codecs
# stay for leaf types, nested shapes never refuse

_PA_INT = {
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
}


@dataclass
class ColumnChunk:
    kind: str
    nrows: int  # logical rows incl. nulls
    values: np.ndarray | None = None  # int/float/bool kinds
    data: bytes = b""  # bin kind
    offsets: np.ndarray | None = None  # bin kind, int64, len == nvalid+1
    mask: np.ndarray | None = None  # True == valid; None == all valid
    meta: dict = field(default_factory=dict)  # original arrow type info
    # flist only: element-level validity over the LOGICAL element positions
    # (len == offsets[-1]); values holds only the valid elements. None when
    # every element of every valid row is non-null.
    child_mask: np.ndarray | None = None

    @property
    def nvalid(self) -> int:
        return self.nrows if self.mask is None else int(self.mask.sum())

    def total_bytes(self) -> int:
        """Uncompressed logical payload size (for ratio reporting)."""
        if self.kind == "nested":
            return int(self.meta.get("nbytes", len(self.data)))
        if self.kind == "bin":
            return len(self.data) + 4 * self.nrows
        if self.values is None:
            return 0
        if self.kind == "flist":
            return self.values.dtype.itemsize * len(self.values) + 4 * self.nrows
        words = 2 if self.meta.get("dec_words") == 2 else 1
        return self.values.dtype.itemsize * words * self.nrows


def _mask_from_arrow(arr: pa.Array) -> np.ndarray | None:
    if arr.null_count == 0:
        return None
    return ~np.asarray(arr.is_null())


def from_arrow(arr: pa.Array | pa.ChunkedArray) -> ColumnChunk:
    """Arrow array -> ColumnChunk. Strings become raw UTF-8 bytes."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    nrows = len(arr)
    mask = _mask_from_arrow(arr)
    meta = {"arrow_type": str(t)}

    if pa.types.is_timestamp(t):
        vals = arr.cast(pa.int64())
        v = np.asarray(vals.drop_null() if mask is not None else vals, dtype=np.int64)
        meta["ts_unit"] = t.unit
        meta["ts_tz"] = t.tz or ""
        return ColumnChunk("int", nrows, values=v, mask=mask, meta=meta)
    if pa.types.is_date(t):
        # date32->int64 has no direct arrow cast: reinterpret (view) to the
        # same-width int first, then widen (ADVICE r1: cast crashed)
        narrow = pa.int32() if pa.types.is_date32(t) else pa.int64()
        vals = arr.view(narrow).cast(pa.int64())
        v = np.asarray(vals.drop_null() if mask is not None else vals, dtype=np.int64)
        meta["date_bits"] = 32 if pa.types.is_date32(t) else 64
        return ColumnChunk("int", nrows, values=v, mask=mask, meta=meta)
    if pa.types.is_decimal(t):
        # decimal128(p<=38, s): the unscaled mantissa rides the full int
        # codec family (FOR/delta/dict/bit-pack — the ALP scaled-int
        # substrate, impl.py); scale/precision live in meta and decode
        # rebuilds the exact decimal bytes. p<=18 (10^18 < 2^63) travels
        # as one int64 word; wider decimals (r6) as a two-word stream
        # [lo_0..lo_n, hi_0..hi_n] — the hi half is sign-extension runs
        # for most real data, which the int codecs flatten. Beyond
        # decimal128 (p>38) refuse LOUDLY rather than round.
        if not pa.types.is_decimal128(t) or t.precision > 38:
            raise TypeError(
                f"unsupported decimal type for codec layer: {t} — only "
                "decimal128 with precision <= 38 is supported; re-cast "
                "wider columns or exclude them"
            )
        vals = arr.drop_null() if mask is not None else arr
        raw = np.frombuffer(
            vals.buffers()[1], dtype=np.int64,
            count=2 * (vals.offset + len(vals)),
        ).reshape(-1, 2)[vals.offset:vals.offset + len(vals)]
        lo, hi = raw[:, 0].copy(), raw[:, 1]
        meta["dec_precision"] = t.precision
        meta["dec_scale"] = t.scale
        # 16-byte two's complement, little-endian word order: for values
        # inside int64 the high word is pure sign extension of the low
        if len(lo) == 0 or bool(np.array_equal(hi, lo >> 63)):
            return ColumnChunk("int", nrows, values=lo, mask=mask,
                               meta=meta)
        meta["dec_words"] = 2
        return ColumnChunk("int", nrows,
                           values=np.concatenate([lo, hi.copy()]),
                           mask=mask, meta=meta)
    if t in _PA_INT or pa.types.is_integer(t):
        vals = arr.cast(pa.int64())
        v = np.asarray(vals.drop_null() if mask is not None else vals, dtype=np.int64)
        return ColumnChunk("int", nrows, values=v, mask=mask, meta=meta)
    if pa.types.is_floating(t):
        dt = np.float32 if pa.types.is_float32(t) else np.float64
        vals = arr.drop_null() if mask is not None else arr
        return ColumnChunk(
            "float", nrows, values=np.asarray(vals, dtype=dt), mask=mask, meta=meta
        )
    if pa.types.is_boolean(t):
        vals = arr.drop_null() if mask is not None else arr
        return ColumnChunk(
            "bool", nrows, values=np.asarray(vals, dtype=np.bool_), mask=mask, meta=meta
        )
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        child = t.value_type
        if not (pa.types.is_floating(child) or pa.types.is_integer(child)):
            return _nested_chunk(arr, nrows, meta)  # list<string/struct/...>
        vals = arr.drop_null() if mask is not None else arr
        if pa.types.is_fixed_size_list(t):
            vals = vals.cast(pa.list_(child))
        vals = vals.cast(pa.large_list(child))
        bufs = vals.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int64, count=len(vals) + 1).copy()
        flat = vals.values.slice(int(off[0]), int(off[-1] - off[0]))
        off = off - off[0]
        dt = np.dtype(child.to_pandas_dtype())
        # element-level nulls: np.asarray would silently turn them into
        # NaN / INT64_MIN (ADVICE r1) — densify to valid elements + carry
        # a child validity mask instead
        child_mask = None
        if flat.null_count:
            child_mask = ~np.asarray(flat.is_null())
            flat = flat.drop_null()
        v = np.asarray(flat, dtype=dt).copy()
        meta["list_child"] = str(child)
        return ColumnChunk("flist", nrows, values=v, offsets=off, mask=mask,
                           meta=meta, child_mask=child_mask)
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        target = pa.large_binary()
        vals = (arr.drop_null() if mask is not None else arr).cast(target)
        buffers = vals.buffers()  # [validity, offsets, data]
        off = np.frombuffer(buffers[1], dtype=np.int64, count=len(vals) + 1).copy()
        dat = buffers[2].to_pybytes() if buffers[2] is not None else b""
        # normalize offsets to start at 0 (sliced arrays)
        dat = dat[off[0] : off[-1]]
        off = off - off[0]
        return ColumnChunk("bin", nrows, data=dat, offsets=off, mask=mask, meta=meta)
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return _nested_chunk(arr, nrows, meta)
    raise TypeError(f"unsupported arrow type for codec layer: {t}")


def _nested_chunk(arr: pa.Array, nrows: int, meta: dict) -> ColumnChunk:
    """struct/map/list<non-numeric> fallback: the WHOLE array (nulls
    included — no mask) serialized as one Arrow IPC stream. Bit-exact
    round trip for any nestable shape; the container's per-section zstd
    floor provides the compression. Leaf-typed codecs remain the fast
    path for flat columns."""
    tbl = pa.table({"v": arr})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    meta["nbytes"] = int(arr.nbytes)
    return ColumnChunk("nested", nrows,
                       data=sink.getvalue().to_pybytes(), meta=meta)


def to_arrow(chunk: ColumnChunk) -> pa.Array:
    """ColumnChunk -> Arrow array of the original type (round-trip exact)."""
    if chunk.kind == "nested":
        tbl = pa.ipc.open_stream(pa.py_buffer(chunk.data)).read_all()
        return tbl.column("v").combine_chunks()
    mask = chunk.mask
    if chunk.kind == "flist":
        child = pa.type_for_alias(chunk.meta["list_child"])
        off = chunk.offsets if chunk.offsets is not None else np.zeros(1, np.int64)
        flat = pa.array(chunk.values, type=child)
        if chunk.child_mask is not None:
            flat = _respread(flat, len(chunk.child_mask), chunk.child_mask)
        valid = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), flat
        )
        out = _respread(valid, chunk.nrows, mask)
        orig = chunk.meta.get("arrow_type", "")
        if orig.startswith("large_list"):
            return out
        return out.cast(pa.list_(child))
    if chunk.kind == "int" and chunk.meta.get("dec_precision") is not None:
        # before the alias lookup: "decimal128(p, s)" has no pa alias
        m = np.asarray(chunk.values, dtype=np.int64)
        if chunk.meta.get("dec_words") == 2:
            n = len(m) // 2
            raw = np.empty((n, 2), dtype=np.int64)
            raw[:, 0] = m[:n]
            raw[:, 1] = m[n:]
        else:
            raw = np.empty((len(m), 2), dtype=np.int64)
            raw[:, 0] = m
            raw[:, 1] = m >> 63  # sign extension into the high word
        valid = pa.Array.from_buffers(
            pa.decimal128(chunk.meta["dec_precision"],
                          chunk.meta["dec_scale"]),
            raw.shape[0], [None, pa.py_buffer(raw.tobytes())],
        )
        return _respread(valid, chunk.nrows, mask)
    t = pa.type_for_alias(_normalize_alias(chunk.meta.get("arrow_type", "")))
    if chunk.kind == "bin":
        off = chunk.offsets if chunk.offsets is not None else np.zeros(1, np.int64)
        valid = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            len(off) - 1,
            [None, pa.py_buffer(off.astype(np.int64).tobytes()), pa.py_buffer(chunk.data)],
        )
        out = _respread(valid, chunk.nrows, mask)
        return out.cast(t)
    vals = chunk.values
    if chunk.kind == "int" and chunk.meta.get("ts_unit"):
        tz = chunk.meta.get("ts_tz") or None
        t = pa.timestamp(chunk.meta["ts_unit"], tz=tz)
        valid = pa.array(vals, type=pa.int64()).cast(t)
        return _respread(valid, chunk.nrows, mask)
    if chunk.kind == "int" and chunk.meta.get("date_bits"):
        if chunk.meta["date_bits"] == 32:
            valid = pa.array(vals, type=pa.int64()).cast(pa.int32()).view(pa.date32())
        else:
            valid = pa.array(vals, type=pa.int64()).view(pa.date64())
        return _respread(valid, chunk.nrows, mask)
    valid = pa.array(vals)
    return _respread(valid, chunk.nrows, mask).cast(t)


def _respread(valid: pa.Array, nrows: int, mask: np.ndarray | None) -> pa.Array:
    """Re-expand a dense (valid-only) array to logical positions with nulls."""
    if mask is None:
        return valid
    idx = np.full(nrows, -1, dtype=np.int64)
    idx[mask] = np.arange(int(mask.sum()), dtype=np.int64)
    take_idx = pa.array(idx, type=pa.int64())
    take_idx = pa.compute.if_else(
        pa.compute.equal(take_idx, pa.scalar(-1, pa.int64())),
        pa.scalar(None, pa.int64()),
        take_idx,
    )
    return valid.take(take_idx)


def _normalize_alias(name: str) -> str:
    # pa.type_for_alias understands most str(type) forms; map the exceptions.
    if not name:
        return "large_binary"
    if name.startswith("timestamp"):
        return "int64"  # handled by ts branch before alias lookup
    if name.startswith("large_string"):
        return "large_string"
    return name
