"""Codec implementations over ColumnChunk valid-values.

Every codec is a pair of pure functions:

    encode(chunk)  -> (sections: dict[str, bytes], cmeta: dict)   # JSON-able
    decode(sections, cmeta, nvalid) -> chunk payload fields

The container (container.py) owns null masks, arrow-type metadata and
per-section zstd. Codecs see only the dense valid values.

Codec family per the north rule: dictionary, RLE, FSST, bit-packing,
frame-of-reference (+ delta and plain floors). The reference toolkit never
encodes — it defers to parquet-mr (e.g. merge/ParquetMergerImpl.java:46-58
writes SNAPPY pages); these are new, Spark-era operators (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np

from parquet_toolkit_spark.codecs import fsst as fsst_mod
from parquet_toolkit_spark.codecs.bits import (
    bit_width,
    pack_uints,
    unpack_uints,
    zigzag_decode,
    zigzag_encode,
)

# ---------------------------------------------------------------- int codecs


def enc_int_plain(v: np.ndarray) -> tuple[dict, dict]:
    return {"data": v.astype(np.int64).tobytes()}, {}


def dec_int_plain(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    return np.frombuffer(sections["data"], dtype=np.int64)


def enc_int_for(v: np.ndarray) -> tuple[dict, dict]:
    """Frame-of-reference: subtract min, bit-pack the non-negative deltas."""
    if len(v) == 0:
        return {"data": b""}, {"ref": 0, "width": 0}
    ref = int(v.min())
    deltas = (v.astype(np.int64) - ref).view(np.uint64)
    w = bit_width(int(deltas.max()))
    return {"data": pack_uints(deltas, w)}, {"ref": ref, "width": w}


def dec_int_for(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    deltas = unpack_uints(sections["data"], cmeta["width"], n)
    return deltas.view(np.int64) + np.int64(cmeta["ref"])


def enc_int_delta(v: np.ndarray) -> tuple[dict, dict]:
    """Delta + zigzag + bit-pack; wins on sorted/near-sorted columns."""
    if len(v) == 0:
        return {"data": b""}, {"first": 0, "width": 0}
    first = int(v[0])
    d = np.diff(v.astype(np.int64), prepend=np.int64(first))
    zz = zigzag_encode(d)
    w = bit_width(int(zz.max())) if len(zz) else 0
    return {"data": pack_uints(zz, w)}, {"first": first, "width": w}


def dec_int_delta(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    zz = unpack_uints(sections["data"], cmeta["width"], n)
    d = zigzag_decode(zz)  # d[0] == 0 by construction (prepend=first)
    return np.cumsum(d, dtype=np.int64) + np.int64(cmeta["first"])


def enc_int_dod(v: np.ndarray) -> tuple[dict, dict]:
    """Delta-of-delta: second differences zigzag+bit-packed.

    Wins where the FIRST difference is near-constant but not small —
    steady-cadence timestamps, dense row ids — where int_delta still pays
    bit_width(step) per value and dod pays ~0."""
    if len(v) == 0:
        return {"data": b""}, {"first": 0, "d0": 0, "width": 0}
    v64 = v.astype(np.int64)
    first = int(v64[0])
    d = np.diff(v64)
    d0 = int(d[0]) if len(d) else 0
    dd = np.diff(d, prepend=np.int64(d0))  # dd[0] == 0 by construction
    zz = zigzag_encode(dd)
    w = bit_width(int(zz.max())) if len(zz) else 0
    return {"data": pack_uints(zz, w)}, {"first": first, "d0": d0, "width": w}


def dec_int_dod(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    zz = unpack_uints(sections["data"], cmeta["width"], n - 1)
    dd = zigzag_decode(zz)
    d = np.cumsum(dd, dtype=np.int64) + np.int64(cmeta["d0"])
    out = np.empty(n, dtype=np.int64)
    out[0] = np.int64(cmeta["first"])
    np.cumsum(d, out=out[1:])
    out[1:] += out[0]
    return out


def enc_int_dict(v: np.ndarray) -> tuple[dict, dict]:
    """Dictionary for low-cardinality ints whose RANGE is wide: codes cost
    ceil(log2(ndict)) bits where FOR pays bit_width(max-min) — e.g. 1k
    distinct 63-bit ids pack 10 bits/value instead of ~63. Sorted uniques
    delta-pack; codes FOR-pack (always in [0, ndict))."""
    v64 = v.astype(np.int64)
    uniq, codes = np.unique(v64, return_inverse=True)
    usec, umeta = enc_int_delta(uniq)
    csec, cmeta_ = enc_int_for(codes.astype(np.int64))
    return {"uniq": usec["data"], "codes": csec["data"]}, {
        "ndict": int(len(uniq)), "umeta": umeta, "cmeta": cmeta_,
    }


def dec_int_dict(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    uniq = dec_int_delta({"data": sections["uniq"]}, cmeta["umeta"], cmeta["ndict"])
    codes = dec_int_for({"data": sections["codes"]}, cmeta["cmeta"], n)
    return uniq[codes]


def _runs(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run starts -> (run_values, run_lengths)."""
    if len(v) == 0:
        return v[:0], np.zeros(0, dtype=np.int64)
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(starts, append=len(v))
    return v[starts], lengths


def enc_int_rle(v: np.ndarray) -> tuple[dict, dict]:
    """Run-length encoding; run values FOR-packed, lengths bit-packed."""
    values, lengths = _runs(v.astype(np.int64))
    vals_sec, vals_meta = enc_int_for(values)
    lens_u = (lengths - 1).view(np.uint64)  # lengths >= 1
    lw = bit_width(int(lens_u.max())) if len(lens_u) else 0
    return (
        {"vals": vals_sec["data"], "lens": pack_uints(lens_u, lw)},
        {"nruns": len(values), "vmeta": vals_meta, "lwidth": lw},
    )


def dec_int_rle(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    nruns = cmeta["nruns"]
    values = dec_int_for({"data": sections["vals"]}, cmeta["vmeta"], nruns)
    lengths = unpack_uints(sections["lens"], cmeta["lwidth"], nruns).view(np.int64) + 1
    return np.repeat(values, lengths)


# ------------------------------------------------------------- float / bool


def enc_float_plain(v: np.ndarray) -> tuple[dict, dict]:
    return {"data": v.tobytes()}, {"dtype": v.dtype.str}


def dec_float_plain(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    return np.frombuffer(sections["data"], dtype=np.dtype(cmeta["dtype"]))


def enc_float_shuffle(v: np.ndarray) -> tuple[dict, dict]:
    """Byte-transpose (blosc-style shuffle): groups exponent bytes together
    so the container's zstd pass compresses floats far better."""
    b = np.frombuffer(v.tobytes(), dtype=np.uint8)
    w = v.dtype.itemsize
    return {"data": b.reshape(-1, w).T.copy().tobytes()}, {"dtype": v.dtype.str}


def dec_float_shuffle(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    dt = np.dtype(cmeta["dtype"])
    b = np.frombuffer(sections["data"], dtype=np.uint8)
    return b.reshape(dt.itemsize, -1).T.copy().view(dt).ravel()


# ALP-style decimal-scaled floats (the public VLDB 2023 "ALP" idea,
# implemented from scratch, single-exponent variant): most real-world
# doubles are decimals (prices, quantities, rates). round(v * 10^e) is a
# SMALL int64 whose inverse product reproduces the exact bits; the int
# stream then rides the existing FOR/bit-pack machinery. Values that don't
# reconstruct bit-exactly (NaN, inf, true full-entropy doubles) become
# position+raw-bits exceptions, so the codec is lossless on ANY input and
# self-gating by size in the selector.

_ALP_MAX_EXP = 16
_ALP_POW = 10.0 ** np.arange(_ALP_MAX_EXP + 1)
_ALP_INV = 10.0 ** -np.arange(_ALP_MAX_EXP + 1, dtype=np.float64)
_ALP_INT_LIMIT = float(1 << 51)  # int64-exact and overflow-safe in float64


def _alp_exact_mask(v: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(exact_bits_mask, scaled_int64_values) for exponent e.

    The check goes THROUGH the int64 cast exactly like decode does — a
    float-side check would wrongly admit -0.0, whose sign dies in the
    int round-trip."""
    with np.errstate(invalid="ignore", over="ignore"):
        enc = np.round(v * _ALP_POW[e])
        in_range = np.abs(enc) < _ALP_INT_LIMIT  # False for NaN/inf
        ints = np.where(in_range, enc, 0.0).astype(np.int64)
        dec = ints.astype(np.float64) * _ALP_INV[e]
    exact = in_range & (dec.view(np.int64) == v.view(np.int64))
    return exact, ints


def alp_probe(v: np.ndarray, sample: int = 4096, min_frac: float = 0.5) -> int | None:
    """Smallest decimal exponent reconstructing >=98% of a sample bit-
    exactly (early exit), else the best exponent covering >= min_frac,
    else None (column is not decimal-like; use shuffle/plain)."""
    if v.dtype != np.float64 or len(v) == 0:
        return None
    s = np.ascontiguousarray(v[:: max(1, len(v) // sample)])
    best_e, best_frac = None, min_frac
    for e in range(_ALP_MAX_EXP + 1):
        exact, _ = _alp_exact_mask(s, e)
        frac = float(exact.mean())
        if frac >= 0.98:
            return e
        if frac > best_frac:
            best_e, best_frac = e, frac
    return best_e


def enc_float_alp(v: np.ndarray) -> tuple[dict, dict]:
    """ALP decimal-scaled ints + exceptions; float64 only (float32 columns
    take the shuffle path — their bit patterns rarely survive the float64
    product round-trip and the probe rejects them anyway)."""
    if v.dtype != np.float64:
        raise TypeError("float_alp encodes float64 only")
    v = np.ascontiguousarray(v)
    e = alp_probe(v) if len(v) else 0
    if e is None:
        e = 0
    exact, ints = _alp_exact_mask(v, e)
    exc_pos = np.flatnonzero(~exact).astype(np.int64)
    if len(exc_pos):
        # fill exceptions with an in-range value so FOR's width stays tight
        fill = ints[exact][0] if exact.any() else np.int64(0)
        ints[exc_pos] = fill
    isec, imeta = enc_int_for(ints)
    psec, pmeta = enc_int_delta(exc_pos)  # positions are sorted
    return (
        {"ints": isec["data"], "exc_pos": psec["data"],
         "exc_val": v[exc_pos].tobytes()},
        {"e": int(e), "imeta": imeta, "n_exc": int(len(exc_pos)),
         "pmeta": pmeta},
    )


def dec_float_alp(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    ints = dec_int_for({"data": sections["ints"]}, cmeta["imeta"], n)
    # same product expression as the encode-side exactness check: the
    # int64 round-trip is exact below 2^51, so bits match by construction
    out = ints.astype(np.float64) * _ALP_INV[cmeta["e"]]
    if cmeta["n_exc"]:
        pos = dec_int_delta(
            {"data": sections["exc_pos"]}, cmeta["pmeta"], cmeta["n_exc"]
        )
        out[pos] = np.frombuffer(sections["exc_val"], dtype=np.float64)
    return out


def enc_bool_bitmap(v: np.ndarray) -> tuple[dict, dict]:
    return {"data": np.packbits(v.astype(np.uint8), bitorder="little").tobytes()}, {}


def dec_bool_bitmap(sections: dict, cmeta: dict, n: int) -> np.ndarray:
    return np.unpackbits(
        np.frombuffer(sections["data"], dtype=np.uint8), bitorder="little", count=n
    ).astype(bool)


# ------------------------------------------------------------------- binary
# bin payload = (data: bytes, offsets: int64[n+1]); lengths go through the
# int codec machinery so short-string columns pay ~0 offset overhead.


def _enc_lengths(offsets: np.ndarray) -> tuple[dict, dict]:
    lengths = np.diff(offsets).astype(np.int64)
    sec, meta = enc_int_for(lengths)
    return {"lens": sec["data"]}, meta


def _dec_offsets(sections: dict, lmeta: dict, n: int) -> np.ndarray:
    lengths = dec_int_for({"data": sections["lens"]}, lmeta, n)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=off[1:])
    return off


def enc_bin_plain(data: bytes, offsets: np.ndarray) -> tuple[dict, dict]:
    lsec, lmeta = _enc_lengths(offsets)
    return {"data": data, **lsec}, {"lmeta": lmeta}


def dec_bin_plain(sections: dict, cmeta: dict, n: int) -> tuple[bytes, np.ndarray]:
    return sections["data"], _dec_offsets(sections, cmeta["lmeta"], n)


def _unique_codes(
    data: bytes, offsets: np.ndarray
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """(dict_data, dict_offsets, codes) via Arrow's C++ dictionary_encode."""
    import pyarrow as pa

    n = len(offsets) - 1
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(np.ascontiguousarray(offsets, np.int64).tobytes()),
         pa.py_buffer(data)],
    )
    d = arr.dictionary_encode()
    codes = np.asarray(d.indices).astype(np.int64)
    dvals = d.dictionary.cast(pa.large_binary())
    bufs = dvals.buffers()
    doff = np.frombuffer(bufs[1], dtype=np.int64, count=len(dvals) + 1).copy()
    ddata = bufs[2].to_pybytes() if bufs[2] is not None else b""
    ddata = ddata[doff[0] : doff[-1]]
    doff = doff - doff[0]
    return ddata, doff, codes


def enc_bin_dict(data: bytes, offsets: np.ndarray) -> tuple[dict, dict]:
    """Dictionary encoding; codes sub-encoded RLE when runny, else packed.

    Covers the reference-free 'RLE for strings' case: sorted categorical
    columns become dict + RLE codes.
    """
    dict_data, dict_off, codes = _unique_codes(data, offsets)
    uniq_n = len(dict_off) - 1
    dsec, dmeta = _enc_lengths(dict_off)

    nruns = len(_runs(codes)[0]) if len(codes) else 0
    if len(codes) and nruns * 3 < len(codes):
        csec, cmeta_ = enc_int_rle(codes)
        code_codec = "rle"
        code_secs = {"cvals": csec["vals"], "clens": csec["lens"]}
    else:
        csec, cmeta_ = enc_int_for(codes)
        code_codec = "for"
        code_secs = {"cdata": csec["data"]}
    return (
        {"dict": dict_data, "dlens": dsec["lens"], **code_secs},
        {"ncodes": len(codes), "ndict": uniq_n, "dlmeta": dmeta,
         "code_codec": code_codec, "cmeta": cmeta_},
    )


def dec_bin_dict(sections: dict, cmeta: dict, n: int) -> tuple[bytes, np.ndarray]:
    ndict = cmeta["ndict"]
    dict_off = _dec_offsets({"lens": sections["dlens"]}, cmeta["dlmeta"], ndict)
    dict_data = np.frombuffer(sections["dict"], dtype=np.uint8)
    if cmeta["code_codec"] == "rle":
        codes = dec_int_rle(
            {"vals": sections["cvals"], "lens": sections["clens"]}, cmeta["cmeta"], n
        )
    else:
        codes = dec_int_for({"data": sections["cdata"]}, cmeta["cmeta"], n)
    lens = np.diff(dict_off)
    tl = lens[codes]
    starts = dict_off[:-1][codes]
    cum = np.cumsum(tl)
    total = int(cum[-1]) if len(cum) else 0
    out_idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(cum - tl, tl)
        + np.repeat(starts, tl)
    )
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tl, out=out_off[1:])
    return dict_data[out_idx].tobytes(), out_off


def enc_bin_fsst(data: bytes, offsets: np.ndarray,
                 sample_bytes: int = 1 << 16) -> tuple[dict, dict]:
    """FSST-style symbol-table compression of the concatenated value bytes.

    Symbol table built per chunk (north rule: per partition); code stream
    dense-remapped and bit-packed; row boundaries from the lengths codec.
    """
    merges = fsst_mod.build_table(data[:sample_bytes])
    tokens = fsst_mod.apply_merges(data, merges)
    used = np.unique(tokens) if len(tokens) else np.zeros(0, dtype=np.int64)
    remap = np.zeros(512, dtype=np.int64)
    remap[used] = np.arange(len(used))
    codes = remap[tokens].view(np.uint64) if len(tokens) else tokens.astype(np.uint64)
    w = bit_width(len(used) - 1) if len(used) > 1 else 0
    lsec, lmeta = _enc_lengths(offsets)
    merge_arr = np.array(merges, dtype=np.int64).astype(np.uint16)
    return (
        {"toks": pack_uints(codes, w), "used": used.astype(np.uint16).tobytes(),
         "merges": merge_arr.tobytes(), **lsec},
        {"ntok": len(tokens), "width": w, "nused": len(used),
         "nmerges": len(merges), "lmeta": lmeta},
    )


def dec_bin_fsst(sections: dict, cmeta: dict, n: int) -> tuple[bytes, np.ndarray]:
    used = np.frombuffer(sections["used"], dtype=np.uint16).astype(np.int64)
    codes = unpack_uints(sections["toks"], cmeta["width"], cmeta["ntok"])
    tokens = used[codes.astype(np.int64)] if len(used) else codes.astype(np.int64)
    merges_arr = np.frombuffer(sections["merges"], dtype=np.uint16).reshape(-1, 2)
    merges = [(int(a), int(b)) for a, b in merges_arr]
    data = fsst_mod.expand_tokens(tokens.astype(np.int32), merges)
    return data, _dec_offsets(sections, cmeta["lmeta"], n)


# ------------------------------------------------------ front coding (bin)
# Public technique: incremental/front coding, the idea behind Parquet's
# DELTA_BYTE_ARRAY pages — each value stores the byte length it shares
# with its PREDECESSOR plus the remaining suffix. On the engine's sorted
# layouts (repo/path/commit order) consecutive values share long prefixes
# that zstd's match finder only partially recovers once other rows sit
# between them: measured on the F0 corpus `path` column, front+zstd is
# 45% smaller than plain+zstd. Both directions are whole-chunk numpy —
# decode replaces the textbook sequential reconstruction with a
# maximum.accumulate forward fill, so there is no per-row python.

#: 2D working-plane budget (bytes) for the padded head matrix; the
#: compared-prefix width shrinks to fit, which only loosens compression
#: (long shared prefixes past the cap stay in the suffix), never
#: correctness.
_PREFIX_PLANE_BYTES = 32 << 20


def _head_matrix(arr: np.ndarray, offsets: np.ndarray, lens: np.ndarray,
                 wc: int) -> np.ndarray:
    """(n, wc) uint8 matrix of each value's first wc bytes. Bytes past a
    value's end hold its SUCCESSOR's data (no masking pass) — every
    consumer bounds its reads by lens, so the garbage is never read;
    prefix_lengths additionally clamps by lens. A wc-byte zero guard
    keeps the tail row's overhang in bounds."""
    n = len(lens)
    if not wc or not n:
        return np.zeros((n, wc), np.uint8)
    padded = np.zeros(len(arr) + wc, np.uint8)
    padded[:len(arr)] = arr
    idx = (offsets[:-1, None].astype(np.int32)
           + np.arange(wc, dtype=np.int32)[None, :])
    return padded[idx]


def prefix_lengths(data: bytes, offsets: np.ndarray,
                   wc_cap: int | None = None) -> np.ndarray:
    """Shared-prefix byte length of each value with its predecessor
    (row 0 -> 0), compared up to `wc_cap` bytes. Vectorized: one padded
    matrix, one == compare, one logical_and.accumulate."""
    n = len(offsets) - 1
    pl = np.zeros(n, np.int64)
    if n <= 1:
        return pl
    lens = np.diff(offsets)
    w = int(lens.max()) if n else 0
    wc = min(w, wc_cap if wc_cap is not None
             else max(16, _PREFIX_PLANE_BYTES // max(1, n)))
    if wc == 0:
        return pl
    a2d = _head_matrix(np.frombuffer(data, np.uint8), offsets, lens, wc)
    run = np.logical_and.accumulate(a2d[1:] == a2d[:-1], axis=1)
    # clamp by value lengths: the matrix's past-end bytes are successor
    # garbage that could spuriously "match"
    pl[1:] = np.minimum(run.sum(axis=1),
                        np.minimum(lens[1:], lens[:-1]))
    return pl


def enc_bin_prefix(data: bytes, offsets: np.ndarray) -> tuple[dict, dict]:
    n = len(offsets) - 1
    lens = np.diff(offsets)
    pl = prefix_lengths(data, offsets)
    arr = np.frombuffer(data, np.uint8)
    slen = lens - pl
    cum = np.cumsum(slen)
    total = int(cum[-1]) if n else 0
    out_idx = (np.arange(total, dtype=np.int64)
               - np.repeat(cum - slen, slen)
               + np.repeat(offsets[:-1] + pl, slen))
    psec, pmeta = enc_int_for(pl)
    lsec, lmeta = _enc_lengths(offsets)
    return ({"suf": arr[out_idx].tobytes(), "plens": psec["data"], **lsec},
            {"pmeta": pmeta, "lmeta": lmeta})


def dec_bin_prefix(sections: dict, cmeta: dict, n: int
                   ) -> tuple[bytes, np.ndarray]:
    """Whole-chunk vectorized reconstruction — no sequential loop.

    Key identity: value i's byte j (for j < pl[i]) equals byte j of the
    LATEST row k <= i with pl[k] <= j — every row between chains the
    byte down unchanged (their pl > j), and row k's byte j sits in k's
    OWN suffix at suf[soff[k] + j - pl[k]]. So one maximum.accumulate
    over a (n, wc) int32 plane resolves every inherited byte's source,
    and the rest is flat gathers with ascending output positions."""
    off = _dec_offsets(sections, cmeta["lmeta"], n)
    if n == 0:
        return b"", off
    pl = dec_int_for({"data": sections["plens"]}, cmeta["pmeta"], n)
    suf = np.frombuffer(sections["suf"], np.uint8)
    lens = np.diff(off)
    wc = int(pl.max())
    if wc == 0:  # nothing inherited: the suffix stream IS the data
        return sections["suf"], off
    slen = lens - pl
    soff = np.zeros(n + 1, np.int64)
    np.cumsum(slen, out=soff[1:])
    out = np.empty(int(off[-1]), np.uint8)
    # every row's OWN suffix bytes land verbatim at out[off+pl : off+len]
    # — one flat ascending gather over the whole suffix stream
    ts = int(soff[-1])
    if ts:
        js = (np.arange(ts, dtype=np.int64)
              - np.repeat(soff[1:] - slen, slen))
        rs = np.repeat(np.arange(n, dtype=np.int64), slen)
        out[off[:-1][rs] + pl[rs] + js] = suf
    # source-row plane for the INHERITED bytes only (j < pl[i]), row-
    # major so the flat gather below is ascending; row 0 has pl == 0, so
    # src >= 0 after the fill. uint16 rows keep per-pid planes (~8-60k
    # rows) L2-resident; int32 above that.
    rdt = np.uint16 if n <= 0xFFFF else np.int32
    colv = np.arange(wc, dtype=np.int32)
    src = np.where(pl.astype(np.int32)[:, None] <= colv[None, :],
                   np.arange(n, dtype=rdt)[:, None].astype(rdt),
                   rdt(0))
    np.maximum.accumulate(src, axis=0, out=src)
    # flat (row, j) enumeration of every inherited byte j < pl[i]
    cump = np.cumsum(pl)
    ti = int(cump[-1])
    if ti:
        j = np.arange(ti, dtype=np.int64) - np.repeat(cump - pl, pl)
        row = np.repeat(np.arange(n, dtype=np.int64), pl)
        k = src[row, j].astype(np.int64)
        # byte j of value k = suf[(soff[k] - pl[k]) + j]; j >= pl[k]
        # holds by construction of src, so the index is in bounds
        base = soff[:-1] - pl
        out[off[:-1][row] + j] = suf[base[k] + j]
    return out.tobytes(), off


# ---------------------------------------------------------- numeric lists
# flist payload = (values: np numeric array, offsets: int64[n+1]) — the
# embedding-column case (array<float>); values byte-shuffled for the zstd
# pass, lengths through the int codec machinery.


def enc_flist_shuffle(values: np.ndarray, offsets: np.ndarray) -> tuple[dict, dict]:
    lsec, lmeta = _enc_lengths(offsets)
    vsec, _ = enc_float_shuffle(values)  # byte-transpose works per-itemsize
    return {"data": vsec["data"], **lsec}, {
        "lmeta": lmeta, "dtype": values.dtype.str, "nvals": len(values),
    }


def dec_flist_shuffle(sections: dict, cmeta: dict, n: int) -> tuple[np.ndarray, np.ndarray]:
    dt = np.dtype(cmeta["dtype"])
    values = dec_float_shuffle(
        {"data": sections["data"]}, {"dtype": cmeta["dtype"]}, cmeta["nvals"]
    )
    return values.view(dt), _dec_offsets(sections, cmeta["lmeta"], n)


def enc_flist_plain(values: np.ndarray, offsets: np.ndarray) -> tuple[dict, dict]:
    lsec, lmeta = _enc_lengths(offsets)
    return {"data": values.tobytes(), **lsec}, {
        "lmeta": lmeta, "dtype": values.dtype.str,
    }


def dec_flist_plain(sections: dict, cmeta: dict, n: int) -> tuple[np.ndarray, np.ndarray]:
    values = np.frombuffer(sections["data"], dtype=np.dtype(cmeta["dtype"]))
    return values, _dec_offsets(sections, cmeta["lmeta"], n)


# ----------------------------------------------------------------- registry

INT_CODECS = {
    "int_plain": (enc_int_plain, dec_int_plain),
    "int_for": (enc_int_for, dec_int_for),
    "int_delta": (enc_int_delta, dec_int_delta),
    "int_dod": (enc_int_dod, dec_int_dod),
    "int_dict": (enc_int_dict, dec_int_dict),
    "int_rle": (enc_int_rle, dec_int_rle),
}
FLOAT_CODECS = {
    "float_plain": (enc_float_plain, dec_float_plain),
    "float_shuffle": (enc_float_shuffle, dec_float_shuffle),
    "float_alp": (enc_float_alp, dec_float_alp),
}
BOOL_CODECS = {"bool_bitmap": (enc_bool_bitmap, dec_bool_bitmap)}
BIN_CODECS = {
    "bin_plain": (enc_bin_plain, dec_bin_plain),
    "bin_dict": (enc_bin_dict, dec_bin_dict),
    "bin_fsst": (enc_bin_fsst, dec_bin_fsst),
    "bin_prefix": (enc_bin_prefix, dec_bin_prefix),
}
FLIST_CODECS = {
    "flist_shuffle": (enc_flist_shuffle, dec_flist_shuffle),
    "flist_plain": (enc_flist_plain, dec_flist_plain),
}


def enc_nested_ipc(data: bytes) -> tuple[dict, dict]:
    """Nested (struct/map/list<non-numeric>) chunks arrive as ONE Arrow
    IPC stream (chunk.py _nested_chunk); the codec is the identity — the
    container's per-section zstd floor supplies the compression."""
    return {"ipc": data}, {}


def dec_nested_ipc(sections: dict, cmeta: dict, nvalid: int) -> bytes:
    return bytes(sections["ipc"])


NESTED_CODECS = {"nested_ipc": (enc_nested_ipc, dec_nested_ipc)}

ALL_CODECS = {
    **INT_CODECS, **FLOAT_CODECS, **BOOL_CODECS, **BIN_CODECS,
    **FLIST_CODECS, **NESTED_CODECS,
}
