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
    "int_rle": (enc_int_rle, dec_int_rle),
}
FLOAT_CODECS = {
    "float_plain": (enc_float_plain, dec_float_plain),
    "float_shuffle": (enc_float_shuffle, dec_float_shuffle),
}
BOOL_CODECS = {"bool_bitmap": (enc_bool_bitmap, dec_bool_bitmap)}
BIN_CODECS = {
    "bin_plain": (enc_bin_plain, dec_bin_plain),
    "bin_dict": (enc_bin_dict, dec_bin_dict),
    "bin_fsst": (enc_bin_fsst, dec_bin_fsst),
}
FLIST_CODECS = {
    "flist_shuffle": (enc_flist_shuffle, dec_flist_shuffle),
    "flist_plain": (enc_flist_plain, dec_flist_plain),
}

ALL_CODECS = {
    **INT_CODECS, **FLOAT_CODECS, **BOOL_CODECS, **BIN_CODECS, **FLIST_CODECS,
}
