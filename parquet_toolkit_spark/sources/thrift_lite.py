"""Generic Thrift *compact protocol* reader/writer (pure python).

Parquet footers (``FileMetaData``) are Thrift compact-protocol structs.
pyarrow parses them read-only; nothing in this environment can *edit*
one — which is exactly what a zero-decode row-group append needs (copy
the raw row-group bytes, shift the offsets, write a merged footer).
This module implements the public compact-protocol wire format
(https://github.com/apache/thrift/blob/master/doc/specs/thrift-compact-protocol.md)
generically: it parses any struct into a schema-free value tree that
preserves field ids, declared wire types, and field order, and
serializes that tree back. Unknown fields round-trip untouched, so an
editor only needs to know the ids it patches (the parquet.thrift ids
for offsets), not the whole schema — the same generic-survival design
as `sources/avro_lite.py`.

Reference parity: the toolkit's binary append
(`TreeMergeThread.java:116` appendFile) leans on parquet-mr's
ParquetFileWriter#appendFile, which does this footer surgery in Java.

Value encoding (type_tag, payload) — unambiguous for re-serialization:
  ("bool", b)  ("i8", n)  ("i16", n)  ("i32", n)  ("i64", n)
  ("double", f)  ("binary", bytes)
  ("list", elem_wire_type, [payload, ...])   # payloads untagged
  ("set",  elem_wire_type, [payload, ...])
  ("map", ktype, vtype, [(k, v), ...])
  ("struct", [(field_id, (tag, payload)), ...])
"""

from __future__ import annotations

import struct as _struct

# compact-protocol wire type codes
T_BOOL_TRUE = 1
T_BOOL_FALSE = 2
T_I8 = 3
T_I16 = 4
T_I32 = 5
T_I64 = 6
T_DOUBLE = 7
T_BINARY = 8
T_LIST = 9
T_SET = 10
T_MAP = 11
T_STRUCT = 12


class ThriftError(ValueError):
    pass


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ThriftError("truncated thrift buffer")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ThriftError("truncated thrift buffer")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ThriftError("varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)


def _payload(v):
    """Strip the tag: the untagged payload stored for container items."""
    tag = v[0]
    if tag in ("list", "set"):
        return (v[1], v[2])
    if tag == "map":
        return (v[1], v[2], v[3])
    return v[1]


def _read_value(r: _Reader, wtype: int):
    if wtype in (T_BOOL_TRUE, T_BOOL_FALSE):
        # inside containers booleans are a full byte; field-level bools
        # never reach here (the header nibble carries the value)
        return ("bool", r.byte() == T_BOOL_TRUE)
    if wtype == T_I8:
        v = r.byte()
        return ("i8", v - 256 if v >= 128 else v)
    if wtype == T_I16:
        return ("i16", r.zigzag())
    if wtype == T_I32:
        return ("i32", r.zigzag())
    if wtype == T_I64:
        return ("i64", r.zigzag())
    if wtype == T_DOUBLE:
        return ("double", _struct.unpack("<d", r.take(8))[0])
    if wtype == T_BINARY:
        return ("binary", bytes(r.take(r.varint())))
    if wtype in (T_LIST, T_SET):
        head = r.byte()
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = r.varint()
        items = [_payload(_read_value(r, etype)) for _ in range(size)]
        return ("list" if wtype == T_LIST else "set", etype, items)
    if wtype == T_MAP:
        size = r.varint()
        if size == 0:
            return ("map", 0, 0, [])
        kv = r.byte()
        ktype, vtype = kv >> 4, kv & 0x0F
        pairs = [(_payload(_read_value(r, ktype)),
                  _payload(_read_value(r, vtype)))
                 for _ in range(size)]
        return ("map", ktype, vtype, pairs)
    if wtype == T_STRUCT:
        return ("struct", _read_struct_fields(r))
    raise ThriftError(f"unknown compact wire type {wtype}")


def _read_struct_fields(r: _Reader):
    fields = []
    last_id = 0
    while True:
        head = r.byte()
        if head == 0:  # STOP
            return fields
        delta = head >> 4
        wtype = head & 0x0F
        fid = last_id + delta if delta else r.zigzag()
        last_id = fid
        if wtype in (T_BOOL_TRUE, T_BOOL_FALSE):
            val = ("bool", wtype == T_BOOL_TRUE)
        else:
            val = _read_value(r, wtype)
        fields.append((fid, val))


def loads(buf: bytes):
    """Parse one compact-protocol struct; returns ("struct", fields)."""
    r = _Reader(buf)
    fields = _read_struct_fields(r)
    return ("struct", fields)


def loads_prefix(buf: bytes) -> tuple[tuple, int]:
    """Parse one struct from the FRONT of a buffer whose total length is
    unknown (e.g. a parquet BloomFilterHeader followed by its bitset).
    Returns (("struct", fields), bytes_consumed)."""
    r = _Reader(buf)
    fields = _read_struct_fields(r)
    return ("struct", fields), r.pos


# ---------------------------------------------------------------- write

def _w_varint(out: bytearray, v: int) -> None:
    if v < 0:
        raise ThriftError("varint must be non-negative")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _w_zigzag(out: bytearray, v: int) -> None:
    # python ints are arbitrary precision: v >> 63 is 0 for any
    # non-negative v and -1 for any negative v, so this is the exact
    # zigzag map for the full i64 range
    _w_varint(out, (v << 1) ^ (v >> 63))


_WIRE = {"bool": None, "i8": T_I8, "i16": T_I16, "i32": T_I32,
         "i64": T_I64, "double": T_DOUBLE, "binary": T_BINARY,
         "list": T_LIST, "set": T_SET, "map": T_MAP, "struct": T_STRUCT}


def _w_value(out: bytearray, tag: str, payload) -> None:
    if tag == "bool":
        out.append(T_BOOL_TRUE if payload else T_BOOL_FALSE)
        return
    if tag == "i8":
        out.append(payload & 0xFF)
        return
    if tag in ("i16", "i32", "i64"):
        _w_zigzag(out, int(payload))
        return
    if tag == "double":
        out += _struct.pack("<d", payload)
        return
    if tag == "binary":
        _w_varint(out, len(payload))
        out += payload
        return
    if tag in ("list", "set"):
        et, items = payload
        if len(items) < 15:
            out.append((len(items) << 4) | et)
        else:
            out.append(0xF0 | et)
            _w_varint(out, len(items))
        itag = _TAG_OF.get(et)
        for it in items:
            _w_value(out, itag, it)
        return
    if tag == "map":
        kt, vt, pairs = payload
        _w_varint(out, len(pairs))
        if pairs:
            out.append((kt << 4) | vt)
            ktag, vtag = _TAG_OF.get(kt), _TAG_OF.get(vt)
            for k, v in pairs:
                _w_value(out, ktag, k)
                _w_value(out, vtag, v)
        return
    if tag == "struct":
        _w_struct_fields(out, payload)
        return
    raise ThriftError(f"unknown value tag {tag!r}")


_TAG_OF = {T_BOOL_TRUE: "bool", T_BOOL_FALSE: "bool", T_I8: "i8",
           T_I16: "i16", T_I32: "i32", T_I64: "i64", T_DOUBLE: "double",
           T_BINARY: "binary", T_LIST: "list", T_SET: "set",
           T_MAP: "map", T_STRUCT: "struct"}


def _unwrap_container(tag: str, val):
    """("list", et, items) -> payload shape used by _w_value."""
    if tag in ("list", "set"):
        return (val[1], val[2])
    if tag == "map":
        return (val[1], val[2], val[3])
    if tag == "struct":
        return val[1]
    return val[1]


def _w_struct_fields(out: bytearray, fields) -> None:
    last_id = 0
    for fid, val in fields:
        tag = val[0]
        if tag == "bool":
            wtype = T_BOOL_TRUE if val[1] else T_BOOL_FALSE
        else:
            wtype = _WIRE[tag]
        delta = fid - last_id
        if 0 < delta <= 15:
            out.append((delta << 4) | wtype)
        else:
            out.append(wtype)
            _w_zigzag(out, fid)
        last_id = fid
        if tag != "bool":
            _w_value(out, tag, _unwrap_container(tag, val))
    out.append(0)  # STOP


def dumps(tree) -> bytes:
    tag, payload = tree[0], tree[1]
    if tag != "struct":
        raise ThriftError("top-level value must be a struct")
    out = bytearray()
    _w_struct_fields(out, payload)
    return bytes(out)


# ------------------------------------------------------- tree utilities

def get(fields, fid: int):
    """First (tag, value-tuple) for a field id, or None."""
    for f, v in fields:
        if f == fid:
            return v
    return None


def set_field(fields, fid: int, val) -> list:
    """Replace (or append, keeping id order) field `fid`."""
    out = []
    done = False
    for f, v in fields:
        if f == fid:
            out.append((f, val))
            done = True
        else:
            out.append((f, v))
    if not done:
        out.append((fid, val))
        out.sort(key=lambda t: t[0])
    return out


def drop_fields(fields, fids) -> list:
    dead = set(fids)
    return [(f, v) for f, v in fields if f not in dead]
