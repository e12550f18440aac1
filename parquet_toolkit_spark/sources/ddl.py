"""Pure-python Spark DDL (simpleString) type parser.

The Python Data Source read() path runs in a plain python worker with no
JVM, so ``DataType.fromDDL`` / ``_parse_datatype_string`` (which require
an active SparkContext) are unavailable there. This module parses the
``simpleString`` grammar the stores record in ``_schema.json`` and the
Iceberg metadata layer emits — primitives, ``decimal(p,s)``,
``array<T>``, ``map<K,V>``, ``struct<name:T,...>`` — into pyspark
DataType objects, then converts them with pyspark's own JVM-free
``to_arrow_type`` so the Arrow schema a reader yields matches EXACTLY
what Spark's Arrow deserializer expects for the declared schema
(list field named "element", map entries "key"/"value", timestamps
us/UTC — conventions we must not re-guess by hand).
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import types as T

_PRIMITIVES = {
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ltz": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
}


def _split_top(s: str, sep: str) -> list[str]:
    """Split on sep at angle/paren nesting depth 0."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def parse_ddl(ddl: str) -> T.DataType:
    """simpleString -> pyspark DataType. Raises ValueError on anything
    outside the grammar (the callers turn that into a loud planning-time
    refusal rather than a per-task KeyError)."""
    s = ddl.strip()
    low = s.lower()
    if low in _PRIMITIVES:
        return _PRIMITIVES[low]
    if low.startswith("decimal"):
        body = s[7:].strip()
        if not body:
            return T.DecimalType(10, 0)
        if body.startswith("(") and body.endswith(")"):
            p_s = [x.strip() for x in body[1:-1].split(",")]
            if len(p_s) == 2 and all(x.isdigit() for x in p_s):
                return T.DecimalType(int(p_s[0]), int(p_s[1]))
        raise ValueError(f"bad decimal type: {ddl!r}")
    if low.startswith(("varchar(", "char(")) and s.endswith(")"):
        return T.StringType()  # length-annotated strings read as string
    if low.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_ddl(s[6:-1]))
    if low.startswith("map<") and s.endswith(">"):
        kv = _split_top(s[4:-1], ",")
        if len(kv) != 2:
            raise ValueError(f"bad map type: {ddl!r}")
        return T.MapType(parse_ddl(kv[0]), parse_ddl(kv[1]))
    if low.startswith("struct<") and s.endswith(">"):
        body = s[7:-1]
        fields = []
        if body.strip():
            for part in _split_top(body, ","):
                name, _, ftype = part.partition(":")
                name = name.strip().strip("`")
                if not name or not ftype:
                    raise ValueError(f"bad struct field {part!r} in {ddl!r}")
                fields.append(T.StructField(name, parse_ddl(ftype)))
        return T.StructType(fields)
    raise ValueError(f"unsupported DDL type: {ddl!r}")


def ddl_to_arrow(ddl: str) -> pa.DataType:
    """simpleString -> the arrow type Spark's Arrow deserializer expects
    for that declared column (session timezone pinned to UTC in
    runtime.py, so timestamp_utc=True)."""
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(parse_ddl(ddl), timestamp_utc=True)
