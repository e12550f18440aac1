"""Property-based codec round-trips (hypothesis): any byte strings, any
ints, any null pattern — decode(encode(x)) == x for the selector's choice.
"""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_toolkit_spark.codecs.chunk import from_arrow, to_arrow
from parquet_toolkit_spark.codecs.container import decode_blob
from parquet_toolkit_spark.codecs.selector import select_codec

_SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=300)), max_size=200))
def test_any_binary_roundtrips(vals):
    arr = pa.array(vals, pa.large_binary())
    codec, blob, _ = select_codec(from_arrow(arr))
    assert to_arrow(decode_blob(blob)).cast(pa.large_binary()).to_pylist() == vals


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), st.text(max_size=120)), max_size=200))
def test_any_text_roundtrips(vals):
    arr = pa.array(vals, pa.string())
    codec, blob, _ = select_codec(from_arrow(arr))
    assert to_arrow(decode_blob(blob)).cast(pa.string()).to_pylist() == vals


@settings(**_SETTINGS)
@given(st.lists(
    st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    max_size=300,
))
def test_any_int64_roundtrips(vals):
    arr = pa.array(vals, pa.int64())
    codec, blob, _ = select_codec(from_arrow(arr))
    assert to_arrow(decode_blob(blob)).cast(pa.int64()).to_pylist() == vals


@settings(**_SETTINGS)
@given(st.lists(
    st.one_of(st.none(), st.integers(min_value=-(10**38 - 1),
                                     max_value=10**38 - 1)),
    max_size=250,
), st.integers(min_value=0, max_value=10))
def test_any_decimal38_roundtrips(mants, scale):
    # r6: two-word int128 mantissas (and the one-word fast path when all
    # values fit int64) decode bit-exact through whichever codec the
    # selector picks
    import decimal as dcm
    ctx = dcm.Context(prec=80)  # the default context ROUNDS scaleb at 28
    vals = [None if m is None else dcm.Decimal(m).scaleb(-scale, ctx)
            for m in mants]
    arr = pa.array(vals, pa.decimal128(38, scale))
    codec, blob, _ = select_codec(from_arrow(arr))
    assert to_arrow(decode_blob(blob)).to_pylist() == vals, codec


@settings(**_SETTINGS)
@given(st.lists(
    st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True,
                                   width=64)),
    max_size=200,
))
def test_any_float_roundtrips_bitexact(vals):
    arr = pa.array(vals, pa.float64())
    codec, blob, _ = select_codec(from_arrow(arr))
    out = to_arrow(decode_blob(blob)).cast(pa.float64())
    a = np.array(arr.fill_null(0.0), dtype=np.float64)
    b = np.array(out.fill_null(0.0), dtype=np.float64)
    assert np.array_equal(a.view(np.uint8), b.view(np.uint8))
    assert arr.is_null().to_pylist() == out.is_null().to_pylist()


@settings(**_SETTINGS)
@given(st.lists(
    st.one_of(st.none(),
              st.lists(st.floats(allow_nan=False, allow_infinity=False,
                                 width=32), max_size=32)),
    max_size=60,
))
def test_any_float_list_roundtrips_dense(vals):
    # dense rows (no null elements): the common embeddings shape.
    # NOTE: was shadowed by the null-element variant below sharing its
    # name — pytest collects one function per name, so this body never
    # ran (code-review r4)
    arr = pa.array(vals, pa.list_(pa.float32()))
    codec, blob, _ = select_codec(from_arrow(arr))
    assert to_arrow(decode_blob(blob)).cast(pa.list_(pa.float32())).to_pylist() \
        == arr.to_pylist()


@settings(**_SETTINGS)
@given(st.lists(
    st.one_of(
        st.none(),
        st.lists(st.one_of(st.none(),
                           st.floats(allow_nan=False, width=32)),
                 max_size=20),
    ),
    max_size=80,
))
def test_any_float_list_roundtrips(vals):
    # null rows AND null elements inside lists (the ADVICE r1 corruption
    # class) must survive the child-mask path bit-exact
    arr = pa.array(vals, pa.list_(pa.float32()))
    codec, blob, _ = select_codec(from_arrow(arr))
    assert to_arrow(decode_blob(blob)).cast(pa.list_(pa.float32())).to_pylist() == \
        arr.to_pylist()


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=220)), max_size=180))
def test_bin_prefix_forced_roundtrips(vals):
    # FORCE bin_prefix (the selector only picks it when the size trial
    # wins, so selector-routed fuzzing rarely reaches the forward-fill
    # decode): arbitrary byte strings + null pattern must round-trip
    from parquet_toolkit_spark.codecs.container import encode_blob

    arr = pa.array(vals, pa.large_binary())
    blob = encode_blob(from_arrow(arr), "bin_prefix")
    assert to_arrow(decode_blob(blob)).cast(pa.large_binary()).to_pylist() \
        == vals


@settings(**_SETTINGS)
@given(st.lists(st.binary(max_size=64), max_size=120))
def test_bin_prefix_forced_roundtrips_sorted(vals):
    # sorted input maximizes shared prefixes — the shape the codec is
    # FOR, exercising deep inheritance chains in the decode
    from parquet_toolkit_spark.codecs.container import encode_blob

    vals = sorted(vals)
    arr = pa.array(vals, pa.large_binary())
    blob = encode_blob(from_arrow(arr), "bin_prefix")
    assert to_arrow(decode_blob(blob)).cast(pa.large_binary()).to_pylist() \
        == vals


@settings(**_SETTINGS)
@given(st.lists(
    st.one_of(st.none(),
              st.integers(min_value=-719162, max_value=2932896)),  # date32 range
    max_size=200,
))
def test_any_date_roundtrips(days):
    arr = pa.array(days, pa.int32()).cast(pa.date32())
    codec, blob, _ = select_codec(from_arrow(arr))
    back = to_arrow(decode_blob(blob))
    assert back.type == pa.date32()
    assert back.to_pylist() == arr.to_pylist()


# ----------------------------------------------------- avro_lite (property)
# The Avro codec now carries the Iceberg manifest layer — round-trip
# arbitrary schema shapes/values, both container codecs.

from hypothesis import strategies as st


def _avro_value(typ):
    if typ == "null":
        return st.none()
    if typ == "boolean":
        return st.booleans()
    if typ == "int":
        return st.integers(-2**31, 2**31 - 1)
    if typ == "long":
        return st.integers(-2**63, 2**63 - 1)
    if typ == "double":
        return st.floats(allow_nan=False, width=64)
    if typ == "string":
        return st.text(max_size=40)
    if typ == "bytes":
        return st.binary(max_size=40)
    raise AssertionError(typ)


_PRIMS = ["boolean", "int", "long", "double", "string", "bytes"]


@st.composite
def _avro_schema_and_records(draw):
    n_fields = draw(st.integers(1, 6))
    fields, row_strats = [], {}
    for i in range(n_fields):
        kind = draw(st.sampled_from(["prim", "optional", "array", "map",
                                     "nested"]))
        name = f"f{i}"
        if kind == "prim":
            t = draw(st.sampled_from(_PRIMS))
            fields.append({"name": name, "type": t})
            row_strats[name] = _avro_value(t)
        elif kind == "optional":
            t = draw(st.sampled_from(_PRIMS))
            fields.append({"name": name, "type": ["null", t]})
            row_strats[name] = st.one_of(st.none(), _avro_value(t))
        elif kind == "array":
            t = draw(st.sampled_from(_PRIMS))
            fields.append({"name": name,
                           "type": {"type": "array", "items": t}})
            row_strats[name] = st.lists(_avro_value(t), max_size=5)
        elif kind == "map":
            t = draw(st.sampled_from(_PRIMS))
            fields.append({"name": name,
                           "type": {"type": "map", "values": t}})
            row_strats[name] = st.dictionaries(
                st.text(max_size=8), _avro_value(t), max_size=4)
        else:
            t = draw(st.sampled_from(_PRIMS))
            fields.append({"name": name, "type": {
                "type": "record", "name": f"rec{i}",
                "fields": [{"name": "x", "type": t},
                           {"name": "y", "type": ["null", "long"]}]}})
            row_strats[name] = st.fixed_dictionaries(
                {"x": _avro_value(t),
                 "y": st.one_of(st.none(), _avro_value("long"))})
    schema = {"type": "record", "name": "top", "fields": fields}
    records = draw(st.lists(st.fixed_dictionaries(row_strats), max_size=8))
    return schema, records


@settings(max_examples=60, deadline=None)
@given(_avro_schema_and_records(), st.sampled_from(["null", "deflate"]))
def test_avro_lite_property_roundtrip(sr, codec):
    from parquet_toolkit_spark.sources.avro_lite import read_avro, write_avro

    schema, records = sr
    got_schema, got = read_avro(write_avro(schema, records, codec=codec))
    assert got_schema == schema
    assert got == records


@given(st.lists(st.one_of(st.none(),
                          st.integers(min_value=-(10**18) + 1,
                                      max_value=10**18 - 1)),
                min_size=1, max_size=300))
@settings(max_examples=40, deadline=None)
def test_any_decimal_roundtrips(mants):
    import decimal as dcm
    arr = pa.array(
        [None if m is None else dcm.Decimal(m).scaleb(-3) for m in mants],
        pa.decimal128(18, 3),
    )
    codec, blob, _ = select_codec(from_arrow(arr))
    back = to_arrow(decode_blob(blob))
    assert back.type == arr.type
    assert back.to_pylist() == arr.to_pylist(), codec


@settings(**_SETTINGS)
@given(st.recursive(
    st.sampled_from([
        "string", "binary", "bigint", "int", "smallint", "tinyint",
        "double", "float", "boolean", "date", "timestamp",
        "timestamp_ntz", "decimal(38,10)", "decimal(7,2)",
    ]),
    lambda inner: st.one_of(
        st.builds(lambda t: f"array<{t}>", inner),
        st.builds(lambda k, v: f"map<{k},{v}>",
                  st.sampled_from(["string", "bigint", "int"]), inner),
        st.builds(
            lambda ts: "struct<" + ",".join(
                f"f{i}:{t}" for i, t in enumerate(ts)) + ">",
            st.lists(inner, min_size=1, max_size=3)),
    ),
    max_leaves=6,
))
def test_ddl_parser_matches_spark_simplestring(ddl):
    # r6: sources/ddl.py must invert simpleString exactly — parse, take
    # the pyspark DataType's own simpleString, re-parse, and the arrow
    # conversions must agree (the contract both data sources rely on)
    from parquet_toolkit_spark.sources.ddl import ddl_to_arrow, parse_ddl

    dt = parse_ddl(ddl)
    rendered = dt.simpleString()
    dt2 = parse_ddl(rendered)
    assert dt == dt2, (ddl, rendered)
    assert ddl_to_arrow(ddl) == ddl_to_arrow(rendered)
