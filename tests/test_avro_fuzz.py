"""Property-based fuzz of the pure-Python Avro binary codec (round-3
verdict item 8): randomized flat schemas (field counts, type mixes,
nullable unions, null/edge values) checked two ways per example:

1. our decode(encode(row)) is lossless;
2. the CANONICAL Java Avro library (bundled in pyspark) decodes our bytes
   and re-encodes them to the IDENTICAL byte string — Avro's binary
   encoding is unique (varints have one canonical form, floats are fixed
   width), so byte-equality of the Java re-encode proves our encoder
   emits exactly the spec encoding and our decoder consumed all of it.

Deterministic edge cases (int32/int64 bounds, empty strings/bytes,
union-order rejection) are separate plain tests below.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_integration_via_kafka_ksql_spark.functions.avro_codec import (
    FlatRecordCodec,
)

_VALUES = {
    "long": st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    "int": st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
    "string": st.text(max_size=40),
    "double": st.floats(allow_nan=False),
    "float": st.floats(allow_nan=False, width=32),
    "boolean": st.booleans(),
    "bytes": st.binary(max_size=40),
}


@st.composite
def schema_and_row(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    types = [draw(st.sampled_from(sorted(_VALUES))) for _ in range(n)]
    nullable = [draw(st.booleans()) for _ in range(n)]
    fields = [
        {"name": f"f{i}", "type": (["null", t] if nl else t)}
        for i, (t, nl) in enumerate(zip(types, nullable))
    ]
    schema = json.dumps({"type": "record", "name": "r", "fields": fields})
    row = {}
    for i, (t, nl) in enumerate(zip(types, nullable)):
        if nl and draw(st.booleans()):
            row[f"f{i}"] = None
        else:
            row[f"f{i}"] = draw(_VALUES[t])
    return schema, row


def _java_reencode(spark, schema_json: str, payload: bytes) -> bytes:
    jvm = spark._sc._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(payload, None)
    rec = reader.read(None, dec)
    out = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, None)
    writer.write(rec, enc)
    enc.flush()
    return bytes(out.toByteArray())


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(schema_and_row())
def test_codec_fuzz_roundtrip_and_java_byte_identity(spark, sr):
    schema_json, row = sr
    codec = FlatRecordCodec(schema_json)
    payload = codec.encode(row)
    assert codec.decode(payload) == row
    assert _java_reencode(spark, schema_json, payload) == payload


def _one_field(t, nullable=False):
    ft = ["null", t] if nullable else t
    return FlatRecordCodec(
        json.dumps(
            {"type": "record", "name": "r", "fields": [{"name": "f", "type": ft}]}
        )
    )


def test_int32_bounds_encode_and_out_of_range_rejects():
    c = _one_field("int")
    for v in ((1 << 31) - 1, -(1 << 31), 0, -1):
        assert c.decode(c.encode({"f": v})) == {"f": v}
    for v in (1 << 31, -(1 << 31) - 1):
        with pytest.raises(ValueError, match="int32"):
            c.encode({"f": v})


def test_int64_bounds_encode_and_out_of_range_rejects():
    c = _one_field("long")
    for v in ((1 << 63) - 1, -(1 << 63)):
        assert c.decode(c.encode({"f": v})) == {"f": v}
    for v in (1 << 63, -(1 << 63) - 1):
        with pytest.raises(ValueError, match="int64"):
            c.encode({"f": v})


def test_empty_string_and_bytes_are_one_zero_byte():
    # zero-length string/bytes encode as varint(0) — a single 0x00; the
    # value exists (unlike a tombstone, which is NO bytes at all)
    cs = _one_field("string")
    assert cs.encode({"f": ""}) == b"\x00"
    assert cs.decode(b"\x00") == {"f": ""}
    cb = _one_field("bytes")
    assert cb.encode({"f": b""}) == b"\x00"


def test_union_order_t_null_rejected():
    # only ["null", T] unions are supported; ["T", "null"] would flip the
    # branch indices and silently mis-decode — must raise at construction
    with pytest.raises(ValueError, match="union"):
        FlatRecordCodec(
            json.dumps(
                {
                    "type": "record",
                    "name": "r",
                    "fields": [{"name": "f", "type": ["string", "null"]}],
                }
            )
        )
