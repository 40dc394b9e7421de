"""Pure-Python Avro *binary* codec for flat record schemas.

Why this exists: the spark-avro connector jar is not in this container
(and cannot be fetched — no network), so the engine's Kafka/Avro path
(`sources/kafka.py`) was previously import-gated and never executed
against real Avro bytes. This module implements the Avro binary encoding
itself — from the public specification
(https://avro.apache.org/docs/1.11.1/specification/, "Binary encoding") —
for the flat record shapes CDC changelogs use, so the
tombstone-through-Avro round trip (THE bug class the reference exists to
solve, /root/reference/TOMBSTONE_HANDLING_GUIDE.md:15-33) is testable
in-container, byte-for-byte.

Fidelity is verified two ways (tests/test_kafka_avro.py):
- round-trip: encode → decode reproduces the rows;
- differential: bytes produced here are decoded by the CANONICAL Java
  Avro library (avro-1.12.1.jar ships inside pyspark) via py4j, and
  Java-encoded bytes are decoded here. Any encoding deviation fails.

Supported schema subset (all a Debezium-unwrapped changelog needs):
record of fields typed `long`/`int`/`string`/`double`/`float`/`boolean`/
`bytes` or a `["null", T]` union of those. This is deliberately NOT a
general Avro implementation — nested records/arrays/maps/enums raise.

On a real cluster, prefer the spark-avro jar (`decode_changelog` /
`write_changelog` in sources/kafka.py); the codec here backs their
`codec="python"` twins, which run the same classification/tombstone
logic over mapInPandas-applied Python Avro.
"""

from __future__ import annotations

import json
import struct
from typing import Any

_PRIMITIVES = {"long", "int", "string", "double", "float", "boolean", "bytes"}


def _zigzag_encode(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


class FlatRecordCodec:
    """Binary encoder/decoder for one flat Avro record schema."""

    def __init__(self, schema_json: str) -> None:
        schema = json.loads(schema_json)
        if schema.get("type") != "record":
            raise ValueError("FlatRecordCodec requires a record schema")
        self.schema_json = schema_json
        self.fields: list[tuple[str, str, bool]] = []  # (name, type, nullable)
        for f in schema["fields"]:
            t = f["type"]
            nullable = False
            if isinstance(t, list):  # union — only ["null", T] supported
                # order matters: the wire union index IS the branch
                # position, and this codec writes 0=null/1=value. A
                # ["T","null"] schema would flip the indices and silently
                # mis-decode under a canonical reader — reject it.
                if len(t) != 2 or t[0] != "null":
                    raise ValueError(f"unsupported union {t} for field {f['name']}")
                t, nullable = t[1], True
            if not isinstance(t, str) or t not in _PRIMITIVES:
                raise ValueError(f"unsupported type {t} for field {f['name']}")
            self.fields.append((f["name"], t, nullable))

    # -- encode -----------------------------------------------------------
    def _encode_value(self, t: str, v: Any) -> bytes:
        if t == "int":
            # Avro int is 32-bit: out-of-range values would still varint-
            # encode here but overflow a canonical Java int reader — reject
            # instead of silently diverging from the spec
            iv = int(v)
            if not -(1 << 31) <= iv < (1 << 31):
                raise ValueError(f"int field value {iv} outside int32 range")
            return _zigzag_encode(iv)
        if t == "long":
            lv = int(v)
            if not -(1 << 63) <= lv < (1 << 63):
                raise ValueError(f"long field value {lv} outside int64 range")
            return _zigzag_encode(lv)
        if t == "string":
            raw = str(v).encode("utf-8")
            return _zigzag_encode(len(raw)) + raw
        if t == "bytes":
            raw = bytes(v)
            return _zigzag_encode(len(raw)) + raw
        if t == "double":
            return struct.pack("<d", float(v))
        if t == "float":
            return struct.pack("<f", float(v))
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        raise ValueError(f"unsupported type {t}")

    def encode(self, row: dict[str, Any]) -> bytes:
        out = bytearray()
        for name, t, nullable in self.fields:
            v = row.get(name)
            if nullable:
                # union index: 0 = null branch, 1 = value branch (schema
                # order ["null", T]); this one byte is exactly what must
                # NEVER be confused with a literal-NULL Kafka value —
                # an "Avro-encoded null" record is b"\x00"-per-field,
                # a tombstone is no bytes at all.
                if v is None:
                    out += _zigzag_encode(0)
                    continue
                out += _zigzag_encode(1)
            elif v is None:
                raise ValueError(f"field {name} is not nullable but value is None")
            out += self._encode_value(t, v)
        return bytes(out)

    # -- decode -----------------------------------------------------------
    def decode(self, buf: bytes) -> dict[str, Any]:
        row: dict[str, Any] = {}
        pos = 0
        for name, t, nullable in self.fields:
            if nullable:
                idx, pos = _zigzag_decode(buf, pos)
                if idx == 0:
                    row[name] = None
                    continue
            if t in ("long", "int"):
                row[name], pos = _zigzag_decode(buf, pos)
            elif t in ("string", "bytes"):
                n, pos = _zigzag_decode(buf, pos)
                raw = bytes(buf[pos : pos + n])
                pos += n
                row[name] = raw.decode("utf-8") if t == "string" else raw
            elif t == "double":
                (row[name],) = struct.unpack_from("<d", buf, pos)
                pos += 8
            elif t == "float":
                (row[name],) = struct.unpack_from("<f", buf, pos)
                pos += 4
            elif t == "boolean":
                row[name] = buf[pos] == 1
                pos += 1
        if pos != len(buf):
            raise ValueError(f"trailing bytes: consumed {pos} of {len(buf)}")
        return row
