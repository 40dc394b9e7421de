"""Schema-registry contract: in-memory authority + Confluent wire format.

The reference delegates schema authority to a Schema Registry service
(docker-compose.yaml:142-162 runs it; the-whole-thing.sh:23-40 waits for
it before starting connectors) and every Avro message on the wire is
framed with the registry's PUBLIC wire format — one magic byte ``0x00``
followed by the 4-byte big-endian schema id, then the Avro binary body
(documented at
https://docs.confluent.io/platform/current/schema-registry/fundamentals/serdes-develop/index.html#wire-format).

OSS Spark has no registry client, so this engine's production path
carries schemas in config (sources/kafka.py ``AvroChangelogConfig``,
SURVEY §1.4). This module supplies the *contract* those configs replace,
so the registry-dependent behaviors are testable in-container:

- id-addressed schema lookup (a consumer decodes messages written before
  it started, with whatever schema version each was written under);
- subject version history + BACKWARD compatibility gate (the default
  the reference deployment relies on when ALTERing the source table);
- reader/writer schema resolution for flat records (Avro spec
  "Schema Resolution": match fields by name, fill reader-only fields
  from defaults, skip writer-only fields);
- tombstone discipline through the framing: a Kafka tombstone is the
  ABSENCE of bytes — never a framed null — so frame/unframe pass
  ``None`` through untouched (TOMBSTONE_HANDLING_GUIDE.md:15-33).

Design for scale: a registry client lives on the DRIVER and in each
executor's deserializer as a tiny id→schema cache; schemas number in the
dozens while messages number in the trillions, so lookups must never be
per-row RPCs. ``RegistrySerde`` resolves+caches one codec per
(writer_id, reader_id) pair, which is the shape a real
executor-side deserializer needs.
"""

from __future__ import annotations

import json
import struct
from typing import Any

from db_integration_via_kafka_ksql_spark.functions.avro_codec import (
    FlatRecordCodec,
)

WIRE_MAGIC = 0x00
_WIRE_HEADER = struct.Struct(">bI")  # magic byte, 4-byte big-endian schema id


# ---------------------------------------------------------------------------
# wire framing
# ---------------------------------------------------------------------------
def frame(schema_id: int, body: bytes | None) -> bytes | None:
    """Prepend the wire-format header. ``None`` (tombstone) passes through:
    a tombstone must stay a zero-byte Kafka value, not a framed null."""
    if body is None:
        return None
    return _WIRE_HEADER.pack(WIRE_MAGIC, schema_id) + body


def unframe(buf: bytes | None) -> tuple[int, bytes] | None:
    """Split a framed message into (schema_id, avro_body); None for
    tombstones. Rejects unframed/corrupt input loudly — a consumer that
    guesses at garbage bytes corrupts downstream state silently."""
    if buf is None:
        return None
    if len(buf) < _WIRE_HEADER.size:
        raise ValueError(f"framed message too short: {len(buf)} bytes")
    magic, schema_id = _WIRE_HEADER.unpack_from(buf)
    if magic != WIRE_MAGIC:
        raise ValueError(f"bad magic byte {magic:#x} (expected {WIRE_MAGIC:#x})")
    return schema_id, buf[_WIRE_HEADER.size :]


# ---------------------------------------------------------------------------
# schema normalization / compatibility
# ---------------------------------------------------------------------------
def _canonical(schema_json: str) -> str:
    """Reduced canonical form for identity: field order matters in Avro,
    whitespace/key order in the JSON doesn't."""
    s = json.loads(schema_json)
    fields = [
        {k: f[k] for k in ("name", "type", "default") if k in f}
        for f in s.get("fields", [])
    ]
    return json.dumps(
        {"type": s.get("type"), "name": s.get("name"), "fields": fields},
        sort_keys=True,
        separators=(",", ":"),
    )


def _field_map(schema_json: str) -> dict[str, dict]:
    return {f["name"]: f for f in json.loads(schema_json)["fields"]}


def _is_nullable(ftype: Any) -> bool:
    return isinstance(ftype, list) and "null" in ftype


def check_backward_compatible(new_json: str, old_json: str) -> list[str]:
    """BACKWARD compatibility (the registry default): a consumer on the
    NEW schema can read data written with the OLD one. Violations list is
    empty when compatible.

    For the flat records this engine carries, that means every field the
    new reader requires must either exist in the old writer schema with a
    readable type — identical, or reachable via the Avro spec's numeric
    promotion matrix (int→long/float/double, long→float/double,
    float→double; "Schema Resolution" in the Avro spec) — or be fillable
    (nullable / has a default). Stricter than Confluent in two documented
    ways: string↔bytes promotion is refused (this engine's JSON-hop
    decode path has no binary representation, sources/kafka.py
    `_avro_to_spark_ddl`) and aliases are not consulted."""
    old = _field_map(old_json)
    problems = []
    for name, f in _field_map(new_json).items():
        if name in old:
            if not _readable_as(old[name]["type"], f["type"]):
                problems.append(
                    f"field {name!r}: type changed "
                    f"{old[name]['type']!r} -> {f['type']!r}"
                )
        elif "default" not in f and not _is_nullable(f["type"]):
            problems.append(
                f"field {name!r}: added without a default and not nullable"
            )
    return problems


def _canonical_type(t: Any) -> str:
    return json.dumps(t, sort_keys=True)


# Avro spec "Schema Resolution": writer type w is promotable to reader
# type r. string↔bytes is deliberately omitted (see
# check_backward_compatible docstring).
_PROMOTIONS: dict[str, frozenset[str]] = {
    "int": frozenset({"long", "float", "double"}),
    "long": frozenset({"float", "double"}),
    "float": frozenset({"double"}),
}


def _readable_as(writer_t: Any, reader_t: Any) -> bool:
    """Can a reader on `reader_t` read data written as `writer_t`?

    Handles the nullable-union shape this engine's flat records use:
    the non-null branches must be readable, and a writer that may emit
    null requires a null-accepting reader."""
    if _canonical_type(writer_t) == _canonical_type(reader_t):
        return True
    w_null, w_base = _split_nullable(writer_t)
    r_null, r_base = _split_nullable(reader_t)
    if w_null and not r_null:
        return False  # writer may emit null; reader can't hold it
    if w_base == r_base:
        return True  # e.g. "long" vs ["null","long"]
    return (
        isinstance(w_base, str)
        and isinstance(r_base, str)
        and r_base in _PROMOTIONS.get(w_base, frozenset())
    )


def _split_nullable(t: Any) -> tuple[bool, Any]:
    """(accepts null, the single non-null branch or canonical form)."""
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        base = branches[0] if len(branches) == 1 else _canonical_type(branches)
        return "null" in t, base
    return t == "null", t


# ---------------------------------------------------------------------------
# the registry
# ---------------------------------------------------------------------------
class InMemorySchemaRegistry:
    """Dict-backed stand-in for the registry service: same observable
    contract (ids, subjects, versions, compatibility gate), no network.

    Registration is idempotent per subject — re-registering a schema the
    subject already holds returns the existing id, which is what lets
    every producer restart without minting new ids."""

    def __init__(self, compatibility: str = "BACKWARD") -> None:
        if compatibility not in ("BACKWARD", "NONE"):
            raise ValueError(f"unsupported compatibility mode {compatibility!r}")
        self.compatibility = compatibility
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}
        self._next_id = 1

    def register(self, subject: str, schema_json: str) -> int:
        canon = _canonical(schema_json)
        versions = self._subjects.setdefault(subject, [])
        for sid in versions:
            if _canonical(self._by_id[sid]) == canon:
                return sid
        if versions and self.compatibility == "BACKWARD":
            latest = self._by_id[versions[-1]]
            problems = check_backward_compatible(schema_json, latest)
            if problems:
                raise ValueError(
                    f"incompatible schema for subject {subject!r}: "
                    + "; ".join(problems)
                )
        sid = self._next_id
        self._next_id += 1
        self._by_id[sid] = schema_json
        versions.append(sid)
        return sid

    def get_by_id(self, schema_id: int) -> str:
        if schema_id not in self._by_id:
            raise KeyError(f"unknown schema id {schema_id}")
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple[int, str]:
        versions = self._subjects.get(subject)
        if not versions:
            raise KeyError(f"unknown subject {subject!r}")
        return versions[-1], self._by_id[versions[-1]]

    def versions(self, subject: str) -> list[int]:
        return list(self._subjects.get(subject, []))


# ---------------------------------------------------------------------------
# reader/writer resolution
# ---------------------------------------------------------------------------
def resolve_record(
    writer_row: dict[str, Any], writer_json: str, reader_json: str
) -> dict[str, Any]:
    """Avro schema resolution for flat records: the reader sees its own
    field set — writer-only fields dropped, reader-only fields filled
    from the reader's default (or None when nullable)."""
    writer_fields = _field_map(writer_json)
    out: dict[str, Any] = {}
    for name, f in _field_map(reader_json).items():
        if name in writer_fields:
            out[name] = writer_row.get(name)
        elif "default" in f:
            out[name] = f["default"]
        elif _is_nullable(f["type"]):
            out[name] = None
        else:
            raise ValueError(
                f"reader field {name!r} absent from writer schema and has "
                "no default"
            )
    return out


class RegistrySerde:
    """Producer/consumer pair against one registry subject.

    serialize: register-once, frame every message with the schema id.
    deserialize: unframe, look up the WRITER schema by id (cached — one
    registry hit per schema ever seen, never per message), decode, then
    resolve into the consumer's reader schema. This is exactly the
    lifecycle a Kafka Avro consumer runs inside each executor."""

    def __init__(
        self,
        registry: InMemorySchemaRegistry,
        subject: str,
        schema_json: str,
    ) -> None:
        self.registry = registry
        self.subject = subject
        self.schema_json = schema_json
        self.schema_id = registry.register(subject, schema_json)
        self._codec = FlatRecordCodec(schema_json)
        self._writer_codecs: dict[int, FlatRecordCodec] = {
            self.schema_id: self._codec
        }

    def serialize(self, row: dict[str, Any] | None) -> bytes | None:
        if row is None:  # tombstone: no frame, no bytes
            return None
        return frame(self.schema_id, self._codec.encode(row))

    def deserialize(self, buf: bytes | None) -> dict[str, Any] | None:
        parts = unframe(buf)
        if parts is None:
            return None
        schema_id, body = parts
        codec = self._writer_codecs.get(schema_id)
        if codec is None:
            codec = FlatRecordCodec(self.registry.get_by_id(schema_id))
            self._writer_codecs[schema_id] = codec
        row = codec.decode(body)
        if schema_id == self.schema_id:
            return row
        return resolve_record(row, codec.schema_json, self.schema_json)
