"""Property-based fuzz of the schema-registry serde: randomized flat
schemas and evolution chains, checking per example that

1. wire framing is lossless (unframe(frame(id, body)) round-trips) and
   tombstones never grow bytes;
2. a consumer pinned to ANY version of a subject decodes messages
   produced under ANY other version into exactly its own field set, with
   reader-only fields defaulted and writer-only fields dropped;
3. evolution chains built from nullable-add steps always pass the
   BACKWARD gate, and every serialize→deserialize across the chain is
   lossless on the shared fields.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_integration_via_kafka_ksql_spark.sources.schema_registry import (
    InMemorySchemaRegistry,
    RegistrySerde,
    frame,
    unframe,
)

_VALUES = {
    "long": st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    "string": st.text(max_size=30),
    "double": st.floats(allow_nan=False),
    "boolean": st.booleans(),
}


@given(
    schema_id=st.integers(min_value=0, max_value=(1 << 32) - 1),
    body=st.one_of(st.none(), st.binary(max_size=64)),
)
def test_wire_framing_roundtrip(schema_id, body):
    framed = frame(schema_id, body)
    if body is None:
        assert framed is None
        assert unframe(framed) is None
    else:
        assert len(framed) == len(body) + 5
        assert unframe(framed) == (schema_id, body)


@st.composite
def evolution_chain(draw):
    """Base schema + a chain of nullable-field additions, with one row of
    values per version (over that version's fields)."""
    n_base = draw(st.integers(min_value=1, max_value=4))
    n_added = draw(st.integers(min_value=1, max_value=3))
    types = [
        draw(st.sampled_from(sorted(_VALUES))) for _ in range(n_base + n_added)
    ]
    fields = [
        {"name": f"f{i}", "type": ["null", t] if draw(st.booleans()) else t}
        for i, t in enumerate(types[:n_base])
    ]
    versions = [json.dumps({"type": "record", "name": "r", "fields": fields})]
    for j, t in enumerate(types[n_base:], start=n_base):
        # evolution step: one new NULLABLE field (BACKWARD-safe)
        fields = fields + [{"name": f"f{j}", "type": ["null", t]}]
        versions.append(
            json.dumps({"type": "record", "name": "r", "fields": fields})
        )
    rows = []
    for v in versions:
        row = {}
        for f in json.loads(v)["fields"]:
            t = f["type"]
            nullable = isinstance(t, list)
            base_t = t[1] if nullable else t
            if nullable and draw(st.booleans()):
                row[f["name"]] = None
            else:
                row[f["name"]] = draw(_VALUES[base_t])
        rows.append(row)
    return versions, rows


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(chain=evolution_chain())
def test_any_version_reads_any_version(chain):
    versions, rows = chain
    reg = InMemorySchemaRegistry()
    serdes = [RegistrySerde(reg, "s-value", v) for v in versions]
    assert len(reg.versions("s-value")) == len(versions)
    messages = [sd.serialize(row) for sd, row in zip(serdes, rows)]

    for reader in serdes:
        reader_fields = {
            f["name"]: f for f in json.loads(reader.schema_json)["fields"]
        }
        for writer_idx, msg in enumerate(messages):
            got = reader.deserialize(msg)
            assert set(got) == set(reader_fields)
            writer_row = rows[writer_idx]
            for name in got:
                if name in writer_row:
                    assert got[name] == writer_row[name]
                else:  # reader-only field: defaulted (all adds are nullable)
                    assert got[name] is None
        # tombstones survive every reader untouched
        assert reader.deserialize(None) is None
        assert reader.serialize(None) is None
