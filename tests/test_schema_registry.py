"""Registry-stub round trip: the schema-authority contract the reference
delegates to its Schema Registry service (docker-compose.yaml:142-162,
the-whole-thing.sh:23-40), exercised end-to-end in-container.

Covers the lifecycle a CDC deployment actually runs: producer registers,
messages are wire-framed with the schema id, the source table is ALTERed
(new nullable column), old consumers keep reading new data and new
consumers keep reading old data, incompatible changes are refused, and
tombstones stay zero-byte through the framing."""

from __future__ import annotations

import json

import pytest

from db_integration_via_kafka_ksql_spark.sources.schema_registry import (
    InMemorySchemaRegistry,
    RegistrySerde,
    check_backward_compatible,
    frame,
    unframe,
)

V1 = json.dumps(
    {
        "type": "record",
        "name": "movie",
        "fields": [
            {"name": "movie_id", "type": "long"},
            {"name": "title", "type": ["null", "string"]},
        ],
    }
)
# the ALTER: one new nullable column — BACKWARD-compatible
V2 = json.dumps(
    {
        "type": "record",
        "name": "movie",
        "fields": [
            {"name": "movie_id", "type": "long"},
            {"name": "title", "type": ["null", "string"]},
            {"name": "release_year", "type": ["null", "int"]},
        ],
    }
)
# illegal: new required field without default
V_BAD = json.dumps(
    {
        "type": "record",
        "name": "movie",
        "fields": [
            {"name": "movie_id", "type": "long"},
            {"name": "title", "type": ["null", "string"]},
            {"name": "rating", "type": "double"},
        ],
    }
)


def test_wire_format_frame_roundtrip():
    body = b"\x02\x04hi"
    framed = frame(7, body)
    assert framed[0] == 0x00  # magic
    assert framed[1:5] == (7).to_bytes(4, "big")
    assert unframe(framed) == (7, body)


def test_tombstone_passes_through_framing_as_absence_of_bytes():
    # TOMBSTONE_HANDLING_GUIDE.md:15-33 — a tombstone is NO bytes; a
    # framed "null record" would be >= 5 bytes and break log compaction
    assert frame(7, None) is None
    assert unframe(None) is None


def test_unframe_rejects_garbage():
    with pytest.raises(ValueError):
        unframe(b"\x01\x00\x00\x00\x07payload")  # wrong magic
    with pytest.raises(ValueError):
        unframe(b"\x00\x00")  # truncated header


def test_registration_is_idempotent_and_id_addressed():
    reg = InMemorySchemaRegistry()
    a = reg.register("movies-value", V1)
    b = reg.register("movies-value", V1)
    assert a == b
    assert json.loads(reg.get_by_id(a))["name"] == "movie"
    # whitespace / key order don't mint a new id
    reshuffled = json.dumps(json.loads(V1), indent=2, sort_keys=True)
    assert reg.register("movies-value", reshuffled) == a


def test_backward_gate_accepts_nullable_add_and_refuses_required_add():
    assert check_backward_compatible(V2, V1) == []
    assert check_backward_compatible(V_BAD, V1) != []
    reg = InMemorySchemaRegistry()
    reg.register("movies-value", V1)
    reg.register("movies-value", V2)  # accepted
    with pytest.raises(ValueError, match="rating"):
        reg.register("movies-value", V_BAD)
    assert len(reg.versions("movies-value")) == 2


def test_schema_evolution_roundtrip_old_and_new_consumers():
    """The deployment sequence: v1 producer writes, table is ALTERed,
    v2 producer writes; consumers pinned to either version read BOTH
    message generations correctly via id-addressed writer lookup."""
    reg = InMemorySchemaRegistry()
    p1 = RegistrySerde(reg, "movies-value", V1)
    old_msg = p1.serialize({"movie_id": 1, "title": "Solaris"})

    p2 = RegistrySerde(reg, "movies-value", V2)
    new_msg = p2.serialize(
        {"movie_id": 2, "title": "Stalker", "release_year": 1979}
    )
    assert p1.schema_id != p2.schema_id

    # new consumer (v2 reader): old message gains release_year=None
    c2 = RegistrySerde(reg, "movies-value", V2)
    assert c2.deserialize(old_msg) == {
        "movie_id": 1,
        "title": "Solaris",
        "release_year": None,
    }
    assert c2.deserialize(new_msg) == {
        "movie_id": 2,
        "title": "Stalker",
        "release_year": 1979,
    }

    # old consumer (v1 reader): new message's extra column is dropped
    c1 = RegistrySerde(reg, "movies-value", V1)
    assert c1.deserialize(new_msg) == {"movie_id": 2, "title": "Stalker"}

    # tombstone passes the whole serde untouched
    assert p2.serialize(None) is None
    assert c2.deserialize(None) is None


def test_unknown_schema_id_fails_loudly():
    reg = InMemorySchemaRegistry()
    serde = RegistrySerde(reg, "movies-value", V1)
    alien = frame(999, b"\x02")
    with pytest.raises(KeyError):
        serde.deserialize(alien)


def test_serde_through_spark_rows(spark):
    """The executor-side shape: framed bytes in a binary column, decoded
    by a per-partition serde (registry cache hit once per schema, never
    per row) — the plumbing decode_changelog_py uses, now with framing."""
    reg = InMemorySchemaRegistry()
    serde = RegistrySerde(reg, "movies-value", V2)
    rows = [
        {"movie_id": i, "title": f"t{i}", "release_year": 1970 + i}
        for i in range(50)
    ]
    payloads = [(serde.serialize(r),) for r in rows] + [(None,)]  # + tombstone
    df = spark.createDataFrame(payloads, "value binary")

    reg_schemas = {serde.schema_id: reg.get_by_id(serde.schema_id)}
    reader_json = V2

    def decode_partition(it):
        import pandas as pd

        from db_integration_via_kafka_ksql_spark.functions.avro_codec import (
            FlatRecordCodec,
        )
        from db_integration_via_kafka_ksql_spark.sources.schema_registry import (
            resolve_record,
            unframe,
        )

        codecs = {}  # id -> codec, one lookup per schema per partition
        for pdf in it:
            out = []
            for buf in pdf["value"]:
                parts = unframe(bytes(buf) if buf is not None else None)
                if parts is None:
                    out.append({"movie_id": None, "title": None, "release_year": None, "is_tombstone": True})
                    continue
                sid, body = parts
                if sid not in codecs:
                    codecs[sid] = FlatRecordCodec(reg_schemas[sid])
                row = resolve_record(
                    codecs[sid].decode(body), codecs[sid].schema_json, reader_json
                )
                row["is_tombstone"] = False
                out.append(row)
            yield pd.DataFrame(out)

    decoded = df.mapInPandas(
        decode_partition,
        "movie_id long, title string, release_year long, is_tombstone boolean",
    )
    got = decoded.collect()
    assert len(got) == 51
    assert sum(r["is_tombstone"] for r in got) == 1
    by_id = {r["movie_id"]: r for r in got if not r["is_tombstone"]}
    assert by_id[7]["title"] == "t7" and by_id[7]["release_year"] == 1977


def test_registry_serde_through_cdc_pipeline_mixed_versions(spark):
    """The round-6 integration: RegistrySerde as the codec for the CDC
    write/decode paths. A v1 producer and a v2 producer (the mid-stream
    schema upgrade, mirroring the reference's ALTER flow —
    the-whole-thing.sh:23-40 registers schema before DDL) interleave on
    ONE topic; a v2 consumer resolves both via the framed writer-schema
    ids, v1 rows default-fill the new column, and the tombstone stays an
    unframed literal NULL through the whole loop."""
    from db_integration_via_kafka_ksql_spark.sources import kafka as K

    cdc_key = json.dumps(
        {"type": "record", "name": "k", "fields": [{"name": "id", "type": "long"}]}
    )
    cdc_v1 = json.dumps(
        {
            "type": "record",
            "name": "movie",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "title", "type": ["null", "string"]},
                {"name": "__deleted", "type": ["null", "string"]},
            ],
        }
    )
    cdc_v2 = json.dumps(
        {
            "type": "record",
            "name": "movie",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "title", "type": ["null", "string"]},
                {"name": "rating", "type": ["null", "double"]},
                {"name": "__deleted", "type": ["null", "string"]},
            ],
        }
    )
    registry = InMemorySchemaRegistry()
    key_serde = RegistrySerde(registry, "movies-key", cdc_key)
    s1 = RegistrySerde(registry, "movies-value", cdc_v1)
    s2 = RegistrySerde(registry, "movies-value", cdc_v2)  # BACKWARD-gated
    assert s1.schema_id != s2.schema_id
    assert registry.versions("movies-value") == [s1.schema_id, s2.schema_id]

    cfg1 = K.AvroChangelogConfig("movies", cdc_key, cdc_v1)
    cfg2 = K.AvroChangelogConfig("movies", cdc_key, cdc_v2)
    b1 = spark.createDataFrame(
        [(1, "old-a", "false"), (2, "old-b", "false")], ["id", "title", "__deleted"]
    )
    w1 = K.write_changelog_py(
        b1, cfg1, ["id"], key_serde=key_serde, value_serde=s1
    ).collect()
    b2 = spark.createDataFrame(
        [(3, "new-c", 9.5, "false"), (2, "old-b", 1.0, "true")],
        ["id", "title", "rating", "__deleted"],
    )
    w2 = K.write_changelog_py(
        b2, cfg2, ["id"], key_serde=key_serde, value_serde=s2
    ).collect()

    # each producer framed with ITS schema id; tombstone unframed NULL
    assert all(unframe(bytes(r["value"]))[0] == s1.schema_id for r in w1)
    live2 = [r for r in w2 if r["value"] is not None]
    assert len(live2) == 1 and unframe(bytes(live2[0]["value"]))[0] == s2.schema_id
    assert sum(r["value"] is None for r in w2) == 1

    raw = spark.createDataFrame(
        [
            (
                bytearray(r["key"]),
                None if r["value"] is None else bytearray(r["value"]),
                i,
                0,
            )
            for i, r in enumerate(w1 + w2)
        ],
        "key binary, value binary, offset long, partition int",
    )
    out = {
        r["offset"]: r
        for r in K.decode_changelog_py(
            raw, cfg2, key_serde=key_serde, value_serde=s2
        ).collect()
    }
    assert not any(r["__dead"] for r in out.values())
    # v1-written rows resolved into the v2 reader schema: rating defaulted
    v1_rows = {out[0]["row"]["id"]: out[0], out[1]["row"]["id"]: out[1]}
    assert v1_rows[1]["row"]["title"] == "old-a" and v1_rows[1]["row"]["rating"] is None
    assert v1_rows[2]["row"]["rating"] is None
    # v2 row carries its rating; tombstone classified with key intact
    live_new = next(
        r for r in out.values() if not r["__tombstone"] and r["row"]["id"] == 3
    )
    assert live_new["row"]["rating"] == 9.5
    tomb = [r for r in out.values() if r["__tombstone"]]
    assert len(tomb) == 1 and tomb[0]["key"]["id"] == 2
    assert tomb[0]["__deleted"] == "true"


def test_backward_gate_numeric_promotion_matrix():
    """Avro spec reader-side promotions are legal evolutions: a reader on
    the WIDER numeric type still reads old data. Narrowings, string↔bytes
    (documented JSON-hop exclusion), and dropping null-acceptance are
    refused."""

    def schema(t):
        return json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": t}],
            }
        )

    ok = check_backward_compatible
    # promotions accepted, plain and inside nullable unions
    assert ok(schema("long"), schema("int")) == []
    assert ok(schema("double"), schema("int")) == []
    assert ok(schema("double"), schema("float")) == []
    assert ok(schema("float"), schema("long")) == []
    assert ok(schema(["null", "long"]), schema(["null", "int"])) == []
    # a non-null writer may move under a nullable reader
    assert ok(schema(["null", "long"]), schema("int")) == []
    # narrowing refused
    assert ok(schema("int"), schema("long")) != []
    assert ok(schema("float"), schema("double")) != []
    # writer may emit null; non-null reader refused
    assert ok(schema("long"), schema(["null", "int"])) != []
    # string<->bytes deliberately not admitted here
    assert ok(schema("bytes"), schema("string")) != []
    # registry end-to-end: the promoted ALTER registers as a new version
    reg = InMemorySchemaRegistry()
    v1 = reg.register("s", schema("int"))
    v2 = reg.register("s", schema("long"))
    assert reg.versions("s") == [v1, v2]
    # re-registering an existing version is an id lookup, not an evolution
    assert reg.register("s", schema("int")) == v1
    # but a NEW narrowing schema is refused against the latest version
    with pytest.raises(ValueError):
        reg.register("s", schema(["null", "int"]))
