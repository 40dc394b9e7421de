"""Jar-path configuration parity (round-3 verdict item 5).

The spark-sql-kafka / spark-avro jars are unobtainable in this container,
so `read_stream` / `decode_changelog` can never execute end-to-end here.
These tests pin down everything AROUND the jar so the only untested delta
on a real cluster is the jar itself:

- the exact option dict `read_stream` hands to the Kafka source, checked
  key-by-key against the PUBLIC Spark structured-streaming Kafka option
  surface (spark.apache.org/docs/latest/structured-streaming-kafka-integration.html);
- the schema JSON strings the jar path would hand to from_avro are the
  very same strings the python-codec twin executes, and they parse as
  canonical Avro under the CANONICAL Java Avro library (bundled inside
  pyspark) with field names/types identical to the python codec's view;
- the from_json DDL bridge of the python twin agrees field-for-field with
  the Java-parsed schema.

Reference: start-source-connector.sh:70-104 (topic/schema/offset config).
"""

from __future__ import annotations

import json

from db_integration_via_kafka_ksql_spark.functions.avro_codec import (
    FlatRecordCodec,
)
from db_integration_via_kafka_ksql_spark.sources import kafka as K

from .test_kafka_avro import KEY_SCHEMA, VALUE_SCHEMA

# the documented option surface of the Spark Kafka source (public docs,
# "Structured Streaming + Kafka Integration Guide"); kafka.* passes through
# to the Kafka consumer itself
_DOCUMENTED_SOURCE_OPTIONS = {
    "assign",
    "subscribe",
    "subscribePattern",
    "startingOffsets",
    "startingOffsetsByTimestamp",
    "startingTimestamp",
    "endingOffsets",
    "endingOffsetsByTimestamp",
    "endingTimestamp",
    "failOnDataLoss",
    "kafkaConsumer.pollTimeoutMs",
    "fetchOffset.numRetries",
    "fetchOffset.retryIntervalMs",
    "maxOffsetsPerTrigger",
    "minOffsetsPerTrigger",
    "maxTriggerDelay",
    "minPartitions",
    "groupIdPrefix",
    "kafka.group.id",
    "includeHeaders",
}


class _RecordingReader:
    """Duck-typed stand-in for spark.readStream: records format + options
    instead of resolving the (absent) kafka source."""

    def __init__(self) -> None:
        self.fmt: str | None = None
        self.opts: dict[str, str] = {}

    def format(self, fmt: str) -> "_RecordingReader":
        self.fmt = fmt
        return self

    def option(self, k: str, v: str) -> "_RecordingReader":
        self.opts[k] = v
        return self

    def load(self):
        return self


class _FakeSpark:
    def __init__(self) -> None:
        self.readStream = _RecordingReader()


def _cfg(**extra) -> K.AvroChangelogConfig:
    # mirrors the reference's source connector: Debezium topic naming
    # (server.db.schema.table), earliest-offset replay
    return K.AvroChangelogConfig(
        topic="mssql.MoviesDB.cso.movies",
        key_schema_json=KEY_SCHEMA,
        value_schema_json=VALUE_SCHEMA,
        bootstrap_servers="broker:29092",
        **extra,
    )


def test_read_stream_builds_exact_documented_options():
    fake = _FakeSpark()
    out = K.read_stream(fake, _cfg())  # type: ignore[arg-type]
    assert out.fmt == "kafka"
    assert out.opts == {
        "kafka.bootstrap.servers": "broker:29092",
        "subscribe": "mssql.MoviesDB.cso.movies",
        "startingOffsets": "earliest",
    }
    for k in out.opts:
        assert (
            k in _DOCUMENTED_SOURCE_OPTIONS or k.startswith("kafka.")
        ), f"undocumented Kafka source option: {k}"


def test_read_stream_extra_options_pass_through_and_stay_documented():
    fake = _FakeSpark()
    extra = {"maxOffsetsPerTrigger": "10000", "failOnDataLoss": "false"}
    out = K.read_stream(fake, _cfg(extra_options=extra))  # type: ignore[arg-type]
    for k, v in extra.items():
        assert out.opts[k] == v
        assert k in _DOCUMENTED_SOURCE_OPTIONS


def test_jar_and_python_paths_share_identical_schema_strings():
    """Both decode paths read cfg.{key,value}_schema_json verbatim — the
    string handed to from_avro on a real cluster is byte-identical to the
    one the python codec executed in-container."""
    cfg = _cfg()
    # the python twin constructs its codec from exactly these strings
    FlatRecordCodec(cfg.key_schema_json)
    FlatRecordCodec(cfg.value_schema_json)
    assert cfg.key_schema_json == KEY_SCHEMA
    assert cfg.value_schema_json == VALUE_SCHEMA


def _java_fields(spark, schema_json: str) -> list[tuple[str, str, bool]]:
    """(name, non-null type, nullable) per the CANONICAL Java parser."""
    jvm = spark._sc._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    out = []
    for f in schema.getFields():
        t = f.schema()
        nullable = False
        if t.getType().getName() == "union":
            branches = list(t.getTypes())
            names = [b.getType().getName() for b in branches]
            nullable = "null" in names
            t = next(b for b in branches if b.getType().getName() != "null")
        out.append((f.name(), t.getType().getName(), nullable))
    return out


def test_schema_json_is_canonical_avro_and_matches_python_codec(spark):
    """The schema strings the jar path would hand to from_avro parse under
    the real Java Avro library with the same field structure the python
    codec derived — so a real-cluster swap to the jar path decodes the
    same shapes."""
    for schema_json in (KEY_SCHEMA, VALUE_SCHEMA):
        java = _java_fields(spark, schema_json)
        codec = FlatRecordCodec(schema_json)
        assert [(n, t, nl) for n, t, nl in codec.fields] == java


def test_from_json_ddl_bridge_matches_java_parsed_schema(spark):
    """The python twin's from_json DDL column list agrees field-for-field
    with the Java-parsed Avro schema (names, order, Spark type mapping)."""
    type_map = {
        "long": "bigint",
        "int": "int",
        "string": "string",
        "double": "double",
        "float": "float",
        "boolean": "boolean",
    }
    for schema_json in (KEY_SCHEMA, VALUE_SCHEMA):
        ddl = K._avro_to_spark_ddl(schema_json)
        got = [tuple(p.strip().split(" ")) for p in ddl.split(",")]
        java = _java_fields(spark, schema_json)
        assert got == [(n, type_map[t]) for n, t, _ in java]


def test_ddl_bridge_rejects_bytes_fields_loudly():
    import pytest

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "blob", "type": "bytes"}],
        }
    )
    with pytest.raises(ValueError, match="bytes"):
        K._avro_to_spark_ddl(schema)
