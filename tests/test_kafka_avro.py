"""Kafka/Avro source-sink logic tests.

The spark-avro and spark-sql-kafka jars are not in this container, so the
Avro round-trip tests skip here and run on a real cluster; the
classification logic that doesn't need Avro (tombstone predicate ordering,
config building) is tested directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.sources import kafka as K


def _avro_usable(spark) -> bool:
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).collect()
        return True
    except Exception:
        return False


def test_config_defaults_mirror_reference():
    cfg = K.AvroChangelogConfig(
        topic="mssql.MoviesDB.cso.movies",
        key_schema_json="{}",
        value_schema_json="{}",
    )
    # S4: replay from the beginning, like SET 'auto.offset.reset'='earliest'
    assert cfg.starting_offsets == "earliest"


def test_kafka_available_probe_is_safe(spark):
    # must never raise — just report capability
    assert K.kafka_available(spark) in (True, False)


def test_avro_roundtrip_preserves_tombstones(spark):
    """§7.3.1 THE bug class: a (key, NULL) record must survive the write
    path as a literal NULL value, not an Avro-encoded null."""
    if not _avro_usable(spark):
        pytest.skip("spark-avro jar not on classpath in this container")
    compacted = spark.createDataFrame(
        [(1, 10, "keep", "false"), (2, 11, "gone", "true")],
        ["key_id", "offset", "title", "__deleted"],
    )
    cfg = K.AvroChangelogConfig(topic="t", key_schema_json="", value_schema_json="")
    out = K.write_changelog(compacted, cfg, key_cols=["key_id"]).collect()
    by_null = {r["value"] is None for r in out}
    assert by_null == {True, False}  # one tombstone, one payload


def test_classify_decoded_tombstone_rewrite_deadletter(spark):
    """T2/T3/K5 classification on a hand-built decoded frame (no Avro
    needed): tombstone (null value), delete-rewrite row, healthy row, and
    a poison record (bytes present, decode failed)."""
    from pyspark.sql import Row

    rows = [
        # healthy insert
        Row(key=Row(id=1), row=Row(id=1, title="a", __deleted="false"),
            value=bytearray(b"x"), offset=1, partition=0),
        # delete rewrite (T2): value present, __deleted='true'
        Row(key=Row(id=2), row=Row(id=2, title="b", __deleted="true"),
            value=bytearray(b"y"), offset=2, partition=0),
        # tombstone (T3): raw value NULL
        Row(key=Row(id=2), row=None, value=None, offset=3, partition=0),
        # dead letter (K5): bytes present but undecodable
        Row(key=Row(id=3), row=None, value=bytearray(b"garbage"), offset=4,
            partition=0),
    ]
    df = spark.createDataFrame(rows)
    out = {r["offset"]: r for r in K.classify_decoded(df).collect()}
    assert out[1]["__deleted"] == "false" and not out[1]["__dead"]
    assert out[2]["__deleted"] == "true" and not out[2]["__tombstone"]
    assert out[3]["__tombstone"] and out[3]["__deleted"] == "true"
    assert out[4]["__dead"] and not out[4]["__tombstone"]
    # the key survives the tombstone — the reference's central invariant
    assert out[3]["key"]["id"] == 2


def test_write_changelog_rejects_missing_key_cols(spark):
    """An empty/absent key struct would make every record share identical
    key bytes — log compaction on the output topic would collapse all rows
    to one. The writer must refuse instead (jar-free: validation happens
    before any Avro touch)."""
    compacted = spark.createDataFrame(
        [(1, 10, "keep", "false")], ["key_id", "offset", "title", "__deleted"]
    )
    cfg = K.AvroChangelogConfig(topic="t", key_schema_json="", value_schema_json="")
    with pytest.raises(ValueError, match="key columns"):
        K.write_changelog(compacted, cfg, key_cols=[])
    with pytest.raises(ValueError, match="missing"):
        K.write_changelog(compacted, cfg, key_cols=["nope"])
