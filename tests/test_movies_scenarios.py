"""Reference-shaped CDC scenarios on the F1/F2 movies fixture: true
NULL-payload tombstones, DECIMAL(3,1) fidelity through compaction and the
sqlite sink, tombstone-shape verification (FIXTURES.md F4)."""

from __future__ import annotations

import sqlite3
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators import cdc
from db_integration_via_kafka_ksql_spark.sinks.dbapi import DbApiSink

from .fixtures_movies import (
    EXPECTED_STATE,
    movies_changelog_df,
)


@pytest.fixture(scope="module")
def changelog(spark):
    return movies_changelog_df(spark)


def _state(changelog):
    compacted = cdc.compact_latest(
        changelog, key_cols=["key_id"], order_cols=["offset"]
    )
    return cdc.soft_delete_filter(
        compacted, deleted_col="__deleted", tombstone_col="is_tombstone"
    )


def test_compaction_with_true_tombstones(changelog):
    got = {
        r["key_id"]: (r["title"], r["rating"]) for r in _state(changelog).collect()
    }
    assert got == EXPECTED_STATE


def test_decimal_rating_fidelity(changelog):
    """SURVEY §7.3.5: DECIMAL(3,1) must survive compaction as exact
    decimal, not drift through double."""
    state = _state(changelog)
    assert str(state.schema["rating"].dataType) == "DecimalType(3,1)"
    r1 = state.filter(F.col("key_id") == 1).first()
    assert r1["rating"] == Decimal("9.1")


def test_tombstone_shape(changelog):
    """F4.3: for a deleted key the changelog tail is (__deleted='true'
    rewrite row, then a NULL-value tombstone) with the key intact."""
    for key in (6, 8):
        tail = (
            changelog.filter(F.col("key_id") == key)
            .orderBy(F.col("offset").desc())
            .limit(2)
            .collect()
        )
        tomb, rewrite = tail[0], tail[1]
        assert tomb["is_tombstone"] is True
        assert tomb["key_id"] == key            # key survives the tombstone
        assert tomb["title"] is None            # value is wholly NULL
        assert rewrite["__deleted"] == "true"   # rewrite row precedes it
        assert rewrite["title"] is not None     # ... carrying last state


def test_movies_pipeline_to_sqlite_decimal_roundtrip(spark, tmp_path, changelog):
    """Batch-apply the movies changelog through the real sink: DECIMAL and
    timestamps must round-trip; deleted keys must be absent (F4.1/F4.2)."""
    sqlite3.register_adapter(Decimal, str)
    db = str(tmp_path / "movies.db")
    sink = DbApiSink(
        connect=lambda: sqlite3.connect(db),
        table="movies_sink",
        key_cols=["key_id"],
        dialect="sqlite",
    )
    compacted = cdc.compact_latest(changelog, ["key_id"], ["offset"])
    live = cdc.soft_delete_filter(
        compacted, deleted_col="__deleted", tombstone_col="is_tombstone"
    )
    deleted = compacted.join(live, ["key_id"], "left_anti")
    sink.write_batch(live, deleted.select("key_id"))

    con = sqlite3.connect(db)
    con.row_factory = sqlite3.Row
    rows = {r["key_id"]: dict(r) for r in con.execute("SELECT * FROM movies_sink")}
    con.close()
    assert set(rows) == set(EXPECTED_STATE)
    # sqlite's NUMERIC affinity stores DECIMAL(3,1) as REAL — one decimal
    # digit survives exactly; a real MSSQL/PG target keeps exact DECIMAL
    # (the DDL emits DECIMAL(3,1), tests/test_sinks.py)
    assert rows[1]["rating"] == pytest.approx(9.1)
    assert rows[7]["title"] == "Parasite (4K)"
    # count parity (F4.1): sink rows == live keys
    assert len(rows) == live.count()
