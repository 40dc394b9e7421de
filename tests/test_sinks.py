"""Sink contract tests: DDL/MERGE generation per dialect, DBAPI sink
upsert/delete/evolve/retry/dead-letter behavior executed against TWO real
engines with differing SQL dialects — sqlite and duckdb (both
in-container). Two executable dialects is the closest this container gets
to the reference's live-MSSQL sink (start-sink-connector.sh:61-73)."""

from __future__ import annotations

import sqlite3

import duckdb
import pytest
from pyspark.sql import types as T

from db_integration_via_kafka_ksql_spark.sinks import ddl
from db_integration_via_kafka_ksql_spark.sinks.dbapi import DbApiSink
from db_integration_via_kafka_ksql_spark.sinks.jdbc import JdbcMergeSink

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("rating", T.DecimalType(3, 1)),
    ]
)


def test_create_table_sql_dialects():
    mssql = ddl.create_table_sql("movies_sink", SCHEMA, ["id"], "mssql")
    assert "NVARCHAR(MAX)" in mssql and "DECIMAL(3,1)" in mssql
    assert "PRIMARY KEY (id)" in mssql
    pg = ddl.create_table_sql("movies_sink", SCHEMA, ["id"], "postgres")
    assert "TEXT" in pg and "IF NOT EXISTS" in pg
    dk = ddl.create_table_sql("movies_sink", SCHEMA, ["id"], "duckdb")
    assert "VARCHAR" in dk and "DECIMAL(3,1)" in dk


def test_merge_sql_mssql_and_onconflict():
    m = ddl.merge_sql("t", ["id", "title"], ["id"], "mssql")
    assert m.startswith("MERGE t AS t USING") and "WHEN MATCHED" in m
    p = ddl.merge_sql("t", ["id", "title"], ["id"], "postgres")
    assert "ON CONFLICT (id) DO UPDATE SET title = excluded.title" in p


def test_staged_merge_sql_is_set_based():
    s = ddl.staged_merge_sql("t", "t__stage", ["id", "x"], ["id"], "postgres")
    assert "SELECT id, x FROM t__stage" in s


def test_evolve_adds_only_missing():
    stmts = ddl.evolve_sql("t", {"id", "title"}, SCHEMA, "postgres")
    # bare ADD, no COLUMN keyword: T-SQL rejects 'ADD COLUMN' and the
    # bare form is valid in postgres/sqlite too
    assert stmts == ["ALTER TABLE t ADD rating DECIMAL(3,1)"]


def test_evolve_sql_mssql_dialect():
    stmts = ddl.evolve_sql("t", {"id", "title"}, SCHEMA, "mssql")
    assert stmts == ["ALTER TABLE t ADD rating DECIMAL(3,1)"]
    assert "ADD COLUMN" not in stmts[0]


def _connect_factory(dialect: str, db: str):
    if dialect == "duckdb":
        return lambda: duckdb.connect(db)
    return lambda: sqlite3.connect(db)


@pytest.fixture(params=["sqlite", "duckdb"])
def sink(request, tmp_path):
    db = str(tmp_path / f"sink.{request.param}.db")
    return DbApiSink(
        connect=_connect_factory(request.param, db),
        table="movies_sink",
        key_cols=["id"],
        dialect=request.param,
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "title", "__deleted"])


def test_dbapi_upsert_then_update_then_delete(spark, sink):
    empty = spark.createDataFrame([], "id int")
    sink.write_batch(_df(spark, [(1, "a", "false"), (2, "b", "false")]), empty)
    assert sorted(sink.read_all()) == [(1, "a", "false"), (2, "b", "false")]
    # upsert overwrites key 1; delete removes key 2 — idempotent on replay
    for _ in range(2):
        sink.write_batch(
            _df(spark, [(1, "a2", "false")]),
            spark.createDataFrame([(2,)], ["id"]),
        )
        assert sink.read_all() == [(1, "a2", "false")]


def test_dbapi_auto_evolve_new_column(spark, sink):
    empty_keys = spark.createDataFrame([], "id int")
    sink.write_batch(_df(spark, [(1, "a", "false")]), empty_keys)
    widened = spark.createDataFrame(
        [(2, "b", "false", 9.5)], ["id", "title", "__deleted", "score"]
    )
    sink.write_batch(widened, empty_keys)
    rows = {r[0]: r for r in sink.read_all()}
    assert rows[1][3] is None and rows[2][3] == 9.5


@pytest.mark.parametrize("dialect", ["sqlite", "duckdb"])
def test_dbapi_dead_letter_on_persistent_failure(spark, tmp_path, dialect):
    db = str(tmp_path / f"dl.{dialect}.db")
    empty_keys = spark.createDataFrame([], "id int")
    good = DbApiSink(
        connect=_connect_factory(dialect, db),
        table="movies_sink",
        key_cols=["id"],
        dialect=dialect,
    )
    good.write_batch(_df(spark, [(1, "a", "false")]), empty_keys)
    # same table, but the upsert conflicts on a key with no unique index →
    # both engines reject every attempt; errors.tolerance=all must capture
    # the poison batch in dead_letter and keep going (K5)
    bad = DbApiSink(
        connect=_connect_factory(dialect, db),
        table="movies_sink",
        key_cols=["title"],
        dialect=dialect,
        max_retries=1,
        tolerate_errors=True,
    )
    bad.write_batch(
        _df(spark, [(2, "b", "false")]), spark.createDataFrame([], "title string")
    )
    assert len(bad.dead_letter) == 1
    assert good.read_all() == [(1, "a", "false")]  # target untouched


def test_jdbc_statements_preview(spark):
    df = _df(spark, [(1, "a", "false")])
    sink = JdbcMergeSink(
        url="jdbc:postgresql://example/db",
        table="movies_sink",
        key_cols=["id"],
        dialect="postgres",
    )
    create, merge, delete = sink.statements_preview(df)
    assert create.startswith("CREATE TABLE IF NOT EXISTS movies_sink")
    assert "FROM movies_sink__stage" in merge and "ON CONFLICT (id)" in merge
    assert "movies_sink__stage_deletes" in delete
