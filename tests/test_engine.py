"""Engine facade tests: M1 idempotent registration, M2 introspection,
M3 idempotent deploy/status/stop, M4 SQL-script splitting + execution."""

from __future__ import annotations

from db_integration_via_kafka_ksql_spark.engine import Engine
from db_integration_via_kafka_ksql_spark.sources.changelog import (
    file_changelog_stream,
)
from db_integration_via_kafka_ksql_spark.streaming.pipeline import CdcPipeline
from tests.test_streaming import SCHEMA, _write_file


def test_register_tables_idempotent_and_show_tables(spark, sf_dir):
    eng = Engine(spark)
    eng.register_tables(sf_dir)
    eng.register_tables(sf_dir)  # M1: re-runnable
    tables = set(eng.show_tables())
    assert {"lineitem", "orders", "documents"} <= tables
    assert eng.sql("SELECT count(*) AS n FROM region").first()["n"] == 5


def test_split_statements_strips_comments_and_respects_strings():
    script = """
    -- header comment
    SELECT 1;   -- trailing comment
    SELECT 'a;b' AS s;

    SELECT 3
    """
    stmts = Engine.split_statements(script)
    assert stmts == ["SELECT 1", "SELECT 'a;b' AS s", "SELECT 3"]


def test_run_sql_script_executes_each_statement(spark, sf_dir):
    eng = Engine(spark)
    eng.register_tables(sf_dir)
    results = eng.run_sql_script(
        "SELECT count(*) AS n FROM nation; SELECT 'x' AS v"
    )
    assert results[0].first()["n"] == 25
    assert results[1].first()["v"] == "x"


def test_deploy_is_idempotent_and_reports_status(spark, tmp_path):
    eng = Engine(spark)
    src = str(tmp_path / "chlog")
    _write_file(spark, src, [(1, "a", "false", 1)], "b1.parquet")

    def make():
        return CdcPipeline(
            source=file_changelog_stream(spark, src, SCHEMA),
            key_cols=["id"],
            order_cols=["offset"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            trigger_seconds=0,
            query_name="engine_test_pipe",
        )

    h1 = eng.deploy(make())
    try:
        assert h1.status()["state"] == "RUNNING"
        assert any(q["name"] == "engine_test_pipe" for q in eng.show_queries())
        # redeploy under the same name: old query stopped, new one running
        h2 = eng.deploy(make())
        try:
            assert not h1.active and h2.active
            names = [q["name"] for q in eng.show_queries()]
            assert names.count("engine_test_pipe") == 1
        finally:
            h2.stop()
        assert h2.status()["state"] == "STOPPED"
    finally:
        h1.stop()


def test_describe_table_lists_columns(spark, sf_dir):
    eng = Engine(spark)
    eng.register_tables(sf_dir)
    cols = {c["column"]: c["type"] for c in eng.describe_table("region")}
    assert cols["r_name"] == "string"
    assert cols["r_regionkey"] in ("int", "bigint")


def test_terminate_stops_named_query(spark, tmp_path):
    eng = Engine(spark)
    _write_file(spark, str(tmp_path / "src"), [(1, "a", "false", 1)],
                "f1.parquet")
    pipe = CdcPipeline(
        source=file_changelog_stream(spark, str(tmp_path / "src"), SCHEMA),
        key_cols=["id"],
        order_cols=["offset"],
        sink=None,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=0,
        query_name="terminate_me",
    )
    h = eng.deploy(pipe)
    try:
        assert eng.terminate("terminate_me") is True
        assert not h.active
        assert eng.terminate("terminate_me") is False  # idempotent
    finally:
        h.stop()


def test_deploy_aggview_through_engine_lifecycle(spark, tmp_path):
    """M3 generalized: the incremental aggregate view deploys with the
    same idempotent handle surface as the CDC pipeline (duck-typed
    start(*args)), shows in SHOW QUERIES, and terminates by name."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from db_integration_via_kafka_ksql_spark.streaming.aggview import (
        IncrementalAggView,
    )
    from db_integration_via_kafka_ksql_spark.streaming.state import (
        ParquetStateStore,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("grp", StringType()),
            StructField("v", DoubleType()),
            StructField("__deleted", StringType()),
            StructField("offset", LongType()),
        ]
    )
    src = str(tmp_path / "in")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "grp": pa.array(["a", "b"]),
                "v": pa.array([2.0, 3.0], pa.float64()),
                "__deleted": pa.array(["false", "false"]),
                "offset": pa.array([1, 2], pa.int64()),
            }
        ),
        f"{src}/f1.parquet",
    )
    view = IncrementalAggView(
        spark,
        path=str(tmp_path / "agg"),
        row_state=ParquetStateStore(
            spark, str(tmp_path / "rows"), key_cols=["id"], order_cols=["offset"]
        ),
        key_cols=["id"],
        group_col="grp",
        value_col="v",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=0,
        query_name="aggview_engine_test",
    )
    stream = spark.readStream.schema(schema).parquet(src)

    eng = Engine(spark)
    handle = eng.deploy(view, stream)
    try:
        assert handle.status()["state"] == "RUNNING"
        assert any(
            q["name"] == "aggview_engine_test" for q in eng.show_queries()
        )
        handle.await_idle()
        prog = handle.progress()
        assert prog and prog["num_input_rows"] is not None
        assert prog["batch_duration_ms"] is not None
    finally:
        assert eng.terminate("aggview_engine_test")
    assert not handle.active
    got = {r["grp"]: r["n_rows"] for r in view.read().collect()}
    assert got == {"a": 1, "b": 1}


def test_analyze_table_profiles_registered_table(spark, sf_dir):
    eng = Engine(spark)
    eng.register_tables(sf_dir, tables=("region",))
    prof = {
        r["col_name"]: r
        for r in eng.analyze_table("region", ["r_regionkey", "r_name"]).collect()
    }
    assert prof["r_regionkey"]["n_rows"] == 5
    assert prof["r_regionkey"]["n_distinct"] == 5
    assert prof["r_name"]["n_null"] == 0


def test_validate_table_and_assert_valid_gate(spark, sf_dir):
    from db_integration_via_kafka_ksql_spark.engine import Engine
    from db_integration_via_kafka_ksql_spark.operators import validation as VAL

    eng = Engine(spark)
    eng.register_tables(sf_dir)
    checks = [
        VAL.completeness("custkey_complete", "o_custkey"),
        VAL.uniqueness("orderkey_unique", "o_orderkey"),
        VAL.in_set("status_domain", "o_orderstatus", ("O", "F", "P")),
    ]
    rows = eng.assert_valid("orders", checks)
    assert {r["constraint"] for r in rows} == {
        "custkey_complete", "orderkey_unique", "status_domain"
    }
    assert all(r["status"] == "pass" for r in rows)
    # a constraint the data cannot meet -> the gate raises and names it
    bad = checks + [VAL.in_set("impossible_domain", "o_orderstatus", ("X",))]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="impossible_domain"):
        eng.assert_valid("orders", bad)
