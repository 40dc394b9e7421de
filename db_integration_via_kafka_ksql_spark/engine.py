"""Engine facade: the user-facing control surface (SURVEY §2.7 M1-M4).

The reference drives everything through shell + REST: idempotent ksqlDB
DDL (M1), SHOW TABLES/STREAMS/QUERIES introspection (M2), connector
deploy/delete/status (M3), and a comment-stripping ';'-splitting SQL
script runner (M4, apply-ksql-transformations.sh:44-87). One Engine
object replaces the container zoo:

    eng = Engine(spark)
    eng.register_tables("/root/testdata/sf0.01")       # M1 (idempotent)
    eng.sql("SELECT count(*) FROM lineitem")           # pull query
    eng.run_sql_script(path_or_text)                   # M4
    handle = eng.deploy(pipeline)                      # M3 (idempotent)
    eng.show_queries()                                 # M2
    handle.stop()
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from db_integration_via_kafka_ksql_spark.io import TABLES, load_table
from db_integration_via_kafka_ksql_spark.streaming.pipeline import CdcPipeline


@dataclass
class QueryHandle:
    """M3: a deployed pipeline's lifecycle handle (≈ connector status)."""

    name: str
    _query: Any

    @property
    def active(self) -> bool:
        return bool(self._query.isActive)

    def status(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "id": str(self._query.id),
            "active": self.active,
            # reference: SHOW QUERIES reports RUNNING (the-whole-thing.sh:61-71)
            "state": "RUNNING" if self.active else "STOPPED",
        }

    def await_idle(self) -> None:
        self._query.processAllAvailable()

    def progress(self) -> dict[str, Any]:
        """Last micro-batch's runtime metrics (ksqlDB surfaces these per
        query via DESCRIBE EXTENDED / the REST status endpoint): rows
        consumed, processing rate, batch duration. {} before the first
        completed batch."""
        p = self._query.lastProgress
        if not p:
            return {}
        return {
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows"),
            "input_rows_per_second": p.get("inputRowsPerSecond"),
            "processed_rows_per_second": p.get("processedRowsPerSecond"),
            "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        }

    def stop(self) -> None:
        if self.active:
            self._query.stop()


class Engine:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    # -- M1: idempotent table registration -----------------------------
    def register_tables(self, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
        """CREATE TABLE IF NOT EXISTS equivalent: re-runnable view
        registration over the parquet datasets."""
        for t in tables:
            load_table(self.spark, sf_dir, t).createOrReplaceTempView(t)

    # -- pull queries ---------------------------------------------------
    def sql(self, statement: str) -> DataFrame:
        return self.spark.sql(statement)

    # -- M4: SQL script runner -----------------------------------------
    @staticmethod
    def split_statements(script: str) -> list[str]:
        """Strip comments, split on ';' — the reference's statement driver
        (apply-ksql-transformations.sh strips '--' lines then POSTs each
        statement). String literals containing ';' are respected."""
        no_comments = re.sub(r"--[^\n]*", "", script)
        stmts, buf, in_str = [], [], False
        for ch in no_comments:
            if ch == "'":
                in_str = not in_str
            if ch == ";" and not in_str:
                s = "".join(buf).strip()
                if s:
                    stmts.append(s)
                buf = []
            else:
                buf.append(ch)
        tail = "".join(buf).strip()
        if tail:
            stmts.append(tail)
        return stmts

    def run_sql_script(self, script_or_path: str) -> list[DataFrame]:
        if os.path.exists(script_or_path):
            with open(script_or_path) as f:
                script = f.read()
        else:
            script = script_or_path
        return [self.spark.sql(s) for s in self.split_statements(script)]

    # -- M2: introspection ---------------------------------------------
    def show_tables(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]

    def show_queries(self) -> list[dict[str, Any]]:
        return CdcPipeline.active_queries(self.spark)

    def describe_table(self, name: str) -> list[dict[str, str]]:
        """ksqlDB `DESCRIBE <table>`: column name/type listing for a
        registered table or view."""
        return [
            {"column": c.name, "type": c.dataType}
            for c in self.spark.catalog.listColumns(name)
        ]

    # -- M3 (cont.): query termination ---------------------------------
    def analyze_table(
        self, name: str, cols: list[str] | None = None, approx: bool = False
    ) -> DataFrame:
        """DESCRIBE-with-statistics (M2 companion): per-column nulls,
        distincts and min/max of a registered table in one aggregation
        pass (operators/relational.profile_table). approx=True swaps the
        exact distinct counts for HLL++ sketches — the wide-table /
        100 TB setting."""
        from db_integration_via_kafka_ksql_spark.operators.relational import (
            profile_table,
        )

        return profile_table(self.spark.table(name), cols, approx=approx)

    def validate_table(self, name: str, checks: list) -> DataFrame:
        """Constraint-suite report for a registered table (M2 companion,
        the DESCRIBE-quality counterpart to analyze_table): every
        expectation in `checks` (operators/validation.Constraint — see
        completeness/uniqueness/in_set/predicate/referential builders)
        evaluated in one aggregation pass plus one join per referential
        check. Returns the per-constraint report frame."""
        from db_integration_via_kafka_ksql_spark.operators.validation import (
            check_constraints,
        )

        return check_constraints(self.spark.table(name), checks)

    def assert_valid(self, name: str, checks: list) -> list[dict]:
        """validate_table, hard-gated: raises ValueError naming every
        failed constraint (the ingest-gate shape — a broken feed stops
        the pipeline instead of silently skewing what's downstream).
        Returns the report rows as dicts when everything passes."""
        rows = [r.asDict() for r in self.validate_table(name, checks).collect()]
        failed = [r["constraint"] for r in rows if r["status"] != "pass"]
        if failed:
            raise ValueError(f"table {name!r} failed constraints: {failed}")
        return rows

    def terminate(self, query_name: str) -> bool:
        """ksqlDB `TERMINATE <query-id>`: stop the named continuous query.
        Returns True if a query was stopped, False if none matched —
        idempotent like the reference's delete-then-recreate scripts."""
        for q in self.spark.streams.active:
            if q.name == query_name:
                q.stop()
                return True
        return False

    # -- M3: pipeline lifecycle ----------------------------------------
    def deploy(self, pipeline: Any, *start_args: Any) -> QueryHandle:
        """Idempotent deploy: an active query with the same name is
        stopped first (the reference's delete-then-recreate connector
        pattern, start-source-connector.sh:57-66).

        Duck-typed over the streaming components: anything with a
        ``query_name`` and a ``start(*start_args)`` returning a
        StreamingQuery deploys the same way — CdcPipeline (no args),
        IncrementalAggView (pass the changelog stream), etc."""
        for q in self.spark.streams.active:
            if q.name == pipeline.query_name:
                q.stop()
        return QueryHandle(pipeline.query_name, pipeline.start(*start_args))
