"""Cluster-scale JDBC upsert sink: stage-then-MERGE.

The reference's Confluent JDBC sink upserts row-by-row from the Connect
worker (start-sink-connector.sh:61-81). At 100 TB that is the bottleneck;
the Spark-native shape is:

1. executors write the compacted micro-batch in parallel to a stage table
   (`df.write.jdbc(mode="overwrite")`, `batchsize` rows per round trip,
   `numPartitions` parallel connections);
2. the driver issues ONE set-based statement: MERGE target USING stage
   (sinks/ddl.staged_merge_sql) and one DELETE ... WHERE key IN (SELECT
   key FROM stage_deletes);
3. both statements are idempotent (keyed on PK), so foreachBatch replays
   after failure are safe — this plus checkpointing is the exactly-once
   story (SURVEY §4 "idempotent replay").

No JDBC server exists in this container, so this module is exercised by
unit tests only at the SQL-generation level (tests/test_sinks.py); the
DBAPI sink covers behavioral tests. The code path is kept import-clean so
a real cluster can use it unmodified.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

from db_integration_via_kafka_ksql_spark.sinks import ddl


@dataclass
class JdbcMergeSink:
    url: str                       # jdbc:sqlserver://... / jdbc:postgresql://...
    table: str
    key_cols: list[str]
    dialect: str = "postgres"
    stage_table: str | None = None
    batchsize: int = 3000          # rows per executor round-trip (K4)
    num_partitions: int = 8        # parallel JDBC connections
    properties: dict[str, str] | None = None

    def _stage(self) -> str:
        return self.stage_table or f"{self.table}__stage"

    def _exec(self, statements: list[str]) -> None:
        """Driver-side statement execution through the JVM's
        DriverManager (no Python DB driver needed on the cluster)."""
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        assert spark is not None
        jvm = spark._sc._jvm  # noqa: SLF001 — py4j bridge is the API here
        props = self.properties or {}
        conn = jvm.java.sql.DriverManager.getConnection(
            self.url, props.get("user", ""), props.get("password", "")
        )
        try:
            # DriverManager connections default to autoCommit=true, under
            # which (a) conn.commit() throws on e.g. the Postgres driver
            # and (b) each statement commits individually — the MERGE and
            # DELETE must land atomically for idempotent replay.
            conn.setAutoCommit(False)
            try:
                stmt = conn.createStatement()
                for s in statements:
                    stmt.execute(s)
                conn.commit()
            except Exception:
                conn.rollback()
                raise
        finally:
            conn.close()

    def write_batch(self, upserts: DataFrame, delete_keys: DataFrame) -> None:
        """Stage both frames via parallel executor JDBC writes, then apply
        one MERGE + one DELETE server-side."""
        stage, dstage = self._stage(), f"{self._stage()}_deletes"
        writer_opts = {"batchsize": str(self.batchsize)}
        (
            upserts.repartition(self.num_partitions)
            .write.mode("overwrite")
            .options(**writer_opts)
            .jdbc(self.url, stage, properties=self.properties or {})
        )
        (
            delete_keys.select(*self.key_cols)
            .repartition(max(1, self.num_partitions // 4))
            .write.mode("overwrite")
            .options(**writer_opts)
            .jdbc(self.url, dstage, properties=self.properties or {})
        )
        cols = [c.lower() for c in upserts.columns]
        where = " AND ".join(
            f"{self.table}.{k.lower()} = d.{k.lower()}" for k in self.key_cols
        )
        self._exec(
            [
                ddl.create_table_sql(
                    self.table, upserts.schema, self.key_cols, self.dialect
                ),
                ddl.staged_merge_sql(
                    self.table, stage, cols, self.key_cols, self.dialect
                ),
                f"DELETE FROM {self.table} WHERE EXISTS "
                f"(SELECT 1 FROM {dstage} d WHERE {where})",
            ]
        )

    def statements_preview(self, upserts: DataFrame) -> list[str]:
        """The exact SQL write_batch would run — unit-testable without a
        server."""
        cols = [c.lower() for c in upserts.columns]
        where = " AND ".join(
            f"{self.table}.{k.lower()} = d.{k.lower()}" for k in self.key_cols
        )
        return [
            ddl.create_table_sql(self.table, upserts.schema, self.key_cols, self.dialect),
            ddl.staged_merge_sql(
                self.table, self._stage(), cols, self.key_cols, self.dialect
            ),
            f"DELETE FROM {self.table} WHERE EXISTS "
            f"(SELECT 1 FROM {self._stage()}_deletes d WHERE {where})",
        ]
