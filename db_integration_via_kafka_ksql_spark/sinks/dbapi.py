"""DBAPI upsert/delete sink: the JDBC sink contract (K1-K5) against any
Python DBAPI connection factory (sqlite3 in tests; psycopg2 etc. in a
pinch). Used by the streaming pipeline's foreachBatch.

Contract parity with the reference sink (start-sink-connector.sh:57-87):
- upsert keyed on the record key (insert.mode=upsert, pk.mode=record_key)
- delete on tombstoned keys (delete.enabled=true)
- auto-create + additive auto-evolve DDL
- batched writes (batch.size=3000) with bounded retry + backoff
  (max.retries=10, retry.backoff.ms=3000)
- errors.tolerance=all → failed batches land in a dead-letter list
  instead of killing the pipeline

SCALE NOTE: this sink drains the (already per-key compacted) micro-batch
through the driver via toLocalIterator — BOTH the upsert rows and the
tombstoned delete keys stream in batch_size chunks (one partition
resident at a time), so driver memory is bounded per chunk even for a
mass-delete batch. Correct for a single-writer target like sqlite. The
1000-executor path is sinks/jdbc.py (stage + server-side MERGE); this
class exists so the full pipeline contract is testable in this
container.
"""

from __future__ import annotations

import itertools
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from db_integration_via_kafka_ksql_spark.sinks import ddl


@dataclass
class DbApiSink:
    connect: Callable[[], Any]          # DBAPI connection factory
    table: str
    key_cols: Sequence[str]
    dialect: str = "sqlite"
    batch_size: int = 3000              # reference: batch.size=3000
    max_retries: int = 10               # reference: max.retries=10
    retry_backoff_s: float = 0.0        # reference 3.0; 0 in tests
    tolerate_errors: bool = False       # reference: errors.tolerance=all
    dead_letter: list[tuple[str, Any]] = field(default_factory=list)
    _created: bool = field(default=False, repr=False)

    def _ensure_table(self, con: Any, df: DataFrame) -> None:
        """auto.create + additive auto.evolve (K3)."""
        cur = con.cursor()
        cur.execute(
            ddl.create_table_sql(self.table, df.schema, list(self.key_cols), self.dialect)
        )
        existing = {
            d[0].lower() for d in cur.execute(f"SELECT * FROM {self.table} LIMIT 0").description
        }
        for stmt in ddl.evolve_sql(self.table, existing, df.schema, self.dialect):
            cur.execute(stmt)
        con.commit()

    def _with_retry(self, fn: Callable[[], None], what: str, payload: Any) -> None:
        """Bounded retry with backoff (K4); overflow → dead-letter (K5)."""
        for attempt in range(self.max_retries + 1):
            try:
                fn()
                return
            except Exception:
                if attempt == self.max_retries:
                    if self.tolerate_errors:
                        self.dead_letter.append((what, payload))
                        return
                    raise
                time.sleep(self.retry_backoff_s)

    def write_batch(self, upserts: DataFrame, delete_keys: DataFrame) -> None:
        """Apply one compacted micro-batch: upserts then deletes.

        Inputs must already be one-row-per-key (streaming/pipeline.py
        compacts first) so statement order within the batch is free.
        """
        con = self.connect()
        try:
            self._ensure_table(con, upserts)
            cols = [c.lower() for c in upserts.columns]
            up_sql = ddl.merge_sql(self.table, cols, list(self.key_cols), self.dialect)
            rows = upserts.toLocalIterator()
            while True:
                chunk = list(itertools.islice(rows, self.batch_size))
                if not chunk:
                    break
                data = [tuple(r) for r in chunk]
                self._with_retry(
                    lambda d=data: (con.cursor().executemany(up_sql, d), con.commit()),
                    "upsert",
                    data,
                )
            del_sql = ddl.delete_sql(self.table, list(self.key_cols), self.dialect)
            # deletes stream through the driver in batch_size chunks like
            # the upserts (toLocalIterator holds ONE partition at a time),
            # never an unbounded collect; a mass-delete batch is bounded
            # by driver memory per chunk, not per batch
            key_iter = (
                tuple(r)
                for r in delete_keys.select(*self.key_cols).toLocalIterator()
            )
            while True:
                key_rows = list(itertools.islice(key_iter, self.batch_size))
                if not key_rows:
                    break
                self._with_retry(
                    lambda kr=key_rows: (
                        con.cursor().executemany(del_sql, kr),
                        con.commit(),
                    ),
                    "delete",
                    key_rows,
                )
        finally:
            con.close()

    def read_all(self) -> list[tuple]:
        con = self.connect()
        try:
            cur = con.cursor()
            # fetchall, not cursor iteration: duckdb's DBAPI cursor is not
            # iterable; sqlite3's execute() returns the cursor either way
            return list(cur.execute(f"SELECT * FROM {self.table}").fetchall())
        finally:
            con.close()
