"""Sinks: idempotent upsert/delete targets for the CDC pipeline.

Reference surface (SURVEY §2.6): Confluent JDBC sink with
insert.mode=upsert, pk.mode=record_key, delete.enabled=true,
auto.create/auto.evolve, batch+retry, error tolerance
(start-sink-connector.sh:57-87). Re-expressed here as:

- ddl.py      — dialect-aware DDL + MERGE/DELETE statement generation (K1-K3)
- dbapi.py    — DBAPI-driver sink with batching, bounded retry, dead-letter
                (K4-K5); test-grade (sqlite) but contract-complete
- jdbc.py     — the cluster-scale path: executors stage the batch via
                spark JDBC, one server-side MERGE applies it (K1)
- dataset.py  — partitioned training-dataset materialization (extension
                surface): hive-partitioned parquet with bounded file
                counts and pruning-verified reads
"""
