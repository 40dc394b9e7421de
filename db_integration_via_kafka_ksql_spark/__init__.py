"""PySpark-native analytics engine with the capabilities of
sajonaro/db-integration-via-kafka-ksql, re-expressed Spark-first.

The reference (/root/reference) is a configuration-declared CDC pipeline:
Debezium -> Kafka (Avro, keyed changelog with tombstones) -> ksqlDB TABLE
(latest-state-per-key) -> JDBC upsert/delete sink. This engine reproduces
those semantics on Spark Structured Streaming / DataFrame, and extends the
surface with the relational operators the reference's intended star schema
implies (purge-source-db.sh:20-23) plus large-scale training-data-pipeline
operators (dedup, similarity search, multimodal, text analysis).

Layout:
  session.py    - tuned SparkSession builder (AQE, shuffle sizing)
  io.py         - testdata table loaders
  operators/    - batch operators: cdc, relational, dedup, similarity, text, multimodal
  sources/      - kafka (gated), files, jdbc readers
  sinks/        - jdbc merge sink, kafka writer (gated), parquet state store
  functions/    - portable hashing / vector helpers (Spark<->DuckDB parity)
  plans/        - explain/plan-assertion helpers used by tests
  streaming/    - CDC streaming pipeline (foreachBatch upsert/delete)
"""

__version__ = "0.1.0"
