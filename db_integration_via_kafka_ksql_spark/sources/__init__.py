"""Sources: changelog streams for the CDC pipeline.

kafka.py     — the production source: Kafka topic of keyed Avro change
               events with tombstones (S1/S3/S4), plus dead-letter parse
               tolerance (K5). Requires the spark-sql-kafka package at
               runtime; config builders are importable without it.
changelog.py — file-backed changelog streams (tests / replay), snapshot
               + stream union (S2).
"""
